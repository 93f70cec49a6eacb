package graft.functions

import java.nio.charset.StandardCharsets
import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream, ByteArrayInputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams") as a
  * [[TypedImperativeAggregate]]: `topk_sketch(item, capacity)` keeps
  * at most `capacity` counters per group and guarantees every item
  * with true frequency > N/capacity is present, with
  * `count - err <= true <= count`.
  *
  * This is the distributed-top-k shape that scales: the exact
  * alternative (`groupBy(item).count` then rank) shuffles one row
  * per DISTINCT item — at 100 TB of text that's the full vocabulary.
  * The sketch keeps a bounded buffer per group per map task, partial
  * aggregation combines map-side, and the merge (counter sum +
  * cross-summary error accounting, then re-trim) is associative.
  */
case class TopKSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, TopKSketchAgg.Counter]] {
  import TopKSketchAgg.Counter

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false)
  )), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if capacity > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("capacity must be positive")
    case t => TypeCheckResult.TypeCheckFailure(s"topk_sketch expects string, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Counter] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Counter], input: InternalRow): mutable.HashMap[String, Counter] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => c.count += 1
      case None if buf.size < capacity => buf(item) = Counter(1L, 0L)
      case None =>
        // evict the min-count counter (ties: lexicographically largest
        // item evicted first, for deterministic merges)
        val (mk, mc) = buf.minBy { case (k, c) => (c.count, reverse(k)) }
        buf.remove(mk)
        buf(item) = Counter(mc.count + 1, mc.count)
    }
    buf
  }

  private def reverse(s: String): String = {
    // orders ties so the lexicographically LARGEST key has the
    // smallest sort key — a cheap deterministic eviction rule
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) { sb.append((0xFFFF - s.charAt(i)).toChar); i += 1 }
    sb.toString
  }

  override def merge(a: mutable.HashMap[String, Counter], b: mutable.HashMap[String, Counter]): mutable.HashMap[String, Counter] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    // an item absent from a full summary may still have occurred up to
    // that summary's min count — fold that in as error
    val minA = if (a.size >= capacity) a.values.map(_.count).min else 0L
    val minB = if (b.size >= capacity) b.values.map(_.count).min else 0L
    val out = mutable.HashMap.empty[String, Counter]
    a.foreach { case (k, c) =>
      b.get(k) match {
        case Some(cb) => out(k) = Counter(c.count + cb.count, c.err + cb.err)
        case None => out(k) = Counter(c.count + minB, c.err + minB)
      }
    }
    b.foreach { case (k, c) =>
      if (!a.contains(k)) out(k) = Counter(c.count + minA, c.err + minA)
    }
    if (out.size <= capacity) out
    else {
      val kept = out.toSeq.sortBy { case (k, c) => (-c.count, k) }.take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, Counter]): Any = {
    val rows = buf.toSeq
      .sortBy { case (k, c) => (-c.count, k) }
      .map { case (k, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c.count, c.err))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Counter]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c.count); out.writeLong(c.err)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Counter] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Counter]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, StandardCharsets.UTF_8)) = Counter(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object TopKSketchAgg {
  /** Mutable counter: observed count and max over-count. */
  final case class Counter(var count: Long, var err: Long)

  /** Register `topk_sketch(item, capacity)` (capacity: int literal). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch",
      exprs => {
        val cap = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_sketch capacity must be an int literal, got $other")
        }
        TopKSketchAgg(exprs.head, cap).toAggregateExpression()
      },
      "built-in")
}
