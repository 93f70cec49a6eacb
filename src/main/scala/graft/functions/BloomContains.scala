package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter over LONG keys:
  * `bloom_contains(key)` → true iff the key MIGHT be in the set the
  * filter was built from (never a false negative; false positives at
  * the filter's configured rate).
  *
  * The filter is [[org.apache.spark.util.sketch.BloomFilter]] — the
  * same sketch Spark's own runtime row-level filtering injects into
  * join plans. Its hashing (Murmur3 of the long key) is fixed, and
  * bitset merge is a bitwise OR, so the built filter — and therefore
  * every probe — is PARALLELISM-INVARIANT: any partitioning of the
  * build side produces bit-identical bits (spec-asserted).
  *
  * The filter rides along as a codegen reference object (the
  * [[HyperplaneBucket]] pattern): the probe is one virtual call per
  * row inside whole-stage codegen, no join, no shuffle. */
case class BloomContains(child: Expression, bits: Array[Byte]) extends UnaryExpression {
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects a bigint key, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(v: Any): Any = filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($x);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomContains {
  private val fnCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Bind `bits` under a fresh temp function name, build the column
    * via `f`, then drop the name (Dataset analysis is eager, so the
    * resolved plan keeps the expression instance, not the name —
    * concurrent probes on one session can't cross-resolve). */
  def withProbe[A](spark: SparkSession, bits: Array[Byte])(
      f: String => A): A = {
    val fn = s"__bloom_contains_${fnCounter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BloomContains(exprs.head, bits), "built-in")
    try f(fn)
    finally spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(fn))
  }
}
