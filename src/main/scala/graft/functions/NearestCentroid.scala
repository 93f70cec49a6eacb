package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a single map-side expression:
  * `struct(cid, cos)` of the centroid with the highest cosine to the
  * input `array<float>` vector (ties → smallest cid; centroids must
  * be pre-sorted by ascending cid).
  *
  * This is what makes a Lloyd round shuffle-free on the corpus side:
  * the join-based formulation (`crossJoin(broadcast(centroids))` +
  * `groupBy(id).max_by(...)`) partial-aggregates on a UNIQUE key, so
  * every map task still ships one (id, cid, vector) row per corpus
  * row through the exchange — a full-corpus shuffle per round at
  * 100 TB. Here assignment is a projection; the only shuffle left in
  * a round is the k-group centroid-mean aggregate, which map-side
  * combines to k rows per task.
  *
  * The centroid set rides along as a codegen reference object (the
  * HyperplaneBucket pattern — a `typedLit` of the same arrays would
  * janino-compile for seconds and re-walk per reference). Cosine
  * accumulation is double-precision sequential over the common
  * prefix, bit-identical to [[CosineSimilarity]] for equal-length
  * inputs; zero-norm inputs score 0.0. Null ELEMENTS read as 0.0,
  * matching [[CosineSimilarity]] — parquet schemas routinely declare
  * element-nullable arrays even for dense embeddings, so rejecting
  * `containsNull = true` at analysis would refuse real scans.
  */
case class NearestCentroid(child: Expression, cids: Array[Int], cents: Array[Array[Float]])
    extends UnaryExpression {
  require(cids.length == cents.length && cents.nonEmpty, "need >= 1 centroid")
  require(cids.zip(cids.tail).forall { case (a, b) => a < b }, "centroids must be cid-sorted")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xn = x.numElements()
    // query norm is centroid-independent (equal-length centroids):
    // accumulate once, same sequential order as CosineSimilarity
    var nx = 0.0
    var i = 0
    while (i < xn) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      nx += xi * xi; i += 1
    }
    var best = 0
    var bestc = Double.NegativeInfinity
    var p = 0
    while (p < cents.length) {
      val c = cents(p)
      val n = math.min(xn, c.length)
      var dot = 0.0; var ny = 0.0
      var j = 0
      while (j < n) {
        val xj = if (x.isNullAt(j)) 0.0 else x.getFloat(j).toDouble
        val yj = c(j).toDouble
        dot += xj * yj; ny += yj * yj
        j += 1
      }
      val cv = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      if (cv > bestc) { bestc = cv; best = p }
      p += 1
    }
    new GenericInternalRow(Array[Any](cids(best), bestc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val xn = ctx.freshName("xn")
      val nx = ctx.freshName("nx")
      val best = ctx.freshName("best")
      val bestc = ctx.freshName("bestc")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val xj = ctx.freshName("xj")
      val yj = ctx.freshName("yj")
      val cv = ctx.freshName("cv")
      s"""
         |int $xn = $x.numElements();
         |double $nx = 0.0;
         |for (int $i = 0; $i < $xn; $i++) {
         |  double $xi = $x.isNullAt($i) ? 0.0 : (double) $x.getFloat($i);
         |  $nx += $xi * $xi;
         |}
         |int $best = 0;
         |double $bestc = Double.NEGATIVE_INFINITY;
         |for (int $p = 0; $p < $centsRef.length; $p++) {
         |  float[] $c = $centsRef[$p];
         |  int $n = java.lang.Math.min($xn, $c.length);
         |  double $dot = 0.0; double $ny = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $xj = $x.isNullAt($j) ? 0.0 : (double) $x.getFloat($j);
         |    double $yj = (double) $c[$j];
         |    $dot += $xj * $yj; $ny += $yj * $yj;
         |  }
         |  double $cv = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  if ($cv > $bestc) { $bestc = $cv; $best = $p; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $cidsRef[$best], $bestc });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroid {
  /** Register `nearest_centroid(vec)` bound to this centroid set on
    * the session (analysis resolves the function at DataFrame
    * construction, so each caller registers-then-builds in order). */
  def register(spark: SparkSession, cids: Array[Int], cents: Array[Array[Float]]): Unit =
    registerAs(spark, "nearest_centroid", cids, cents)

  /** Register under a caller-chosen name. Concurrent index builds on
    * one session each bind their own name, so two in-flight centroid
    * sets can never cross-resolve (the shared-name variant relies on
    * eager analysis + single-threaded builds). */
  def registerAs(spark: SparkSession, name: String,
                 cids: Array[Int], cents: Array[Array[Float]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => NearestCentroid(exprs.head, cids, cents),
      "built-in")
}
