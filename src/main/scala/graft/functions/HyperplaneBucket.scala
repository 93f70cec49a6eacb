package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native LSH bucket id: sign bits of the dot products of an
  * `array<float>` embedding against a fixed set of hyperplanes.
  *
  * The composed form (one `aggregate(zip_with(vec, lit(plane)))` per
  * plane) expands to a very large Catalyst tree — janino compile time
  * dominated the query (~5 s) and each plane re-walked the vector.
  * Here the planes ride along as a reference object and codegen emits
  * one tight two-level loop; the vector is walked once per plane with
  * no intermediate arrays.
  *
  * Null ELEMENTS read as 0.0 (contribute nothing to the dot product),
  * matching [[CosineSimilarity]].
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(arr.numElements(), pl.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) dot += arr.getFloat(i).toDouble * pl(i)
        i += 1
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long $bucket = 0L;
         |for (int $p = 0; $p < $ref.length; $p++) {
         |  double[] $pl = $ref[$p];
         |  int $n = java.lang.Math.min($x.numElements(), $pl.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i)) $dot += ((double) $x.getFloat($i)) * $pl[$i];
         |  }
         |  if ($dot > 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
