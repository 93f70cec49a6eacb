package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array: `simhash64(tokens)`.
  *
  * The relational formulation (explode tokens → groupBy(doc, hash) →
  * ±count bit vectors → element-wise sum aggregate) shuffles the
  * ENTIRE token stream — at 100 TB that shuffle IS the job. SimHash
  * is a pure per-document function, so this expression computes it in
  * one narrow pass over the token array: hash each token (the same
  * seed-42 xxHash64 as Spark's `xxhash64`, so values match the
  * relational version bit-for-bit), accumulate ±1 per bit position
  * per occurrence, emit the sign vector as a long. No explode, no
  * shuffle, no aggregation state — the whole dedup pipeline's
  * pre-band stage becomes map-only.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 128-bit SimHash over a token array:
  * `simhash128(tokens) -> array<bigint>[h0, h1]`.
  *
  * Same map-only argument as [[SimHash64]]; the width exists for the
  * BANDING, not the semantics. Bucket selectivity of b-band LSH over a
  * w-bit fingerprint is n²·b·2^(-w/b): at 64 bits, 16 bands leave
  * 4-bit keys whose chance collisions are expected-quadratic in corpus
  * size (the round-9 measured 7.1× time per 10× data), while 128 bits
  * keep 16 bands at 8-bit width — 16× fewer chance collisions per band
  * — with the pigeonhole completeness bound (dist < bands) unchanged.
  *
  * h0 hashes tokens with seed 42 (bit-identical to [[SimHash64]], so
  * the two fingerprints stay comparable across probes); h1 re-hashes
  * the same tokens with an independent seed in the same loop — one
  * pass over the array, no second tokenization.
  */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash128"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash128 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash128.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash128 {
  /** Independent second seed (64-bit golden ratio, a standard
    * decorrelation constant — nothing shares it with seed 42). */
  private val Seed1 = 0x9E3779B97F4A7C15L

  /** Static entry point shared by eval and codegen. */
  def compute(tokens: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val counts = new Array[Int](128)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val ha = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        val hb = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed1)
        var j = 0
        while (j < 64) {
          if (((ha >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          if (((hb >>> j) & 1L) == 1L) counts(64 + j) += 1 else counts(64 + j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var h0 = 0L
    var h1 = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) h0 |= (1L << j)
      if (counts(64 + j) > 0) h1 |= (1L << j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(h0, h1))
  }

  /** Register `simhash128(tokens)` for SQL/`expr` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash128", exprs => SimHash128(exprs.head), "built-in")
}

object SimHash64 {
  /** Static entry point shared by eval and codegen. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Register `simhash64(tokens)` for SQL/`expr` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
