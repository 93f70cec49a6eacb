package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact monetary arithmetic.
  *
  * Double-precision sums are order-dependent: the same aggregation on
  * a different partition count produces different last bits, which
  * makes results both irreproducible at cluster scale and impossible
  * to hash-verify against an external oracle. All money columns in
  * the testdata carry exactly 2 decimals, so we compute in
  * DECIMAL(12,2) (exact, associative, commutative — any shuffle or
  * AQE re-plan yields identical results) and emit doubles converted
  * from the exact value (bit-identical in any engine).
  *
  * Averages are the half-up rounding of an exact rational; no binary
  * floating format can represent them safely near rounding
  * boundaries, so they are computed with integer arithmetic:
  * `round_half_up(u / n) = (2u + n) div (2n)` for non-negative `u`
  * scaled to the target digit count.
  */
object Money {
  val D: DecimalType = DecimalType(12, 2)

  /** Cast a 2-decimal-valued double column to exact decimal. */
  def dec(c: Column): Column = c.cast(D)

  /** Exact sum of a money column, emitted as double. */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact integer sum scaled by 10^digits (fits a long comfortably
    * at verification scale; at larger scale raise to DECIMAL). */
  def scaledSum(c: Column, digits: Int): Column = {
    require(digits >= 2 && digits <= 6)
    val p = math.pow(10, digits).toLong
    sum(dec(c) * lit(p)).cast("long")
  }

  /** Half-up average with `digits` decimals from a [[scaledSum]]
    * column and a count column — exact integer math, then one double
    * division identical in any engine. Requires u >= 0. */
  def avgFromScaled(scaledSum: Column, n: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    (call_function("div", scaledSum * lit(2L) + n, n * lit(2L))).cast("double") / lit(p)
  }
}
