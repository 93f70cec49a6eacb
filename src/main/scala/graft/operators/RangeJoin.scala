package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans an inequality-only join as a broadcast-nested-loop or
  * cartesian product — O(n·m) and a non-starter at 100 TB. The scale
  * formulation is BUCKETIZATION: quantize the range axis into
  * fixed-width buckets, explode each interval to every bucket it
  * overlaps, map each point to its single bucket, then run a plain
  * shuffle EQUI-join on (keys…, bucket) and refine with the exact
  * range predicate. Work scales with points + interval-spans/width,
  * never points×intervals; the bucket becomes part of the shuffle
  * key, so long intervals spread across many partitions instead of
  * hot-spotting one.
  *
  * `bucketWidth` is the tuning dial: ≈ the typical interval length.
  * Too small → intervals explode into many buckets; too large → many
  * false candidates refined away. Both are linear effects, never
  * quadratic.
  */
object RangeJoin {
  /** Join `points` to every `intervals` row with the same `keys` and
    * `startCol <= pointCol <= endCol`.
    *
    * @param points     frame with a LONG column `pointCol`
    * @param intervals  frame with LONG columns `startCol`/`endCol`
    *                   (intervals with end < start are dropped)
    * @param keys       equi-key pairs (pointKeyName, intervalKeyName)
    * @param bucketWidth bucket width in the units of the range axis
    * Column names of the two frames must not clash.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      keys: Seq[(String, String)],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val ib = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("__bkt", explode(sequence(
        call_function("div", col(startCol), w),
        call_function("div", col(endCol), w))))
    val pb = points.withColumn("__bkt", call_function("div", col(pointCol), w))
    val cond = (keys.map { case (pk, ik) => pb(pk) === ib(ik) } :+
      (pb("__bkt") === ib("__bkt"))).reduce(_ && _)
    pb.join(ib, cond)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(pb("__bkt")).drop(ib("__bkt"))
  }

  /** Interval-overlap join: pairs where the two intervals intersect
    * ([s1,e1] ∩ [s2,e2] ≠ ∅), same bucketization. Each side explodes
    * to its spanned buckets; a candidate pair is generated once per
    * SHARED bucket, so matches are de-duplicated by attributing each
    * pair to the first bucket both intervals span. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      keys: Seq[(String, String)],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def spans(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) >= col(s))
        .withColumn("__bkt", explode(sequence(
          call_function("div", col(s), w),
          call_function("div", col(e), w))))
    val lb = spans(left, leftStart, leftEnd)
    val rb = spans(right, rightStart, rightEnd)
    val cond = (keys.map { case (lk, rk) => lb(lk) === rb(rk) } :+
      (lb("__bkt") === rb("__bkt"))).reduce(_ && _)
    lb.join(rb, cond)
      .where(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      // keep each pair once: only the bucket where the overlap begins
      .where(lb("__bkt") === call_function("div", greatest(col(leftStart), col(rightStart)), w))
      .drop(lb("__bkt")).drop(rb("__bkt"))
  }
}
