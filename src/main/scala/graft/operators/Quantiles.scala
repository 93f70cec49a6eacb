package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact distributed quantiles by two-pass rank selection.
  *
  * The one-pass formulation — `row_number` + `count` over
  * `Window.partitionBy(segment)` — makes ONE task hold and sort each
  * segment's entire row set; with a handful of segments that is a
  * single-machine sort of the whole fact at 100 TB. Here the sort
  * never happens: pass 1 histograms the values into deterministic
  * coarse buckets (a plain partial-aggregated groupBy), locates the
  * bucket containing each requested rank on the tiny histogram, and
  * pass 2 rank-selects inside only the targeted buckets — each a
  * ~1/buckets slice of its segment.
  *
  * The emitted value is a REAL data point (the element at rank
  * ceil(p·n/100) under (value, tie) order), so results are identical
  * to the window formulation bit-for-bit and engine-portable with no
  * interpolation (equivalence spec in ScaleSpec).
  */
object Quantiles {
  /** For each segment and each percentile p in `pctls`, the value at
    * rank ceil(p·n/100) (n = segment row count) under
    * (value, tie) ascending order. `bucket` must be a deterministic
    * monotone coarsening of `value` (e.g. `floor(value / 1000)`).
    * Output: (segCol, pctl, value-as-`outCol`). */
  def selectAtRanks(
      df: DataFrame, segCol: String, value: Column, tie: Column,
      bucket: Column, pctls: Seq[Long], outCol: String
  ): DataFrame = {
    // NULL values (whose bucket expression is NULL) get the sentinel
    // bucket before all real ones: equi-joins never match NULL keys,
    // so without it a rank landing among the NULLS FIRST rows would
    // silently return no row for that (segment, pctl)
    val base = df.select(col(segCol), value.as("__val"), tie.as("__tie"),
      coalesce(bucket, lit(Long.MinValue)).as("__bkt"))

    // pass 1a: segment sizes → requested global ranks (tiny)
    val targets = base.groupBy(segCol).agg(count(lit(1)).as("__n"))
      .withColumn("pctl", explode(array(pctls.map(lit): _*)))
      .withColumn("__rank", call_function("div", col("pctl") * col("__n") + 99L, lit(100L)))

    // pass 1b: per-(segment, bucket) histogram with running counts —
    // at most segments × buckets rows, so the window is trivial
    val cumW = Window.partitionBy(segCol).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy(col(segCol), col("__bkt")).agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(sum(col("__c")).over(cumW), lit(0L)))

    // locate: the unique bucket with before < rank <= before + count,
    // and the residual rank inside it
    val located = targets.join(hist, segCol)
      .where(col("__before") < col("__rank") && col("__rank") <= col("__before") + col("__c"))
      .select(col(segCol), col("pctl"), col("__bkt"),
        (col("__rank") - col("__before")).as("__residual"))

    // pass 2: rank-select inside the targeted buckets only — the
    // broadcast join keeps untargeted rows out of the sort entirely
    val inBucketW = Window.partitionBy(col(segCol), col("pctl"))
      .orderBy(col("__val"), col("__tie"))
    base.join(broadcast(located), Seq(segCol, "__bkt"))
      .withColumn("__rn", row_number().over(inBucketW))
      .where(col("__rn") === col("__residual"))
      .select(col(segCol), col("pctl"), col("__val").as(outCol))
  }
}
