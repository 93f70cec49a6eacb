package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed prefix scans.
  *
  * `Window.partitionBy(group)` prefix sums put each group's ENTIRE
  * row set through one task's sort — with a handful of groups (data
  * sources, tenants) that is a single-machine sort of the whole table
  * at 100 TB. [[exclusivePrefixSum]] is the two-level formulation:
  * bucket rows by a deterministic coarsening of the order key, scan
  * each (group, bucket) locally, then add per-(group, bucket) offsets
  * computed from a tiny totals frame. Every stage is bounded by the
  * bucket size, never the group size.
  *
  * The bucket id is a PURE FUNCTION of the row (value-range split of
  * the leading order column), NOT `spark_partition_id` over a range
  * exchange: range-partitioner boundaries come from sampling and are
  * not guaranteed identical across the two evaluations of the frame
  * (local scan + totals), which would silently mis-align the offsets
  * — caught by ScanQuantilePropertySpec on randomized layouts. The
  * price is one extra 1-row min/max aggregation over the input
  * (cheap: parquet footer stats answer it at scan speed).
  */
object ScanOps {
  /** Exclusive prefix sum of `value` over rows ordered by `orderCols`
    * within each `groupCols` group, emitted as `outCol`. The LEADING
    * order column must be numeric (it is range-bucketed); the full
    * `orderCols` list breaks ties inside a bucket. Result values are
    * identical to
    * `sum(value).over(Window.partitionBy(group).orderBy(order)
    * .rowsBetween(unboundedPreceding, -1))` at ANY partitioning
    * (equivalence + property specs). */
  def exclusivePrefixSum(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      value: Column, outCol: String, buckets: Int = 1024
  ): DataFrame = {
    val ord = col(orderCols.head).cast("long")
    // 1-row bounds aggregation: the only driver-side materialization,
    // answered from column statistics on a real columnar layout
    val bounds = df.agg(min(ord).as("mn"), max(ord).as("mx")).head()
    if (bounds.isNullAt(0)) return df.withColumn(outCol, lit(0L)) // empty input
    val mn = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - mn) / buckets + 1)

    val withB = df
      .withColumn("__bkt", call_function("div", ord - mn, lit(width)))
      .withColumn("__v", value)
    // local scan inside each (group, bucket): equal leading keys land
    // in the same bucket by construction, so cross-bucket order is
    // total and the remaining orderCols only break ties locally
    val localW = Window
      .partitionBy((groupCols :+ "__bkt").map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withB.withColumn("__local", coalesce(sum(col("__v")).over(localW), lit(0L)))
    // per-(group, bucket) totals: tiny (≤ groups × buckets rows), so
    // the cross-bucket running offset is a cheap little window and
    // the join back is a broadcast
    val totals = withB.groupBy((groupCols :+ "__bkt").map(col): _*)
      .agg(sum(col("__v")).as("__t"))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select(((groupCols :+ "__bkt").map(col) :+ col("__off")): _*)
    local
      .join(broadcast(offsets), groupCols :+ "__bkt")
      .withColumn(outCol, col("__local") + col("__off"))
      // the join fronts its key columns: restore the caller's column
      // order (+ the new scan column) so downstream positional
      // operations (unions, exceptAll) see a stable schema
      .select((df.columns.map(col) :+ col(outCol)): _*)
  }
}
