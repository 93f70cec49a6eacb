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
  * range-partition by (group, order), scan each partition locally,
  * then add per-(partition, group) offsets computed from a tiny totals
  * frame. Every stage is bounded by the partition size, never the
  * group size.
  */
object ScanOps {
  /** Exclusive prefix sum of `value` over rows ordered by `orderCols`
    * within each `groupCols` group, emitted as `outCol`. The result
    * values are identical to
    * `sum(value).over(Window.partitionBy(group).orderBy(order)
    * .rowsBetween(unboundedPreceding, -1))` at ANY partitioning — the
    * range boundaries only decide which task computes which slice.
    *
    * Plan shape: one range exchange (the global order), one hash
    * exchange on (partition-id, group) for the local scan, and a
    * broadcast of the per-(partition, group) running offsets — a frame
    * of at most partitions × groups rows. */
  def exclusivePrefixSum(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      value: Column, outCol: String
  ): DataFrame = {
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val rangeKey = (groupCols ++ orderCols).map(col)
    // the range exchange realizes the global (group, order) order
    // across partition ids: every row in partition p sorts before
    // every row in partition p+1
    val ranged = df
      .repartitionByRange(nPart, rangeKey: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val localW = Window
      .partitionBy(("__pid" +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__local", coalesce(sum(col("__v")).over(localW), lit(0L)))
    // per-(partition, group) totals: tiny (≤ partitions × groups rows),
    // so the cross-partition running offset is a cheap little window
    // and the join back is a broadcast
    val totals = ranged.groupBy(("__pid" +: groupCols).map(col): _*)
      .agg(sum(col("__v")).as("__t"))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select((("__pid" +: groupCols).map(col) :+ col("__off")): _*)
    local
      .join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__v", "__local", "__off")
  }
}
