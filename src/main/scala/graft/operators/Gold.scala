package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Money

/** Gold-layer denormalization + aggregation (reference
  * `src/main/gold/sales_gold.py`, `gold/customer_metrics_gold.py`,
  * `transformations/jobs/customer_mart_sql_tranform_write.py`).
  *
  * Scale notes:
  *  - [[starJoin]] broadcast-hints every bounded dimension so the fact
  *    never shuffles for enrichment; only fact-to-fact joins (e.g.
  *    lineitem⋈orders) shuffle, and they shuffle on the join key where
  *    AQE's skew-join splitting applies.
  *  - [[customerMetrics]] / [[monthlyMart]] are plain `groupBy` —
  *    partial aggregation halves the shuffle vs the reference's
  *    window-sum + `distinct()` formulation
  *    (customer_mart_sql_tranform_write.py:11-19), which shuffles the
  *    whole fact twice (window, then distinct).
  */
object Gold {
  private def parseBytes(v: String): Long =
    try v.trim.toLong
    catch { case _: NumberFormatException =>
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v.trim) }

  /** Broadcast hint, SIZE-GATED on Catalyst's own estimate vs the
    * session broadcast threshold. An unconditional `broadcast(dim)`
    * hint overrides the threshold — at TB dimension scale (customer on
    * a 100 TB deployment) it would OOM the driver instead of degrading
    * to a shuffle join. The gate keeps the hint's benefit where stats
    * UNDER-estimate small dims and steps aside when the dim outgrows
    * the threshold, letting Spark/AQE pick the shuffle join — the
    * graceful-degradation contract in BENCH_NOTES "100 TB projection",
    * spec-asserted in ScaleUpSpec across a real size flip. */
  def maybeBroadcast(dim: DataFrame): DataFrame = {
    val threshold = parseBytes(dim.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    // threshold <= 0 means the user disabled broadcasting: honor it
    if (threshold > 0 &&
      dim.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
      broadcast(dim)
    else dim
  }

  /** Enrich a fact with dimensions. Each dim is (df, joinExpr);
    * `broadcastDim = true` broadcast-hints each dim that passes the
    * [[maybeBroadcast]] size gate. */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)], broadcastDims: Boolean = true): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(if (broadcastDims) maybeBroadcast(dim) else dim, cond, "inner")
    }

  /** Per-entity behavioral metrics (customer_metrics_gold.py:30-44).
    * Exact decimal sums + integer-math average ([[Money]]) so the
    * result is identical at any partitioning. */
  def entityMetrics(fact: DataFrame, key: String, amount: Column, eventDate: Column): DataFrame =
    fact
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("total_orders"),
        Money.sumExact(amount).as("total_spent"),
        Money.scaledSum(amount, 2).as("__sc"),
        min(eventDate).as("first_purchase_date"),
        max(eventDate).as("last_purchase_date")
      )
      .withColumn("avg_order_value", Money.avgFromScaled(col("__sc"), col("total_orders"), 2))
      .drop("__sc")

  /** Per-entity × calendar-month revenue mart
    * (customer_mart_sql_tranform_write.py). */
  def monthlyMart(fact: DataFrame, key: String, dateCol: Column, amount: Column): DataFrame =
    fact
      .groupBy(col(key), date_trunc("month", dateCol).as("sales_month"))
      .agg(
        Money.sumExact(amount).as("total_sales"),
        count(lit(1)).as("n_orders")
      )
}
