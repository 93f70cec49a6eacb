package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, JobGraph, SalesPipelineDag, Scd2}
import graft.operators.JobGraph.{Failed, Skipped, Succeeded}

/** Batch medallion DAG (operators/SalesPipelineDag.scala): every
  * stage writes its layer, downstream reads the WRITTEN layer, the
  * dim branch runs parallel to the fact branch, gold waits on both,
  * and the quality gate guards the metrics. */
class SalesPipelineDagSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dag").toString

  test("full run: all jobs succeed, layers consistent with direct computation") {
    val root = tmp()
    val layout = SalesPipelineDag.Layout(root)
    val rs = SalesPipelineDag.run(spark, sf, root)
    assert(rs.forall(_.status == Succeeded), s"statuses: ${rs.map(r => r.id -> r.status)}")

    val byId = rs.map(r => r.id -> r).toMap
    // bronze metric == the verified query's row count
    assert(byId("bronze_ingest").metric == QueriesEtl.bronzeValid(spark, sf).count())
    // silver preserves bronze rows (inner join to orders: every valid
    // line's order exists in the testdata)
    assert(byId("silver_fact").metric == byId("bronze_ingest").metric)
    // gold rows == silver rows surviving the inner join to the CURRENT
    // scd dim (note: the merge has no delete detection — keys absent
    // from the incoming snapshot stay current, so nothing is dropped
    // here; the assertion computes the expectation, not the shortcut)
    val silver = spark.read.parquet(layout.silverFact)
    val current = Scd2.current(spark.read.parquet(layout.scdDim)).select("c_custkey")
    val expectGold = silver.join(current, silver("o_custkey") === current("c_custkey")).count()
    assert(byId("gold_enrich").metric == expectGold)
    assert(byId("pipeline_metrics").metric == byId("gold_enrich").metric)

    // written gold revenue totals match the mart totals (read back)
    val gold = spark.read.parquet(layout.goldEnriched)
    val goldTotal = gold.agg(graft.functions.Money.sumExact($"revenue")).collect()(0).getDouble(0)
    val martTotal = spark.read.parquet(layout.monthlyMart)
      .agg(graft.functions.Money.sumExact($"total_sales")).collect()(0).getDouble(0)
    assert(goldTotal == martTotal)
    // metrics grain: one row per current customer seen in gold
    assert(spark.read.parquet(layout.customerMetrics).count() ==
      gold.select("custkey").distinct().count())
  }

  test("failed quality gate blocks metrics but not the sibling marts") {
    val root = tmp()
    val g = SalesPipelineDag.build(spark, sf, SalesPipelineDag.Layout(root),
      goldSuite = Seq(DataQuality.Between("revenue", 0.0, 0.0))) // impossible
    val rs = g.run()
    val byId = rs.map(r => r.id -> r).toMap
    assert(byId("gold_enrich").status == Succeeded)
    assert(byId("gold_quality_check").status.isInstanceOf[Failed])
    assert(byId("customer_metrics").status == Succeeded, "sibling branch must still run")
    assert(byId("monthly_mart").status == Succeeded)
    assert(byId("pipeline_metrics").status == Skipped(Seq("gold_quality_check")))
    // the failing gate names its expectation
    byId("gold_quality_check").status match {
      case Failed(e) => assert(e.getMessage.contains("range_revenue_violations"))
      case s         => fail(s"$s")
    }
  }

  test("concurrent run produces the same report as sequential") {
    val seqR = SalesPipelineDag.run(spark, sf, tmp()).map(r => (r.id, r.status, r.metric))
    val parR = SalesPipelineDag.build(spark, sf, SalesPipelineDag.Layout(tmp()))
      .runConcurrent(3).map(r => (r.id, r.status, r.metric))
    assert(seqR == parR)
  }
}
