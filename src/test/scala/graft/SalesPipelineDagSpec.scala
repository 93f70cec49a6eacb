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

  test("crash between gold and mart writes: restart converges to the uninterrupted run") {
    // the Airflow retry story in data-plane form: a crash window after
    // gold lands but mid-mart leaves gold complete and the mart layer
    // TORN (partial part-file, no _SUCCESS). The nightly restart is a
    // plain rerun — every stage writes mode(overwrite) and reads only
    // WRITTEN upstream layers, so the rerun must produce byte-equal
    // layers with no duplicate rows and no leftover torn files.
    val refRoot = tmp()  // uninterrupted reference run
    val refReports = SalesPipelineDag.run(spark, sf, refRoot)
    assert(refReports.forall(_.status == Succeeded))

    val root = tmp()
    val layout = SalesPipelineDag.Layout(root)
    val firstRun = SalesPipelineDag.run(spark, sf, root)
    assert(firstRun.forall(_.status == Succeeded))

    // simulate the crash artifact state: marts half-written
    def tear(dir: String): Unit = {
      val d = new java.io.File(dir)
      new java.io.File(d, "_SUCCESS").delete()
      // delete one real part-file (torn), add a stray in-progress file
      d.listFiles().filter(_.getName.startsWith("part-")).take(1).foreach(_.delete())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-99999-in-progress.snappy.parquet"),
        Array[Byte](1, 2, 3))
    }
    tear(layout.customerMetrics)
    java.nio.file.Files.walk(java.nio.file.Paths.get(layout.monthlyMart))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => p.toFile.delete())  // the other mart never started

    // restart: full rerun of the same graph on the same root
    val restart = SalesPipelineDag.run(spark, sf, root)
    assert(restart.forall(_.status == Succeeded),
      s"restart statuses: ${restart.map(r => r.id -> r.status)}")

    // layers equal the uninterrupted run's, row for row (no dupes, no
    // loss) — overwrite semantics must have cleared the torn files
    val refLayout = SalesPipelineDag.Layout(refRoot)
    for ((a, b) <- Seq(
        layout.bronzeValid -> refLayout.bronzeValid,
        layout.silverFact -> refLayout.silverFact,
        layout.scdDim -> refLayout.scdDim,
        layout.goldEnriched -> refLayout.goldEnriched,
        layout.customerMetrics -> refLayout.customerMetrics,
        layout.monthlyMart -> refLayout.monthlyMart)) {
      val da = spark.read.parquet(a)
      val db = spark.read.parquet(b)
      assert(da.count() == db.count() && da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
        s"restart layer $a must equal uninterrupted layer $b")
    }
    assert(!new java.io.File(layout.customerMetrics, "part-99999-in-progress.snappy.parquet").exists(),
      "overwrite must clear torn in-progress files")
    // the report table is identical to the uninterrupted run's
    assert(restart.map(r => (r.id, r.status, r.metric)) ==
      refReports.map(r => (r.id, r.status, r.metric)))
  }

  test("concurrent run produces the same report as sequential") {
    val seqR = SalesPipelineDag.run(spark, sf, tmp()).map(r => (r.id, r.status, r.metric))
    val parR = SalesPipelineDag.build(spark, sf, SalesPipelineDag.Layout(tmp()))
      .runConcurrent(3).map(r => (r.id, r.status, r.metric))
    assert(seqR == parR)
  }
}
