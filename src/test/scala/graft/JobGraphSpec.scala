package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, JobGraph}
import graft.operators.JobGraph.{Failed, JobReport, Skipped, Succeeded}

/** DAG-of-jobs orchestration (operators/JobGraph.scala) — the
  * data-plane mirror of the reference Airflow DAG: dependency order,
  * retries, upstream-failure skipping, quality gate, deterministic
  * reports. */
class JobGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ids(rs: Seq[JobReport]) = rs.map(_.id)

  test("medallion chain runs in dependency order and reports row metrics") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    var silverRows = -1L
    val lineitem = Tables.lineitem(spark, sf)

    val g = new JobGraph()
    // declared deliberately OUT of topological order: dispatch must
    // follow deps, not declaration, while reports keep declaration order
    g.add("gold_quality_check", deps = Seq("gold_metrics")) {
      order += "gold_quality_check"
      JobGraph.gate(DataQuality.run(
        lineitem.limit(50),
        Seq(DataQuality.NotNull("l_orderkey"), DataQuality.Between("l_discount", 0.0, 1.0))))
    }
    g.add("bronze_ingest") {
      order += "bronze_ingest"
      lineitem.count()
    }
    g.add("silver_standardize", deps = Seq("bronze_ingest")) {
      order += "silver_standardize"
      silverRows = lineitem.where($"l_quantity" > 0).count(); silverRows
    }
    g.add("gold_metrics", deps = Seq("silver_standardize")) {
      order += "gold_metrics"
      lineitem.groupBy("l_returnflag").count().count()
    }

    val rs = g.run()
    assert(order.toSeq ==
      Seq("bronze_ingest", "silver_standardize", "gold_metrics", "gold_quality_check"))
    // reports in declaration order
    assert(ids(rs) ==
      Seq("gold_quality_check", "bronze_ingest", "silver_standardize", "gold_metrics"))
    assert(rs.forall(_.status == Succeeded) && g.allOk(rs))
    assert(rs.find(_.id == "silver_standardize").get.metric == silverRows)
    assert(rs.find(_.id == "gold_quality_check").get.metric == 50L) // gate returns row_count
  }

  test("a failed job skips its descendants but not independent branches") {
    val g = new JobGraph()
    g.add("a") { 1L }
    g.add("b", deps = Seq("a"), retries = 1) { throw new RuntimeException("boom") }
    g.add("c", deps = Seq("b")) { 1L }
    g.add("d", deps = Seq("c")) { 1L }
    g.add("e", deps = Seq("a")) { 7L } // sibling branch must still run
    val rs = g.run()
    val byId = rs.map(r => r.id -> r).toMap
    assert(byId("a").status == Succeeded)
    assert(byId("b").status.isInstanceOf[Failed] && byId("b").attempts == 2)
    assert(byId("c").status == Skipped(Seq("b")))
    assert(byId("d").status == Skipped(Seq("c"))) // transitive
    assert(byId("e").status == Succeeded && byId("e").metric == 7L)
    assert(!g.allOk(rs))
  }

  test("retries re-run the body until success within the budget") {
    var calls = 0
    val g = new JobGraph()
    g.add("flaky", retries = 2) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"attempt $calls") else 42L
    }
    val rs = g.run()
    assert(rs.head.status == Succeeded && rs.head.attempts == 3 && rs.head.metric == 42L)
  }

  test("miswired graphs fail validation before any job runs") {
    var ran = false
    val cyc = new JobGraph()
    cyc.add("x", deps = Seq("y")) { ran = true; 1L }
    cyc.add("y", deps = Seq("x")) { ran = true; 1L }
    val e1 = intercept[IllegalStateException](cyc.run())
    assert(e1.getMessage.contains("cycle") && !ran)

    val unknown = new JobGraph()
    unknown.add("x", deps = Seq("nope")) { ran = true; 1L }
    assert(intercept[IllegalArgumentException](unknown.run()).getMessage.contains("unknown"))
    assert(!ran)

    val dup = new JobGraph()
    dup.add("x") { 1L }
    intercept[IllegalArgumentException](dup.add("x") { 1L })
  }

  test("violated quality gate fails the job and skips downstream") {
    val g = new JobGraph()
    g.add("gate") {
      // impossible expectation: every acctbal "between 0 and 0"
      JobGraph.gate(DataQuality.run(
        Tables.customer(spark, sf), Seq(DataQuality.Between("c_acctbal", 0.0, 0.0))))
    }
    g.add("publish", deps = Seq("gate")) { 1L }
    val rs = g.run()
    val byId = rs.map(r => r.id -> r).toMap
    byId("gate").status match {
      case Failed(err) => assert(err.getMessage.contains("quality gate failed"))
      case s           => fail(s"expected Failed, got $s")
    }
    assert(byId("publish").status == Skipped(Seq("gate")))
  }

  test("concurrent execution yields the same reports as sequential") {
    def build(): JobGraph = {
      val g = new JobGraph()
      g.add("root") { 1L }
      (1 to 6).foreach(i => g.add(s"branch$i", deps = Seq("root")) { i.toLong })
      g.add("join", deps = (1 to 6).map(i => s"branch$i")) { 100L }
      g
    }
    val seq = build().run().map(r => (r.id, r.status, r.metric))
    val par = build().runConcurrent(4).map(r => (r.id, r.status, r.metric))
    assert(seq == par)
    assert(seq.last == (("join", Succeeded, 100L)))
  }
}
