package graft

import org.apache.spark.sql.classic.GraftTestBridge
import graft.plans.ExpandFreeDistinct

/** The injected optimizer rule: global multi-distinct aggregates
  * rewritten to the Expand-free cross-join shape, with identical
  * results and the eligibility guards holding the line. */
class ExpandFreeDistinctSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    Seq(
      (1L, 10L, "a", 5.0), (1L, 11L, "b", 6.0), (2L, 10L, "a", 7.0),
      (3L, 12L, "c", 8.0), (3L, 12L, "a", 9.0))
      .toDF("k1", "k2", "tag", "v")
      .createOrReplaceTempView("efd_t")
  }

  test("multi-distinct rewrites Expand-free with identical results") {
    view
    val df = spark.sql(
      """SELECT count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2,
        |       count(DISTINCT tag) AS d3, sum(v) AS s, count(1) AS n
        |FROM efd_t""".stripMargin)
    // baseline (no rule on the shared session): Spark's Expand path
    assert(df.queryExecution.executedPlan.toString.contains("Expand"),
      "baseline must exercise the Expand path for the comparison to mean anything")
    val rewritten = ExpandFreeDistinct(df.queryExecution.analyzed)
    assert(rewritten != df.queryExecution.analyzed, "rule must fire")
    val out = GraftTestBridge.ofRows(spark, rewritten)
    assert(!out.queryExecution.executedPlan.toString.contains("Expand"),
      out.queryExecution.executedPlan.toString)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.collect().toSeq == df.collect().toSeq)
  }

  test("null keys: count(DISTINCT) excludes NULL in both shapes") {
    Seq((Some(1L), "x"), (None, "y"), (Some(2L), "x"), (None, "z"))
      .toDF("k", "tag").createOrReplaceTempView("efd_nulls")
    val df = spark.sql(
      "SELECT count(DISTINCT k) AS dk, count(DISTINCT tag) AS dt FROM efd_nulls")
    val out = GraftTestBridge.ofRows(spark, ExpandFreeDistinct(df.queryExecution.analyzed))
    assert(out.collect().toSeq == df.collect().toSeq) // (2, 3)
    assert(out.head().getLong(0) == 2L)
  }

  test("empty input still yields the single global-aggregate row") {
    spark.range(0).selectExpr("id AS a", "id AS b").createOrReplaceTempView("efd_empty")
    val df = spark.sql(
      "SELECT count(DISTINCT a) AS da, count(DISTINCT b) AS db, sum(a) AS s FROM efd_empty")
    val out = GraftTestBridge.ofRows(spark, ExpandFreeDistinct(df.queryExecution.analyzed))
    assert(out.collect().toSeq == df.collect().toSeq) // one row: (0, 0, null)
  }

  test("grouped multi-distinct rewrites with NULL groups intact") {
    Seq(
      (Some("a"), Some(1L), 10L), (Some("a"), Some(2L), 10L), (Some("a"), None, 11L),
      (None, Some(1L), 10L), (None, Some(1L), 12L), (Some("b"), Some(3L), 13L))
      .toDF("g", "x", "y").createOrReplaceTempView("efd_grp")
    val df = spark.sql(
      """SELECT g, count(DISTINCT x) AS dx, count(DISTINCT y) AS dy, count(1) AS n
        |FROM efd_grp GROUP BY g""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("Expand"))
    val rewritten = ExpandFreeDistinct(df.queryExecution.analyzed)
    assert(rewritten != df.queryExecution.analyzed, "grouped rule must fire")
    val out = GraftTestBridge.ofRows(spark, rewritten)
    assert(!out.queryExecution.executedPlan.toString.contains("Expand"),
      out.queryExecution.executedPlan.toString)
    val expect = df.collect().map(_.toSeq).toSet
    val got = out.collect().map(_.toSeq).toSet
    assert(got == expect, s"got $got want $expect")
    // the NULL group row must survive the null-safe join: (null,1,2,2)
    assert(got.exists(r => r.head == null && r(1) == 1L && r(2) == 2L && r(3) == 2L), got)
  }

  test("grouped: keys absent from the projection still join correctly") {
    view
    val df = spark.sql(
      "SELECT count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2 FROM efd_t GROUP BY tag")
    val out = GraftTestBridge.ofRows(spark, ExpandFreeDistinct(df.queryExecution.analyzed))
    assert(out.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("eligibility guards: single-distinct / filtered / nondeterministic / distinct-on-key stay untouched") {
    view
    val untouched = Seq(
      // single distinct: Spark already plans it without Expand
      "SELECT count(DISTINCT k1) AS d1, sum(v) AS s FROM efd_t",
      // FILTER clause: excluded from the narrow match
      "SELECT count(DISTINCT k1) FILTER (WHERE v > 6) AS d1, count(DISTINCT k2) AS d2 FROM efd_t",
      // nondeterministic child: duplicating it would diverge
      "SELECT count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2 FROM (SELECT *, rand() r FROM efd_t)",
      // distinct over a grouping key: degenerate, left to Spark
      "SELECT count(DISTINCT tag) AS dt, count(DISTINCT k1) AS d1 FROM efd_t GROUP BY tag",
      // several distincts over ONE column: Spark shares the distinct
      // group without Expand — rewriting would add scans for nothing
      "SELECT count(DISTINCT k1) AS c1, sum(DISTINCT k1) AS s1 FROM efd_t")
    untouched.foreach { q =>
      val analyzed = spark.sql(q).queryExecution.analyzed
      assert(ExpandFreeDistinct(analyzed) == analyzed, s"must not rewrite: $q")
    }
  }

  test("mixed distinct functions (sum/avg/min) rewrite with identical results") {
    view
    val df = spark.sql(
      """SELECT tag, sum(DISTINCT k1) AS sd, avg(DISTINCT k2) AS ad,
        |       min(DISTINCT v) AS md, count(1) AS n
        |FROM efd_t GROUP BY tag""".stripMargin)
    val rewritten = ExpandFreeDistinct(df.queryExecution.analyzed)
    assert(rewritten != df.queryExecution.analyzed, "mixed-function rule must fire")
    val out = GraftTestBridge.ofRows(spark, rewritten)
    assert(!out.queryExecution.executedPlan.toString.contains("Expand"))
    assert(out.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("conf gate disables the rule") {
    view
    val analyzed = spark.sql(
      "SELECT count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2 FROM efd_t")
      .queryExecution.analyzed
    spark.conf.set(ExpandFreeDistinct.ConfKey, "false")
    try assert(ExpandFreeDistinct(analyzed) == analyzed)
    finally spark.conf.unset(ExpandFreeDistinct.ConfKey)
    assert(ExpandFreeDistinct(analyzed) != analyzed, "re-enabled rule must fire again")
  }
}
