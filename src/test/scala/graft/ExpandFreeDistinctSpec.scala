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

  test("eligibility guards: grouped / single-distinct / filtered / nondeterministic stay untouched") {
    view
    val untouched = Seq(
      // grouped: the join would need NULL-safe group keys — out of scope
      "SELECT tag, count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2 FROM efd_t GROUP BY tag",
      // single distinct: Spark already plans it without Expand
      "SELECT count(DISTINCT k1) AS d1, sum(v) AS s FROM efd_t",
      // FILTER clause: excluded from the narrow match
      "SELECT count(DISTINCT k1) FILTER (WHERE v > 6) AS d1, count(DISTINCT k2) AS d2 FROM efd_t",
      // nondeterministic child: duplicating it would diverge
      "SELECT count(DISTINCT k1) AS d1, count(DISTINCT k2) AS d2 FROM (SELECT *, rand() r FROM efd_t)")
    untouched.foreach { q =>
      val analyzed = spark.sql(q).queryExecution.analyzed
      assert(ExpandFreeDistinct(analyzed) == analyzed, s"must not rewrite: $q")
    }
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
