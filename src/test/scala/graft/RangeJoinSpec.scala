package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    // (ikey, start, end, tag)
    (1L, 100L, 200L, "a"),
    (1L, 300L, 400L, "b"),
    (2L, 0L, 1000L, "wide"),
    (1L, 150L, 160L, "nested") // overlaps "a": a point can hit two intervals
  ).toDF("ikey", "s", "e", "itag")

  private val points = Seq(
    (1L, 100L, "p-left-edge"),   // on start boundary of a
    (1L, 155L, "p-two-hits"),    // inside a AND nested
    (1L, 200L, "p-right-edge"),  // on end boundary of a
    (1L, 250L, "p-gap"),         // no interval
    (1L, 400L, "p-b-end"),
    (2L, 999L, "p-wide"),
    (3L, 155L, "p-no-key")
  ).toDF("pkey", "p", "ptag")

  test("point-in-interval matches boundaries, multiples, and respects keys") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      keys = Seq(("pkey", "ikey")), bucketWidth = 50L)
      .select("ptag", "itag").as[(String, String)].collect().toSet
    assert(out == Set(
      ("p-left-edge", "a"), ("p-two-hits", "a"), ("p-two-hits", "nested"),
      ("p-right-edge", "a"), ("p-b-end", "b"), ("p-wide", "wide")))
  }

  test("bucket width does not change the result, only the plan") {
    for (w <- Seq(1L, 7L, 1000L, 100000L)) {
      val n = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        Seq(("pkey", "ikey")), w).count()
      assert(n == 6, s"width $w")
    }
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      Seq(("pkey", "ikey")), 50L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap emits each intersecting pair exactly once") {
    val l = Seq((1L, 100L, 200L, "L1"), (1L, 300L, 310L, "L2"), (2L, 0L, 10L, "L3"))
      .toDF("lk", "ls", "le", "ltag")
    val r = Seq(
      (1L, 150L, 450L, "R1"),  // overlaps L1 (150-200) and L2 (300-310) across many buckets
      (1L, 201L, 299L, "R2"),  // gap between L1 and L2
      (2L, 10L, 20L, "R3")     // touches L3 at a single point
    ).toDF("rk", "rs", "re", "rtag")
    val out = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
      keys = Seq(("lk", "rk")), bucketWidth = 25L)
      .select("ltag", "rtag").as[(String, String)].collect().toList
    assert(out.size == out.toSet.size, "pairs must be de-duplicated")
    assert(out.toSet == Set(("L1", "R1"), ("L2", "R1"), ("L3", "R3")))
  }

  test("verified query: every event lands in exactly one session") {
    val out = QueriesScale.rangeJoinSessions(spark, sf)
    val events = Tables.events(spark, sf).count()
    assert(out.count() == events)
    assert(out.select("event_id").distinct().count() == events)
  }
}
