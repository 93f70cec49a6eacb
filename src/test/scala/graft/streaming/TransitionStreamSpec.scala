package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.{QueriesAnalytics, SparkSpec, Tables}

class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("full replay reproduces the batch transition matrix exactly") {
    // run the stateful function over a batch Dataset (the same code
    // path Structured Streaming invokes per micro-batch, state empty)
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", date_trunc("second", $"ts").as("ts"), $"event_type")
      .as[TransitionStream.TypedEvent]
    val streamed = TransitionStream.transitions(ev)
      .groupBy($"prev_type", $"event_type").agg(count(lit(1)).as("n"))
    val batch = QueriesAnalytics.eventTransitions(spark, sf)
      .select($"prev_type", $"event_type", $"n")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("state carries the predecessor across micro-batches, once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, user: Long, t: String, typ: String) =
      TransitionStream.TypedEvent(user, id, Timestamp.valueOf(t), typ)

    val in = MemoryStream[TransitionStream.TypedEvent]
    val q = TransitionStream.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans_x").outputMode("append").start()
    try {
      // batch 1: user 1 view->click; user 2 single event (no pair yet)
      in.addData(
        ev(1, 1, "2026-01-01 10:00:00", "view"),
        ev(2, 1, "2026-01-01 10:00:05", "click"),
        ev(3, 2, "2026-01-01 10:00:02", "view"))
      q.processAllAvailable()
      // batch 2: both users continue — the cross-batch predecessor
      // must come from state, not be re-emitted
      in.addData(
        ev(4, 1, "2026-01-01 10:00:09", "buy"),
        ev(5, 2, "2026-01-01 10:00:07", "click"))
      q.processAllAvailable()
      val out = spark.table("trans_x")
        .select($"user_id", $"prev_type", $"event_type")
        .as[(Long, String, String)].collect().toList.sorted
      assert(out == List(
        (1L, "click", "buy"),
        (1L, "view", "click"),
        (2L, "view", "click")), out)
    } finally q.stop()
  }

  test("a straggler batch cannot regress the stored predecessor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, typ: String) =
      TransitionStream.TypedEvent(9L, id, Timestamp.valueOf(t), typ)
    val in = MemoryStream[TransitionStream.TypedEvent]
    val q = TransitionStream.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans_lag").outputMode("append").start()
    try {
      in.addData(ev(1, "2026-01-01 10:00:00", "view"), ev(3, "2026-01-01 10:00:20", "buy"))
      q.processAllAvailable()
      // straggler older than the stored last-seen (buy@20): emits its
      // transition against the newer state but must NOT become state
      in.addData(ev(2, "2026-01-01 10:00:10", "click"))
      q.processAllAvailable()
      // next event's predecessor must still be buy@20, not the straggler
      in.addData(ev(4, "2026-01-01 10:00:30", "pay"))
      q.processAllAvailable()
      val out = spark.table("trans_lag")
        .select($"prev_type", $"event_type").as[(String, String)].collect().toList
      assert(out.contains(("buy", "pay")), out)
      assert(!out.contains(("click", "pay")), s"state regressed to the straggler: $out")
    } finally q.stop()
  }

  test("within-batch order comes from (ts, event_id), not arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, typ: String) =
      TransitionStream.TypedEvent(7L, id, Timestamp.valueOf(t), typ)
    val in = MemoryStream[TransitionStream.TypedEvent]
    val q = TransitionStream.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans_ord").outputMode("append").start()
    try {
      // delivered out of order within one batch
      in.addData(
        ev(3, "2026-01-01 10:00:20", "buy"),
        ev(1, "2026-01-01 10:00:00", "view"),
        ev(2, "2026-01-01 10:00:10", "click"))
      q.processAllAvailable()
      val out = spark.table("trans_ord")
        .select($"prev_type", $"event_type").as[(String, String)].collect().toSet
      assert(out == Set(("view", "click"), ("click", "buy")), out)
    } finally q.stop()
  }
}
