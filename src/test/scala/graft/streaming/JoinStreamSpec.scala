package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  private def ev(user: Long, id: Long, t: String) = (user, id, Timestamp.valueOf(t))

  test("cross-batch pairs match the batch twin; horizon bound respected") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    def frame(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val q = JoinStream.attribution(frame(clicks), frame(buys), 3600L, "10 seconds")
      .writeStream.format("memory").queryName("attr_x").outputMode("append").start()
    try {
      // batch 1: clicks only — nothing can emit yet
      clicks.addData(
        ev(1, 10, "2026-01-01 10:00:00"),
        ev(1, 11, "2026-01-01 10:30:00"),
        ev(2, 20, "2026-01-01 09:00:00"))
      q.processAllAvailable()
      assert(spark.table("attr_x").isEmpty)
      // batch 2: purchases — user 1's purchase pairs with BOTH its
      // clicks (state survived the batch boundary); user 2's click is
      // outside the 1h horizon and must not pair
      buys.addData(
        ev(1, 100, "2026-01-01 10:45:00"),
        ev(2, 200, "2026-01-01 11:30:00"))
      q.processAllAvailable()
      val got = spark.table("attr_x")
        .select($"purchase_id", $"click_id", $"lag_seconds")
        .as[(Long, Long, Long)].collect().toList.sorted
      assert(got == List((100L, 10L, 2700L), (100L, 11L, 900L)), got)

      // replay equivalence: the batch twin over the union of all
      // arrived data produces exactly the emitted pairs
      val cAll = Seq(ev(1, 10, "2026-01-01 10:00:00"), ev(1, 11, "2026-01-01 10:30:00"),
        ev(2, 20, "2026-01-01 09:00:00")).toDF("user_id", "event_id", "ts")
      val bAll = Seq(ev(1, 100, "2026-01-01 10:45:00"), ev(2, 200, "2026-01-01 11:30:00"))
        .toDF("user_id", "event_id", "ts")
      val twin = JoinStream.attributionBatch(cAll, bAll, 3600L)
        .select($"purchase_id", $"click_id", $"lag_seconds")
        .as[(Long, Long, Long)].collect().toList.sorted
      assert(twin == got, s"streamed $got != batch $twin")
    } finally q.stop()
  }

  test("watermark + horizon evict click state: a too-late click never pairs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    def frame(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    // tight watermark so the second batch's event-time jump finalizes
    // the first hour
    val q = JoinStream.attribution(frame(clicks), frame(buys), 60L, "1 seconds")
      .writeStream.format("memory").queryName("attr_late").outputMode("append").start()
    try {
      clicks.addData(ev(1, 10, "2026-01-01 10:00:00"))
      buys.addData(ev(1, 100, "2026-01-01 10:00:30"))
      q.processAllAvailable()
      // advance both watermarks far past click_ts + horizon
      clicks.addData(ev(9, 90, "2026-01-01 12:00:00"))
      buys.addData(ev(9, 900, "2026-01-01 12:00:01"))
      q.processAllAvailable()
      q.processAllAvailable()
      // a click an hour late: its join window is fully below both
      // watermarks — it must be discarded, not buffered or paired
      clicks.addData(ev(1, 11, "2026-01-01 10:00:25"))
      // a purchase that WOULD pair with it if state were unbounded
      buys.addData(ev(1, 101, "2026-01-01 12:00:10"))
      q.processAllAvailable()
      val pairs = spark.table("attr_late")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((100L, 10L)), pairs)
      assert(!pairs.exists(_._2 == 11L), s"late click paired: $pairs")
    } finally q.stop()
  }
}
