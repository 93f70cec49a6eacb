package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream
import graft.operators.WatermarkStore
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch twin (AvailableNow)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    // stage events (with µs ts) as the stream source
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir + "/in")

    val src = EventStream.readEvents(spark, dir + "/in", spark.read.parquet(dir + "/in"))
    val q = EventStream.windowedCounts(src)
      .writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_counts")
      .select($"window_start", $"event_type", $"n_events", $"total_value")
    val batch = QueriesAnalytics.eventsWindowed(spark, sf)
      .select($"window_start", $"event_type", $"n_events", $"total_value")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("flatMapGroupsWithState sessionizer matches batch session count on a replay") {
    // run the stateful function over a batch Dataset (same code path
    // Structured Streaming invokes per micro-batch across all groups)
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", date_trunc("second", $"ts").as("ts"), $"value")
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(ev) // batch Dataset: state starts empty, full replay
    val batchSessions = QueriesAnalytics.sessionize(spark, sf)
    // streaming emits only CLOSED sessions; open tails (one per user) stay in state
    val users = ev.select($"user_id").distinct().count()
    assert(sessions.count() == batchSessions.count() - users)
  }

  test("watermark store round-trips and survives re-reads") {
    val dir = Files.createTempDirectory("graft_wm").toString
    val wm = new WatermarkStore(dir)
    assert(wm.get("sales") == "2020-01-01 00:00:00")
    wm.update("sales", "2024-01-15 00:00:00")
    assert(wm.get("sales") == "2024-01-15 00:00:00")
    assert(new WatermarkStore(dir).get("sales") == "2024-01-15 00:00:00")
  }
}
