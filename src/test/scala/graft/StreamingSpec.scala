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

  test("streaming windowed distinct users equals the batch HLL estimate") {
    val dir = Files.createTempDirectory("graft_stream_du").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir + "/in")
    val src = EventStream.readEvents(spark, dir + "/in", spark.read.parquet(dir + "/in"))
    val q = EventStream.windowedDistinctUsers(src)
      .writeStream.format("memory").queryName("win_users")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // same sketch params on the same rows → identical estimates, and
    // the estimate stays inside the 2%-rsd envelope of the exact count
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"),
        countDistinct($"user_id").as("exact_users"))
      .select($"window.start".as("window_start"), $"event_type", $"approx_users", $"exact_users")
    val joined = spark.table("win_users")
      .join(batch.withColumnRenamed("approx_users", "batch_approx"),
        Seq("window_start", "event_type"))
    assert(joined.where($"approx_users" =!= $"batch_approx").count() == 0)
    assert(joined.where(abs($"approx_users" - $"exact_users") * 100 > $"exact_users" * 10).count() == 0)
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

  test("sessionize: a late cross-batch event cannot regress session bounds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, v: Double = 1.0) =
      EventStream.Event(1L, id, Timestamp.valueOf(t), v)

    // the event-time variant is used here because ProcessingTimeTimeout
    // makes the engine re-trigger micro-batches forever (timeouts can
    // always fire later), so processAllAvailable never settles; the
    // merge logic under test is shared by both variants. A huge
    // watermark delay keeps the late event from being dropped.
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeEventTime(in.toDS(), watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    try {
      in.addData(ev(1, "2026-01-01 10:00:00"), ev(2, "2026-01-01 10:10:00"))
      q.processAllAvailable()
      // batch 2: late in-gap event BEFORE the current session end
      in.addData(ev(3, "2026-01-01 10:05:00"))
      q.processAllAvailable()
      // batch 3: far-future event closes the open session via the gap path
      in.addData(ev(4, "2026-01-02 10:00:00"))
      q.processAllAvailable()
      val sessions = spark.table("sess_ooo")
        .select($"session_start".cast("string"), $"session_end".cast("string"), $"n_events")
        .as[(String, String, Long)].collect().toSet
      // end stays 10:10 (not regressed to 10:05); the late event still counts
      assert(sessions == Set(("2026-01-01 10:00:00", "2026-01-01 10:10:00", 3L)))
    } finally q.stop()
  }

  test("sessionizeEventTime closes idle sessions via the event-time watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, id: Long, t: String) =
      EventStream.Event(user, id, Timestamp.valueOf(t), 1.0)

    val in = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeEventTime(in.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_evt").outputMode("append").start()
    try {
      in.addData(ev(1, 1, "2026-01-01 10:00:00"), ev(1, 2, "2026-01-01 10:10:00"))
      q.processAllAvailable()
      // another USER's far-future event advances the watermark past
      // user 1's end+gap; the timeout then fires on the next batch.
      in.addData(ev(2, 3, "2026-01-02 00:00:00"))
      q.processAllAvailable()
      in.addData(ev(2, 4, "2026-01-02 00:01:00"))
      q.processAllAvailable()
      val u1 = spark.table("sess_evt").filter($"user_id" === 1L)
        .select($"session_start".cast("string"), $"session_end".cast("string"), $"n_events")
        .as[(String, String, Long)].collect().toSet
      assert(u1 == Set(("2026-01-01 10:00:00", "2026-01-01 10:10:00", 2L)))
    } finally q.stop()
  }

  test("transformWithState sessionizer: timers close idle sessions, merge matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, id: Long, t: String) =
      EventStream.Event(user, id, Timestamp.valueOf(t), 1.0)

    // transformWithState requires the RocksDB state store; scope it to
    // this query and restore the default for the other streaming specs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeTws(in.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_tws").outputMode("append").start()
    try {
      in.addData(ev(1, 1, "2026-01-01 10:00:00"), ev(1, 2, "2026-01-01 10:10:00"))
      q.processAllAvailable()
      // user 2 far ahead advances the watermark past user 1's end+gap;
      // the registered timer then fires on a subsequent batch
      in.addData(ev(2, 3, "2026-01-02 00:00:00"))
      q.processAllAvailable()
      in.addData(ev(2, 4, "2026-01-02 00:01:00"))
      q.processAllAvailable()
      val u1 = spark.table("sess_tws").filter($"user_id" === 1L)
        .select($"session_start".cast("string"), $"session_end".cast("string"), $"n_events")
        .as[(String, String, Long)].collect().toSet
      assert(u1 == Set(("2026-01-01 10:00:00", "2026-01-01 10:10:00", 2L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming dedup drops within-watermark duplicates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, id: Long, t: String) =
      EventStream.Event(user, id, Timestamp.valueOf(t), 1.0)

    val in = MemoryStream[EventStream.Event]
    val q = EventStream.dedupEvents(in.toDS().toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_evt").outputMode("append").start()
    try {
      in.addData(ev(1, 100, "2026-01-01 10:00:00"), ev(1, 100, "2026-01-01 10:00:01"))
      q.processAllAvailable()
      // later batch, same key, still inside the watermark: dropped
      in.addData(ev(1, 100, "2026-01-01 10:02:00"), ev(2, 200, "2026-01-01 10:02:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_evt").select($"event_id").as[Long].collect().toList
      assert(ids.sorted == List(100L, 200L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the bound, drops others") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    final case class View(v_user: Long, view_id: Long, v_ts: Timestamp)
    final case class Buy(b_user: Long, buy_id: Long, b_ts: Timestamp)
    def t(s: String) = Timestamp.valueOf(s)

    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventStream.intervalJoin(
      views.toDS().toDF("v_user", "view_id", "v_ts"),
      buys.toDS().toDF("b_user", "buy_id", "b_ts"),
      keys = Seq(("v_user", "b_user")),
      leftTime = "v_ts", rightTime = "b_ts", within = "30 minutes")
    val q = joined.select("view_id", "buy_id")
      .writeStream.format("memory").queryName("sj").outputMode("append").start()
    try {
      views.addData((1L, 10L, t("2026-01-01 10:00:00")), (2L, 11L, t("2026-01-01 10:00:00")))
      buys.addData(
        (1L, 20L, t("2026-01-01 10:10:00")),  // within 30 min of view 10
        (2L, 21L, t("2026-01-01 12:00:00")))  // 2h after view 11: out of bound
      q.processAllAvailable()
      val out = spark.table("sj").as[(Long, Long)].collect().toSet
      assert(out == Set((10L, 20L)))
    } finally q.stop()
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
