package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twin of the batch event queries.
  *
  * The reference runs its incremental path as watermark-filtered
  * batch re-reads (`utility/watermark_manager.py`); Spark-first, the
  * same pipeline is a stream: `readStream` → event-time watermark →
  * tumbling-window aggregation → sink. `Trigger.AvailableNow` turns
  * the identical code into an incremental batch job, which is the
  * scalable replacement for the reference's polling loop.
  */
object EventStream {
  /** Streaming source over an events-shaped directory of parquet.
    * (`ts` must already be a timestamp column in `schemaSource`, a
    * static frame used only to derive the schema.) */
  def readEvents(spark: SparkSession, dir: String, schemaSource: DataFrame): DataFrame =
    spark.readStream.schema(schemaSource.schema).parquet(dir)

  /** Tumbling-window aggregation per event_type with a watermark —
    * streaming twin of `QueriesAnalytics.eventsWindowed`. State for
    * windows older than the watermark is dropped, bounding memory at
    * any throughput. */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour", window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value")
      )

  /** Windowed distinct-user cardinality on a stream: exact
    * `countDistinct` is not incrementally maintainable under
    * watermark eviction (the full key set per open window would be
    * state), so the streaming twin of #54/#81 uses the mergeable HLL
    * estimate — fixed sketch bytes per (window, type) group however
    * many users appear. Same watermark-bounded state story as
    * [[windowedCounts]]. */
  def windowedDistinctUsers(
      events: DataFrame, watermark: String = "1 hour", window_ : String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("approx_users"), col("n_events"))

  /** Stream-stream interval join: pair rows of two streams sharing
    * `keys` whose event times lie within `within` of each other. Both
    * sides carry watermarks, and the time bound is part of the join
    * condition — that pair is what lets Spark EVICT buffered state
    * (an unbounded stream-stream join buffers forever). Column names
    * must be disjoint apart from the keys.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      within: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
    val cond = (keys.map { case (a, b) => l(a) === r(b) } ++ Seq(
      r(rightTime) >= l(leftTime) - expr(s"INTERVAL $within"),
      r(rightTime) <= l(leftTime) + expr(s"INTERVAL $within")
    )).reduce(_ && _)
    l.join(r, cond)
  }

  /** Streaming exact dedup with bounded state: duplicates of a key
    * arriving within the watermark horizon are dropped, and state for
    * keys older than the watermark is evicted — the streaming twin of
    * the batch exact-dedup operators, safe at any throughput (plain
    * `dropDuplicates` on a stream grows state forever). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                           n_events: Long, total_value: Double)

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): emits a session when `gapSeconds` of
    * inactivity pass (processing-time timeout closes idle sessions).
    * Streaming twin of `QueriesAnalytics.sessionize`. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        handler(gapSeconds, (state, _) => state.setTimeoutDuration(gapSeconds * 1000)))
  }

  /** Event-time-correct variant: the watermark (not wall clock) closes
    * idle sessions, so a stalled source never prematurely expires
    * state and late data inside the watermark still merges. The
    * timeout fires when the watermark passes `session_end + gap` —
    * exactly the batch-twin gap semantics. */
  def sessionizeEventTime(
      events: Dataset[Event], gapSeconds: Long = 1800L,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        handler(gapSeconds, (state, s) =>
          state.setTimeoutTimestamp(s.end + gapSeconds * 1000)))
  }

  /** Shared gap-merge fold: events sorted within a micro-batch but NOT
    * across batches — a late event may land inside, before, or after
    * the open session. In-gap membership tests the whole span and the
    * merge takes min/max so session bounds never regress under
    * disorder. Events older than the open session by more than the
    * gap accumulate into a PAST session run (consecutive late events
    * within the gap of each other merge, matching the batch twin)
    * emitted when the run closes.
    *
    * Accepted divergence from the batch twin: a late event that
    * bridges an already-emitted past session to the open one cannot
    * retroactively merge them — Append-mode streaming never retracts
    * emitted rows; global hindsight belongs to the batch formulation. */
  private[streaming] def foldEvents(
      userId: Long, cur0: Option[SessionState], events: Seq[Event], gapMs: Long
  ): (List[Session], Option[SessionState]) = {
    var out = List.empty[Session]
    var cur = cur0
    var past = Option.empty[SessionState]
    def flushPast(): Unit = past.foreach { p =>
      out ::= Session(userId, new Timestamp(p.start), new Timestamp(p.end), p.n, p.total)
      past = None
    }
    events.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
          flushPast() // later events sort >= t, so the past run is closed
          cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
            s.n + 1, s.total + e.value))
        case Some(s) if t > s.end + gapMs =>
          flushPast()
          out ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case Some(_) =>
          past match {
            case Some(p) if t >= p.start - gapMs && t <= p.end + gapMs =>
              past = Some(SessionState(math.min(p.start, t), math.max(p.end, t),
                p.n + 1, p.total + e.value))
            case Some(_) =>
              flushPast()
              past = Some(SessionState(t, t, 1, e.value))
            case None =>
              past = Some(SessionState(t, t, 1, e.value))
          }
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    flushPast()
    (out.reverse, cur)
  }

  private def handler(
      gapSeconds: Long,
      setTimeout: (GroupState[SessionState], SessionState) => Unit
  ): (Long, Iterator[Event], GroupState[SessionState]) => Iterator[Session] =
    (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (out, cur) = foldEvents(userId, state.getOption, sorted, gapSeconds * 1000)
            cur.foreach { s =>
              state.update(s)
              setTimeout(state, s)
            }
            out.iterator
          }

  /** Sessionization on the Spark 4 `transformWithState` API — the
    * successor of `flatMapGroupsWithState`: typed `ValueState` +
    * explicit event-time TIMERS (registered at `session_end + gap`,
    * re-registered as the session grows) instead of a single implicit
    * timeout. Same [[foldEvents]] semantics as the other two
    * sessionizers. Requires the RocksDB state store provider. */
  def sessionizeTws(
      events: Dataset[Event], gapSeconds: Long = 1800L,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Stateful processor backing [[sessionizeTws]]. */
  class SessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val prev = if (state.exists()) Some(state.get()) else None
      val (out, cur) = foldEvents(userId, prev, sorted, gapSeconds * 1000)
      prev.foreach(s => getHandle.deleteTimer(s.end + gapSeconds * 1000))
      cur.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s.end + gapSeconds * 1000)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
      } else Iterator.empty
  }
}
