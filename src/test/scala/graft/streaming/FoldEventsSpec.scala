package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import EventStream.{Event, Session, SessionState}

/** Unit tests for the shared gap-merge fold (the semantics all three
  * sessionizer APIs delegate to), exercised directly — no streaming
  * harness needed for the pure state transition. */
class FoldEventsSpec extends AnyFunSuite {
  private val gapMs = 1000L
  private def ev(t: Long, id: Long = 0L) = Event(1L, id, new Timestamp(t), 1.0)

  test("two late events within the gap of each other merge into ONE past session") {
    // open session at [10_000, 10_000]; two events >gap older, 400ms apart
    val open = Some(SessionState(10000L, 10000L, 1, 1.0))
    val (out, cur) = EventStream.foldEvents(1L, open, Seq(ev(3000), ev(3400)), gapMs)
    assert(out == List(Session(1L, new Timestamp(3000), new Timestamp(3400), 2, 2.0)))
    assert(cur.contains(SessionState(10000L, 10000L, 1, 1.0)))
  }

  test("late events beyond the gap of each other become separate past sessions") {
    val open = Some(SessionState(10000L, 10000L, 1, 1.0))
    val (out, _) = EventStream.foldEvents(1L, open, Seq(ev(2000), ev(5000)), gapMs)
    assert(out.map(s => (s.session_start.getTime, s.session_end.getTime)) ==
      List((2000L, 2000L), (5000L, 5000L)))
  }

  test("a late run flushes before an in-gap event extends the open session") {
    val open = Some(SessionState(10000L, 10000L, 1, 1.0))
    val (out, cur) = EventStream.foldEvents(
      1L, open, Seq(ev(3000), ev(3200), ev(9500)), gapMs)
    assert(out == List(Session(1L, new Timestamp(3000), new Timestamp(3200), 2, 2.0)))
    assert(cur.contains(SessionState(9500L, 10000L, 2, 2.0)))
  }

  test("in-order events split on the gap exactly like the batch twin") {
    val (out, cur) = EventStream.foldEvents(
      1L, None, Seq(ev(1000), ev(1500), ev(4000)), gapMs)
    assert(out == List(Session(1L, new Timestamp(1000), new Timestamp(1500), 2, 2.0)))
    assert(cur.contains(SessionState(4000L, 4000L, 1, 1.0)))
  }
}
