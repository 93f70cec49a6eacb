package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch event-transition matrix
  * (`QueriesAnalytics.eventTransitions`, #100): per-user first-order
  * transitions as an append stream.
  *
  * State is the cheapest of any stateful operator here: ONE
  * (ts, event_id, event_type) triple per user — no window buffer, no
  * sketch — so the operator is deployable at any user cardinality the
  * groupByKey shuffle can spread. Downstream, the emitted pairs
  * aggregate to the matrix with an ordinary streaming `groupBy.count`
  * (Update mode) or land raw in a sink for batch rollup.
  *
  * Ordering contract: events are sorted by (ts, event_id) WITHIN a
  * micro-batch (the fold must see a user's batch slice in time order,
  * which costs that slice in memory — inherent to order-sensitive
  * stateful logic, same as the sessionizer). ACROSS batches the
  * state's last-seen event defines the predecessor: a straggler
  * arriving in a later batch than a newer event emits its transition
  * out of true event-time order, and state keeps the NEWEST event by
  * (ts, event_id) — a straggler can never regress the stored
  * predecessor for future batches. Under an ordered-per-user source
  * (the usual Kafka key-partitioning) replaying the full stream in
  * one batch reproduces the batch matrix exactly — spec-asserted. */
object TransitionStream {
  final case class TypedEvent(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)
  final case class LastSeen(ts: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, prev_type: String, event_type: String)

  def transitions(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[LastSeen]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l => out += Transition(user, l.event_type, e.event_type))
            // newest-wins: a straggler batch whose events all predate
            // the stored last-seen emits its transition (against the
            // newer state, documented above) but must NOT regress the
            // stored predecessor for future batches
            val newer = last.forall(l =>
              l.ts < e.ts.getTime || (l.ts == e.ts.getTime && l.event_id < e.event_id))
            if (newer) last = Some(LastSeen(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
