package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch bot-regularity screen
  * (`QueriesMart.botRegularity`, #134): per-user inter-event gap
  * moments as bounded state, burstiness re-emitted on every
  * micro-batch that touches the user.
  *
  * The moments are PERFECTLY incremental — state is five numbers per
  * user (last event, events, gaps, Σg, Σg²), no window buffer — so
  * the screen runs at any user cardinality and any retention
  * horizon, where a windowed reformulation would buffer every gap.
  * Σg² accumulates in BigDecimal (a long would pass Int64 once
  * second-scale gaps square against year-long idle spans — the same
  * widening the batch twin applies via DECIMAL(38,0)); the
  * burstiness ratio is computed in exact BigInt arithmetic with the
  * same floor-division semantics as the batch `div`, so a full
  * single-batch replay reproduces the batch values bit-for-bit
  * (spec-asserted).
  *
  * Ordering contract (same as [[TransitionStream]]): events sort by
  * (ts, event_id) within a micro-batch; across batches the stored
  * newest event defines the next gap, and a straggler batch cannot
  * regress it — a straggler is counted as an event but forms no gap
  * (the `gaps` count tracks real gaps, so moments stay consistent). */
object RegularityStream {
  final case class UserEvent(user_id: Long, event_id: Long, ts: Timestamp)
  final case class Moments(
      lastTs: Long, lastId: Long, n: Long, gaps: Long, sg: Long, sgg: BigDecimal)
  final case class Regularity(
      user_id: Long, n_events: Long, n_gaps: Long, sum_gap_s: Long,
      mean_gap_s_permille: Long, burstiness_permille: Long)

  /** Exact floor division on nonnegative operands, matching the
    * batch `div` (IntegralDivide truncation == floor for x,y ≥ 0). */
  private def divBI(num: BigInt, den: BigInt): Long =
    if (den == 0) 0L else (num / den).toLong

  def regularity(events: Dataset[UserEvent]): Dataset[Regularity] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Moments, Regularity](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[Moments]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var m = state.getOption
            .getOrElse(Moments(Long.MinValue, Long.MinValue, 0L, 0L, 0L, BigDecimal(0)))
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000L // second grain, like the batch twin
            if (m.n == 0L) {
              m = Moments(t, e.event_id, 1L, 0L, 0L, BigDecimal(0))
            } else {
              val newer = m.lastTs < t || (m.lastTs == t && m.lastId < e.event_id)
              if (newer) {
                val g = t - m.lastTs
                m = Moments(t, e.event_id, m.n + 1L, m.gaps + 1L, m.sg + g,
                  m.sgg + BigDecimal(g) * BigDecimal(g))
              } else {
                // straggler: counted as an event, but it cannot form a
                // (negative) gap against the newer stored predecessor
                // and must not regress the state
                m = m.copy(n = m.n + 1L)
              }
            }
          }
          state.update(m)
          if (m.n == 0L) Iterator.empty
          else {
            val sg = BigInt(m.sg)
            val sgg = m.sgg.toBigInt
            val burst =
              if (m.sg <= 0L) 0L
              else divBI((BigInt(m.gaps) * sgg - sg * sg) * 1000, sg * sg)
            // sum_gap_s is emitted raw so downstream gates can use the
            // batch twin's exact `sg > 0` condition — the truncated
            // mean is 0 both when sg = 0 AND when 1000·sg < gaps, so
            // filtering on the mean would diverge from the batch gate
            Iterator.single(Regularity(user, m.n, m.gaps, m.sg,
              if (m.sg <= 0L) 0L else divBI(sg * 1000, BigInt(m.gaps)), burst))
          }
      }
  }
}
