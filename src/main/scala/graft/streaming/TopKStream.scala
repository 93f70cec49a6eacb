package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TopKSketchAgg
import graft.functions.TopKSketchAgg.{Counter, Summary}

/** Streaming heavy hitters: a per-key Space-Saving sketch maintained
  * as `flatMapGroupsWithState` state — the streaming twin of the
  * batch `topk_sketch` aggregate (#55), sharing its single
  * [[TopKSketchAgg.observe]] update rule so both paths carry the same
  * guarantees: count never under-estimates, count−err never
  * over-estimates, every item with true frequency > N/capacity is
  * present.
  *
  * Scale shape: state AND the per-batch update path are both
  * O(capacity) per key — the update folds the batch iterator straight
  * into the sketch without materializing it, so a hot key costs fixed
  * bytes however fast the stream runs or however wide the item
  * vocabulary grows; keys spread across partitions by the groupByKey
  * shuffle. Each micro-batch emits the key's current top-k (Update
  * mode), so downstream sees a continuously-refreshed leaderboard.
  *
  * ==Sink contract: crash-replay divergence==
  * The per-batch fold is deliberately order-dependent (see the inline
  * comment): which counter a tie evicts follows batch-internal arrival
  * order, and Spark does not guarantee a replayed micro-batch re-reads
  * rows in the same order. After a crash replay the SAME batch id may
  * therefore commit different `(count, err)` values for LOW-frequency
  * items — or emit a different tail row — than the output already
  * delivered downstream. The Space-Saving bounds still hold for every
  * emission (`count ≥ truth ≥ count − err`; any item with true
  * frequency > N/capacity is present), so heavy-hitter rows are stable;
  * only rows whose count is within `err` of the eviction floor can
  * flip. Sinks requiring exactly-once-style determinism per (key,
  * item, batch) must either treat rows with `count − err` below their
  * decision threshold as advisory, or buffer-and-sort upstream (giving
  * up the O(capacity) hot-key memory bound this operator exists to
  * provide — that trade is the caller's to make, not this operator's). */
object TopKStream {
  final case class Item(key: String, item: String, ts: Timestamp)
  final case class TopRow(key: String, rank: Int, item: String, count: Long, err: Long)
  /** Serializable state snapshot of a Summary. */
  final case class SketchState(entries: List[(String, Long, Long)])

  def topK(items: Dataset[Item], capacity: Int, k: Int): Dataset[TopRow] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState[SketchState, TopRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Item], state: GroupState[SketchState]) =>
          val buf = new Summary
          state.getOption.foreach(_.entries.foreach { case (i, c, e) =>
            buf.add(i, Counter(c, e))
          })
          // fold the iterator straight into the sketch: per-key memory
          // stays O(capacity) however large the micro-batch (a hot key
          // must not buffer its whole batch). The price: which counter
          // a tie evicts depends on batch-internal arrival order, so a
          // replayed batch may assign err to different LOW-frequency
          // items — the Space-Saving bounds asserted by the spec
          // (count ≥ truth ≥ count − err, heavy hitters present) hold
          // under ANY order, so nothing downstream may assume more
          rows.foreach(r => TopKSketchAgg.observe(buf, r.item, capacity))
          state.update(SketchState(
            buf.map.iterator.map { case (i, c) => (i, c.count, c.err) }.toList))
          buf.map.toSeq
            .sortBy { case (i, c) => (-c.count, i) }
            .take(k).zipWithIndex
            .map { case ((i, c), r) => TopRow(key, r + 1, i, c.count, c.err) }
            .iterator
      }
  }

  /** DataFrame convenience: expects (key, item, ts) columns. */
  def topKFrame(items: DataFrame, capacity: Int, k: Int): Dataset[TopRow] = {
    import items.sparkSession.implicits._
    topK(items.selectExpr("key", "item", "ts").as[Item], capacity, k)
  }
}
