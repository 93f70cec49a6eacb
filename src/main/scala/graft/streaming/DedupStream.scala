package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.DedupOps

/** Streaming near-duplicate GATE: the streaming twin of the batch
  * incremental MinHash dedup (`QueriesText.dedupIncremental`).
  *
  * Arriving docs are signed map-side (native `minhash_sig`, no
  * shuffle), exploded to band-bucket keys via the SAME
  * [[DedupOps.minhashBanded]] derivation the batch candidate
  * generators use — the gate only works while stream and batch derive
  * bit-identical band keys, so there is exactly one derivation. Each
  * bucket's state holds the first-seen doc ids (bounded by
  * `maxPerBucket`); a new doc landing in a seen bucket emits
  * candidate pairs for downstream EXACT verification
  * (`DedupOps.verifyPairsExact` on the stored corpus) — same
  * generate-then-verify contract as batch, so the sketch remains an
  * accelerator, never the decision.
  *
  * Scale shape: state is the band index itself — #distinct buckets ×
  * maxPerBucket ids, spread across partitions by bucket key (the
  * groupByKey shuffle key), which is exactly how a 100 TB corpus's
  * band index distributes. No timeout: corpus membership does not
  * expire; bound growth with `maxPerBucket` (collision-heavy buckets
  * saturate and stop accumulating — the df-cutoff analogue).
  */
object DedupStream {
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  final case class Candidate(doc_id: Long, prior_doc_id: Long, band: Int)
  final case class BucketState(ids: List[Long])
  /** One-bit per-pair marker: existence IS the bit (the field only
    * keeps the encoder non-degenerate). */
  final case class PairSeen(seen: Boolean = true)

  /** Candidate pairs from a stream of docs. `n`/`k`/`bands` must
    * match the batch index's parameters.
    *
    * CONTRACT: the output is a candidate SET across the whole stream —
    * each (doc_id, prior_doc_id) pair is emitted exactly once. Within
    * a micro-batch, cross-band collisions collapse to one row carrying
    * the lowest colliding band; across micro-batches, a persisted
    * per-pair seen-bit suppresses replays (the one replay source: a
    * doc re-arriving in a SATURATED bucket is not in bucket state, so
    * the bucket stage re-emits its pairs — the seen-bit stage drops
    * them). The pair stage is keyed on the pair, so its shuffle moves
    * candidate-grain rows only, never doc-grain.
    *
    * State bounds: bucket state is #buckets × maxPerBucket ids (the
    * band index itself). Pair state is one bit per DISTINCT emitted
    * candidate pair — by construction ≤ bands × maxPerBucket pairs per
    * doc lifetime, i.e. the same cardinality the downstream verify
    * sink already ingests; a gate whose output fits the sink has pair
    * state that fits beside it. Both states shard across partitions by
    * their group keys, which is how a 100 TB corpus's index
    * distributes. */
  def candidates(
      docs: DataFrame, n: Int = 3, k: Int = 48, bands: Int = 24,
      maxPerBucket: Int = 8
  ): Dataset[Candidate] = {
    require(k % bands == 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = DedupOps.minhashSignaturesNative(docs, "doc_id", col("text"), n, k)
    val banded = DedupOps.minhashBanded(sigs, "doc_id", k / bands, bands)
      .select(col("doc_id"), col("band").cast("int").as("band"), col("bkey"))
      .as[(Long, Int, Long)]
    val perBucket = banded
      .groupByKey { case (_, band, bkey) => (band, bkey) }
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), rows, state: GroupState[BucketState]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Nil)
          // deterministic within a batch whatever the source order
          val newIds = rows.map(_._1).toSeq.distinct.sorted
          val out = Seq.newBuilder[Candidate]
          var kept = seen
          newIds.foreach { id =>
            if (!kept.contains(id)) {
              kept.foreach(prior => out += Candidate(id, prior, band))
              if (kept.size < maxPerBucket) kept = kept :+ id
            }
          }
          if (kept != seen) state.update(BucketState(kept))
          out.result().iterator
      }
    // pair stage: collapse cross-band collisions within the batch AND
    // persist a one-bit seen marker per pair, so a saturated-bucket
    // replay in a later batch is dropped instead of re-emitted —
    // exactly-once per pair for the stream's lifetime
    perBucket
      .groupByKey(c => (c.doc_id, c.prior_doc_id))
      .flatMapGroupsWithState[PairSeen, Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[PairSeen]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(PairSeen())
            Iterator.single(rows.minBy(_.band))
          }
      }
  }

}
