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

  /** Candidate pairs from a stream of docs. `n`/`k`/`bands` must
    * match the batch index's parameters.
    *
    * CONTRACT: within a micro-batch the output is a candidate SET —
    * a pair colliding in several bands is collapsed to one row
    * carrying the lowest colliding band (bucket groups are processed
    * independently, so the collapse is a second, zero-state pass
    * keyed on the pair; candidates are collision-rare, so that extra
    * shuffle moves candidate-grain rows, never doc-grain). ACROSS
    * micro-batches the multiset caveat remains in one narrow case: a
    * doc_id landing in a saturated bucket is not recorded in state,
    * so the same doc re-arriving in a later batch re-emits its
    * pairs. That is safe by design — the pipeline contract is
    * generate-then-verify and [[graft.text.DedupOps.verifyPairsExact]]
    * is idempotent per pair — and deduplicating it would need an
    * unbounded seen-pairs state, breaking the bounded-state guarantee
    * that makes the gate deployable. Exactly-once-style sinks keyed
    * on (doc_id, prior_doc_id) are therefore safe within any batch
    * and idempotent across the saturated-bucket replay. */
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
    // within-batch cross-band collapse: group on the pair, emit one
    // row (lowest band), never touch state — nothing is persisted, so
    // the bounded-state guarantee is unchanged and the per-batch cost
    // is a shuffle of candidate-grain rows only
    perBucket
      .groupByKey(c => (c.doc_id, c.prior_doc_id))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, _) => Iterator.single(rows.minBy(_.band))
      }
  }

}
