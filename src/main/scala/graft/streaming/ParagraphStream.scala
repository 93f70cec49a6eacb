package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.{DedupOps, TextOps}

/** Streaming paragraph-grain dedup: the streaming twin of the batch
  * block-first-occurrence family (#141 profile / #142 strip / #144
  * funnel stage 4) for a corpus that arrives as a stream.
  *
  * Arriving docs are cut into blocks map-side by the SAME
  * [[DedupOps.paragraphBlocks]] derivation every batch consumer uses
  * (one derivation → bit-identical block boundaries and hashes), then
  * keyed by block hash into a `flatMapGroupsWithState` ownership
  * index: the FIRST claim on a block owns it forever; every later
  * claim is emitted as a strippable duplicate. Ownership is
  * first-ARRIVAL (streaming ingest semantics — the index grows as the
  * corpus streams in), with (doc_id, para_idx) tiebreak inside a
  * micro-batch, so replaying a corpus as ONE batch in doc_id order
  * reproduces the batch operators' (min doc_id, para_idx) firsts
  * exactly — the replay-equivalence the spec pins.
  *
  * Scale shape: state is the block index itself — one (owner doc,
  * para idx) pair per DISTINCT block, sharded across partitions by
  * the block-hash group key, which is exactly how the batch
  * aggregate's exchange distributes. A viral boilerplate block is ONE
  * state row however many times it arrives; per micro-batch it costs
  * its claim rows only (the same bound the batch combinable-min
  * gives). No timeout: block ownership, like corpus membership in
  * [[DedupStream]], does not expire.
  */
object ParagraphStream {
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  /** One row per arriving block: `owned` = this claim is the block's
    * global first occurrence (keep it); `!owned` = strippable dup. */
  final case class Claim(doc_id: Long, para_idx: Int, ntok: Long, owned: Boolean)
  final case class BlockOwner(doc_id: Long, paraIdx: Int)

  /** Block ownership claims from a stream of docs. `paraTokens` must
    * match the batch operators' block size for twin-equivalence. */
  def claims(docs: DataFrame, paraTokens: Int = 20): Dataset[Claim] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocks = DedupOps.paragraphBlocks(
      docs.where(col("text").isNotNull)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__t")),
      "doc_id", paraTokens)
      .select(col("doc_id"), col("para_idx"), md5(col("para")).as("h"), col("ntok"))
      .as[(Long, Int, String, Long)]
    blocks
      .groupByKey(_._3)
      .flatMapGroupsWithState[BlockOwner, Claim](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[BlockOwner]) =>
          if (state.exists)
            // a block that already has an owner emits every arrival as
            // a duplicate regardless of order — stream the iterator
            // through without the buffer+sort (viral blocks are exactly
            // the groups where that buffer would be largest)
            rows.map(r => Claim(r._1, r._2, r._4, owned = false))
          else {
            // first claim: buffer once, owner = min (doc_id, para_idx)
            // — an O(n) min, deterministic whatever the source order
            val rs = rows.toSeq
            val f = rs.minBy(r => (r._1, r._2))
            state.update(BlockOwner(f._1, f._2))
            rs.iterator.map(r =>
              Claim(r._1, r._2, r._4, owned = r._1 == f._1 && r._2 == f._2))
          }
      }
  }

  /** Doc-grain rollup of claim rows (the `foreachBatch` sink side):
    * the same (n_paras, n_dup_paras, dup_permille) screen as the #141
    * batch profile, over whatever claim slice the caller accumulated. */
  def profile(claims: DataFrame): DataFrame =
    claims.groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("owned"), 0L).otherwise(1L)).as("n_dup_paras"))
      .withColumn("dup_permille",
        call_function("div", col("n_dup_paras") * 1000L, col("n_paras")))
      .orderBy("doc_id")
}
