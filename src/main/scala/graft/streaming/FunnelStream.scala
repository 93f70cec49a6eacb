package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.QueriesText

/** Streaming corpus admission funnel: the streaming twin of the batch
  * #144 funnel's gate chain for a corpus that arrives as a stream.
  *
  * Arriving docs pass the SAME stateless gate projection the batch
  * funnel uses ([[QueriesText.funnelFlags]]: ingest → lang-id
  * confirmation → quality — one derivation, bit-identical decisions),
  * then quality SURVIVORS claim their normalized-text hash in a
  * `flatMapGroupsWithState` ownership index: the first arrival owns
  * the hash forever (cross-batch exact dedup), later claims emit as
  * rejected duplicates. Docs that fail an earlier gate bypass the
  * state operator entirely (a stateless union branch) — they carry
  * their failure flags but never touch the index, which is exactly
  * the batch survivors-of-survivors contract (keepers are chosen
  * among quality survivors only).
  *
  * Stage 4 (paragraph strip) composes downstream: feed the admitted
  * sub-stream (`r3`) through [[ParagraphStream.claims]] — its block
  * ownership index is the streaming form of the batch block-firsts
  * aggregate — and roll both outputs up with [[profile]], which
  * reports through the SAME [[QueriesText.funnelSummary]] formulation
  * as the batch query. Replaying a corpus as ONE batch in doc_id
  * order reproduces the batch funnel bit-for-bit (spec-pinned).
  *
  * Scale shape: state is one owner id per DISTINCT normalized text —
  * the dedup index itself, sharded by hash exactly as the batch
  * keeper aggregate's exchange distributes; a viral duplicate is ONE
  * state row however often it arrives. Gate flags never shuffle (the
  * projection is map-side); only quality survivors enter the
  * hash-keyed exchange. No timeout: corpus membership does not
  * expire.
  */
object FunnelStream {
  final case class Doc(doc_id: Long, lang: String, text: String, ts: Timestamp)
  /** One row per arriving doc: the gate flags it reached, `n_words`
    * for token-mass accounting, and `r3` = owns its text hash. */
  final case class Admission(doc_id: Long, n_words: Long,
    r0: Boolean, r1: Boolean, r2: Boolean, r3: Boolean)
  final case class HashOwner(doc_id: Long)

  /** Cross-batch admission decisions from a stream of docs. */
  def admissions(docs: DataFrame): Dataset[Admission] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gated = QueriesText.funnelFlags(
      docs.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), coalesce(col("n_words"), lit(0L)).as("n_words"),
        col("r0"), col("r1"), col("r2"),
        coalesce(md5(lower(trim(col("text")))), lit("")).as("__th"))
      .as[(Long, Long, Boolean, Boolean, Boolean, String)]
    // gate failures bypass the index — stateless branch
    val fails = gated.filter(!_._5)
      .map(g => Admission(g._1, g._2, g._3, g._4, g._5, r3 = false))
    val survivors = gated.filter(_._5)
      .groupByKey(_._6)
      .flatMapGroupsWithState[HashOwner, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[HashOwner]) =>
          if (state.exists)
            // every row is a duplicate whatever its batch order — map
            // the iterator straight through, no buffer, no sort (a
            // viral duplicate text must not pay a per-micro-batch sort)
            rows.map(g => Admission(g._1, g._2, g._3, g._4, g._5, r3 = false))
          else {
            // first claim: buffer once, owner = min doc_id (an O(n)
            // min keeps the decision deterministic whatever the source
            // order without sorting the group)
            val rs = rows.toSeq
            val first = rs.iterator.map(_._1).min
            state.update(HashOwner(first))
            rs.iterator.map(g =>
              Admission(g._1, g._2, g._3, g._4, g._5, r3 = g._1 == first))
          }
      }
    fails.union(survivors)
  }

  /** Batch-side rollup of accumulated admission + paragraph-claim
    * rows into the 5-row funnel — the same summary the batch #144
    * query emits (claims come from [[ParagraphStream.claims]] over
    * the admitted sub-stream; pass an empty claims frame if stage 4
    * was not run and read stages 0–3 only). */
  def profile(admissions: DataFrame, claims: DataFrame): DataFrame = {
    val kept = claims.where(col("owned"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"), sum(col("ntok")).as("__kept_tokens"))
    QueriesText.funnelSummary(admissions.join(kept, Seq("doc_id"), "left"))
  }
}
