package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.QueriesText

/** Streaming twin of the #145 token-budget selection — with its
  * contract stated honestly, because EXACT streaming admission is
  * impossible: the batch rule admits docs in global quality order
  * (score DESC, doc_id ASC) under a budget, so a later high-quality
  * arrival retroactively evicts an earlier borderline admit — no
  * append-mode operator can emit a final per-doc verdict mid-stream.
  *
  * What IS exactly streamable is the sufficient statistic: the
  * admission cut depends on per-score token mass alone (plus the
  * boundary score's own docs). Scores live on the fixed 0..100 grid
  * (the #145 ordering's leading key), so the state is AT MOST 101
  * (mass, docs) cells — bounded regardless of corpus size, sharded by
  * score exactly as the batch score-grain aggregate's exchange.
  *
  * The twin therefore splits sketch/refine:
  *   - [[ledger]] (streaming, exact): accumulates the per-score cells
  *     across batches and emits the updated cell per touched score per
  *     micro-batch — O(distinct scores) rows per batch, never O(docs);
  *     scoring rides [[QueriesText.scoredTokens]], the SAME derivation
  *     the batch query uses (bit-identical scores by construction).
  *   - [[threshold]] (pure, exact): from the ≤101 latest cells and a
  *     budget, the closed-form cut — every doc with score above the
  *     boundary is admitted, every doc below rejected, and the
  *     remaining in-boundary budget R is returned for the refine step.
  *     As mass only accumulates, the boundary is MONOTONE: it only
  *     rises as the stream progresses (spec-pinned), which is the
  *     formal face of "verdicts can flip from admit to reject, never
  *     the other way".
  *   - [[verdicts]] (batch refine, exact): per-doc verdicts against a
  *     ledger snapshot — only the boundary score's docs are re-read
  *     (one bounded prefix scan); all other verdicts come straight
  *     from the threshold comparison. Replaying a finished stream's
  *     ledger through this equals the #145 batch output exactly
  *     (spec-pinned against [[QueriesText.tokenBudgetOn]]).
  *
  * At 100 TB: the stream ships 8-byte (score, mass) updates, the
  * driver-side threshold math touches 101 rows, and the refine pass
  * scans one score stratum — the same two-level decomposition the
  * batch query's bucket scan already uses.
  */
object SelectionStream {
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  /** Running per-score cell: cumulative token mass and doc count of
    * every doc seen so far at this quality score. */
  final case class ScoreCell(quality_score: Long, token_mass: Long, n_docs: Long)
  /** Internal running state per score cell (public: the state
    * encoder's generated code needs the constructor). */
  final case class CellState(mass: Long, docs: Long)

  /** Cross-batch per-score ledger from a stream of docs. Emits the
    * UPDATED cell for each score touched in the micro-batch; the
    * latest cell per score (mass is monotone — take the max) is the
    * sufficient statistic for the admission cut. */
  def ledger(docs: DataFrame): Dataset[ScoreCell] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = QueriesText.scoredTokens(docs.select(col("doc_id"), col("text")))
      .select(col("quality_score").cast("long"), col("n_words"))
      .as[(Long, Long)]
    sc.groupByKey(_._1)
      .flatMapGroupsWithState[CellState, ScoreCell](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (score, rows, state: GroupState[CellState]) =>
          var m = 0L
          var d = 0L
          rows.foreach { r => m += r._2; d += 1 }
          val prev = state.getOption.getOrElse(CellState(0L, 0L))
          val next = CellState(prev.mass + m, prev.docs + d)
          state.update(next)
          Iterator.single(ScoreCell(score, next.mass, next.docs))
      }
  }

  /** Latest cell per score from an accumulated ledger table (mass is
    * monotone per score, so max = latest). */
  def latest(ledgerRows: DataFrame): Seq[ScoreCell] =
    ledgerRows.groupBy("quality_score")
      .agg(max(col("token_mass")).as("m"), max(col("n_docs")).as("d"))
      .collect()
      .map(r => ScoreCell(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  /** The exact admission cut from the bounded ledger.
    *
    * Returns None when the whole seen corpus fits the budget (every
    * doc admitted, no boundary). Otherwise Some((s*, R)): docs with
    * score > s* are admitted, docs with score < s* rejected, and the
    * boundary stratum s* admits its docs (doc_id ASC) while their
    * stratum-local exclusive token mass stays under R — exactly the
    * batch rule restated, because the global exclusive prefix of a
    * boundary doc = mass(score > s*) + its stratum-local prefix. */
  def threshold(cells: Seq[ScoreCell], budget: Long): Option[(Long, Long)] = {
    var above = 0L
    for (c <- cells.sortBy(-_.quality_score)) {
      // the batch rule admits while the EXCLUSIVE prefix < budget: if
      // the mass above this score already reaches the budget, the cut
      // fell strictly above — but the straddling doc of the stratum
      // that crossed is still admitted, which is why the boundary is
      // the FIRST stratum whose cumulative mass reaches the budget
      if (above + c.token_mass >= budget)
        return Some((c.quality_score, budget - above))
      above += c.token_mass
    }
    None
  }

  /** Batch-side refine against a ledger snapshot: exact per-doc
    * verdicts, re-reading only the boundary stratum (one bounded
    * prefix scan via the same two-level bucket machinery as #145). */
  def verdicts(docs: DataFrame, cells: Seq[ScoreCell], budget: Long): DataFrame = {
    val sc = QueriesText.scoredTokens(docs.select(col("doc_id"), col("text")))
    threshold(cells, budget) match {
      case None =>
        sc.select(col("doc_id"), col("quality_score"), col("n_words"))
          .withColumn("admitted", lit(true))
      case Some((s, r)) =>
        val boundary = graft.operators.ScanOps.exclusivePrefixSum(
          sc.where(col("quality_score") === s), Seq.empty, Seq("doc_id"),
          col("n_words"), "__cum")
          .select(col("doc_id"), (col("__cum") < r).as("__adm"))
        sc.select(col("doc_id"), col("quality_score"), col("n_words"))
          .join(boundary, Seq("doc_id"), "left")
          .withColumn("admitted",
            when(col("quality_score") > s, lit(true))
              .when(col("quality_score") < s, lit(false))
              .otherwise(coalesce(col("__adm"), lit(false))))
          .drop("__adm")
    }
  }
}
