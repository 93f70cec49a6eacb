package graft.streaming

import java.sql.Timestamp

import graft.{QueriesText, SparkSpec}

/** Streaming selection twin (#145): the per-score ledger is the
  * exactly-streamable sufficient statistic (bounded at ≤101 cells),
  * the threshold is monotone as mass accumulates, and finalizing a
  * replayed stream equals the batch token-budget selection exactly. */
class SelectionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    SelectionStream.Doc(id, text, Timestamp.valueOf("2026-01-01 10:00:00"))

  private val filler = "the and for with from this that have была город works " +
    "every morning a calm river keeps its old bridge white stone town"

  // the TokenBudgetSpec corpus: spread of quality scores + a null text
  private val corpus = Seq(
    doc(1L, s"$filler $filler $filler"),
    doc(2L, s"$filler short"),
    doc(3L, "tiny doc"),
    doc(4L, s"$filler $filler different tail here now"),
    doc(5L, s"$filler $filler different tail here now"),
    doc(6L, null),
    doc(7L, s"$filler $filler $filler $filler"),
    doc(8L, "x y z w v u t s r q p o n m l k j i h g f e d c b a"))

  private def runLedger(batches: Seq[Seq[SelectionStream.Doc]], name: String) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[SelectionStream.Doc]
    val q = SelectionStream.ledger(in.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Seq[SelectionStream.ScoreCell]]
    try {
      batches.foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
        snapshots += SelectionStream.latest(spark.table(name))
      }
    } finally q.stop()
    snapshots.toSeq
  }

  test("multi-batch ledger accumulates the exact per-score mass; threshold is monotone") {
    val batches = corpus.grouped(3).toSeq
    val snaps = runLedger(batches, "sel_ledger")
    // final cells == the batch score-grain aggregate over the corpus
    val batch = QueriesText.scoredTokens(
      corpus.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .groupBy("quality_score").sum("n_words").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = snaps.last.map(c => c.quality_score -> c.token_mass).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.size <= 101, "scores live on the 0..100 grid")
    // fixed budget: the boundary score can only RISE as mass arrives
    val budget = 60L
    val cuts = snaps.map(s => SelectionStream.threshold(s, budget))
    assert(cuts.forall(_.isDefined), "a 60-token budget must always cut this corpus")
    val bounds = cuts.map(_.get._1)
    assert(bounds.zip(bounds.tail).forall { case (a, b) => b >= a },
      s"boundary must be monotone non-decreasing, got $bounds")
  }

  test("finalizing a replayed stream equals the #145 batch selection exactly") {
    val snaps = runLedger(Seq(corpus), "sel_replay")
    val cells = snaps.last
    val docsDf = corpus.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    // the #145 self-budget: half the corpus's token mass
    val budget = cells.map(_.token_mass).sum / 2
    val streamed = SelectionStream.verdicts(docsDf, cells, budget)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val batch = QueriesText.tokenBudgetOn(docsDf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(streamed == batch, s"stream verdicts $streamed != batch $batch")
    // the cut is real on this corpus
    assert(streamed.values.exists(identity) && streamed.values.exists(!_))
  }

  test("bounded emission: a batch of same-score docs emits ONE cell row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[SelectionStream.Doc]
    val q = SelectionStream.ledger(in.toDF())
      .writeStream.format("memory").queryName("sel_bounded").outputMode("append").start()
    try {
      // 50 identical docs = one score stratum
      in.addData((100L to 149L).map(i => doc(i, filler)): _*)
      q.processAllAvailable()
      val rows = spark.table("sel_bounded").collect()
      assert(rows.length == 1, s"one touched score must emit one cell, got ${rows.length}")
      assert(rows.head.getLong(2) == 50L, "the cell carries all 50 docs")
    } finally q.stop()
  }
}
