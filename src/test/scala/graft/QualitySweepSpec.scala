package graft

/** Quality-threshold survival curve (#146): replayed independently
  * from the #145 ledger's per-doc (score, n_words) columns, plus the
  * structural facts the replay alone wouldn't pin — the fixed 21-row
  * grid, monotone survival, and the zero tail above the max score. */
class QualitySweepSpec extends SparkSpec {
  import spark.implicits._

  private val filler = "the and for with from this that have works " +
    "every morning a calm river keeps its old bridge white stone town"

  private val corpus = Seq(
    1L -> s"$filler $filler $filler",
    2L -> s"$filler tail",
    3L -> "tiny doc",
    4L -> null.asInstanceOf[String],
    5L -> s"$filler $filler $filler $filler $filler")

  private def docsDf = corpus.toDF("doc_id", "text")

  private def sweep() =
    QueriesText.qualitySweepOn(docsDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def ledger() =
    QueriesText.tokenBudgetOn(docsDf)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (score, n_words)

  test("every grid row replays the per-doc scores") {
    val docs = ledger()
    val (td, tt) = (docs.length.toLong, docs.map(_._2).sum)
    val expected = (0L to 100L by 5L).map { t =>
      val kept = docs.filter(_._1 >= t)
      val (dk, tk) = (kept.length.toLong, kept.map(_._2).sum)
      (t, dk, tk, dk * 1000 / math.max(td, 1), tk * 1000 / math.max(tt, 1))
    }
    assert(sweep().toSeq == expected)
  }

  test("grid is 21 rows; t=0 keeps the whole (non-null) corpus at permille 1000") {
    val rows = sweep()
    assert(rows.length == 21)
    assert(rows.head == ((0L, 4L, rows.head._3, 1000L, 1000L)))
  }

  test("survival is monotone non-increasing in the threshold") {
    val rows = sweep()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"non-monotone at t=${b._1}")
    }
  }

  test("thresholds above the max score survive nothing, but keep their grid rows") {
    val maxScore = ledger().map(_._1).max
    val dead = sweep().filter(_._1 > maxScore)
    assert(dead.nonEmpty && dead.forall(r => r._2 == 0L && r._3 == 0L))
  }
}
