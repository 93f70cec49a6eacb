package graft

/** Token-budget corpus selection (#145): the admission LEDGER logic
  * (ordering, exclusive running mass, greedy cut) is replayed
  * independently in plain Scala from the query's own per-doc
  * (score, n_words) columns — the scoring rules themselves are pinned
  * by the #30 oracle, so the spec focuses on what the oracle's window
  * formulation alone can't localize: tie-breaks, the straddling doc,
  * and null-text exclusion. */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private val filler = "the and for with from this that have была город works " +
    "every morning a calm river keeps its old bridge white stone town"

  private def corpus: Seq[(Long, String)] = Seq(
    1L -> s"$filler $filler $filler",
    2L -> s"$filler short",
    3L -> "tiny doc",
    4L -> s"$filler $filler different tail here now",
    5L -> s"$filler $filler different tail here now", // identical to 4: equal score, id tie-break
    6L -> null.asInstanceOf[String],
    7L -> s"$filler $filler $filler $filler",
    8L -> "x y z w v u t s r q p o n m l k j i h g f e d c b a")

  private def run() =
    QueriesText.tokenBudgetOn(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))

  test("ledger replays the greedy admission exactly (order, cum_before, cut)") {
    val rows = run()
    val budget = rows.map(_._3).sum / 2
    // independent replay: quality DESC, doc_id ASC, exclusive prefix
    val queue = rows.sortBy(r => (-r._2, r._1))
    var cum = 0L
    val expected = queue.map { r =>
      val e = (r._1, r._2, r._3, cum, cum < budget)
      cum += r._3
      e
    }.sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq == expected.toSeq)
    // the cut is real: at least one admit and one reject
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

  test("the straddling doc is admitted (take UNTIL the budget is reached)") {
    val rows = run()
    val budget = rows.map(_._3).sum / 2
    val straddler = rows.filter(r => r._4 < budget && r._4 + r._3 > budget)
    assert(straddler.nonEmpty, "hand corpus must produce a straddling doc")
    assert(straddler.forall(_._5))
  }

  test("equal-score tie breaks by doc_id: identical twin docs split at a half-mass budget") {
    val twin = Seq(10L -> filler, 20L -> filler)
    val rows = QueriesText.tokenBudgetOn(twin.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    // budget = half the twins' total = one doc exactly: the lower id
    // has 0 tokens ahead (admitted), the higher sits AT the budget
    assert(rows == Map(10L -> true, 20L -> false))
  }

  test("null-text docs never enter the ledger") {
    assert(!run().exists(_._1 == 6L))
  }

  test("doc_id outside [0, 2^56) fails LOUDLY instead of scrambling the admission order") {
    // verdict r12 #2: (100−score)·2⁵⁶ + doc_id silently overflows for
    // 64-bit hash ids — the norm in a 100 TB corpus — and because the
    // oracle replays the same arithmetic the corruption would stay
    // hash-green. The key build now enforces the precondition per row.
    for (badId <- Seq(1L << 56, Long.MaxValue, -1L)) {
      val docs = Seq(1L -> filler, badId -> filler).toDF("doc_id", "text")
      val e = intercept[Exception] {
        QueriesText.tokenBudgetOn(docs).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("admission-order key")),
        s"id $badId must name the broken key, got: ${e.getMessage}")
    }
    // boundary: 2^56 − 1 is still exact and admitted into the ledger
    val edge = Seq(0L -> filler, ((1L << 56) - 1) -> filler).toDF("doc_id", "text")
    val rows = QueriesText.tokenBudgetOn(edge).collect()
    assert(rows.length == 2)
  }
}
