package graft

/** Mixture materialization (#151): the emitted corpus must satisfy the
  * allocation EXACTLY — per-cell mass ≤ the epoch-capped water-fill
  * allocation (≤ 4·cap), totals ≤ the 2×-corpus budget, shortfall per
  * cell smaller than its first non-admitted doc — and reconcile with
  * the #150 ledger it materializes. The corpus is handcrafted SKEWED
  * (one giant cell, several small ones) so the level genuinely caps
  * the giant while small cells earn their full 4 epochs.
  */
class MixMaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  // skewed corpus: cell (en, big) holds ~90% of the token mass
  private def corpus: Seq[(Long, String, String, String)] =
    Seq(
      (1L, "en", "big", words(400)),
      (2L, "en", "big", words(350)),
      (3L, "en", "big", words(250)),
      (4L, "en", "small1", words(30)),
      (5L, "en", "small1", words(20)),
      (6L, "de", "small2", words(25)),
      (7L, "fr", "small3", words(15)),
      (8L, "fr", "small3", null.asInstanceOf[String]))

  private def run() =
    QueriesText.mixMaterializeOn(corpus.toDF("doc_id", "lang", "source", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))

  private def caps: Map[(String, String), Long] =
    corpus.filter(_._4 != null)
      .groupBy(d => (d._2, d._3))
      .map { case (k, ds) => k -> ds.map(_._4.split(" ").length.toLong).sum }

  private def ledger: Map[(String, String), Long] =
    QueriesText.mixEpochsOn(corpus.toDF("doc_id", "lang", "source", "text"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap

  test("per-cell emitted mass <= allocation <= 4 epochs; total <= the 2x budget") {
    val rows = run()
    val alloc = ledger
    val cp = caps
    val emitted = rows.groupBy(r => (r._2, r._3)).map { case (k, rs) => k -> rs.map(_._4).sum }
    emitted.foreach { case (cell, mass) =>
      assert(mass <= alloc(cell), s"cell $cell: emitted $mass > allocated ${alloc(cell)}")
      assert(alloc(cell) <= 4L * cp(cell), s"cell $cell: allocation beyond the 4-epoch cap")
    }
    val budget = 2L * cp.values.sum
    assert(emitted.values.sum <= budget, "total emitted mass exceeds the 2x-corpus budget")
    // the skew is real: the giant cell is level-capped below 4 epochs
    assert(alloc(("en", "big")) < 4L * cp(("en", "big")), "giant cell must be capped")
  }

  test("allocation hit within one doc: per-cell shortfall < the first non-admitted doc") {
    val rows = run()
    val alloc = ledger
    val cp = caps
    rows.groupBy(r => (r._2, r._3)).foreach { case (cell, rs) =>
      val mass = rs.map(_._4).sum
      val whole = alloc(cell) / cp(cell)
      val rem = alloc(cell) % cp(cell)
      // the rule keys on the EXCLUSIVE prefix over ALL earlier docs
      // (doc_id order), so admission is a contiguous prefix: every doc
      // before the first failure is in, everything after is out
      val docs = corpus.filter(d => d._4 != null && (d._2, d._3) == cell).sortBy(_._1)
        .map(d => (d._1, d._4.split(" ").length.toLong))
      var ahead = 0L
      var admitted = 0L
      var firstRejected = 0L
      docs.foreach { case (_, n) =>
        if (ahead + n <= rem) admitted += n
        else if (firstRejected == 0L) firstRejected = n
        ahead += n
      }
      val shortfall = alloc(cell) - mass
      assert(mass == whole * cp(cell) + admitted, s"cell $cell: emitted mass off the replay")
      if (firstRejected > 0)
        assert(shortfall < firstRejected,
          s"cell $cell: shortfall $shortfall >= first rejected doc $firstRejected")
      else assert(shortfall == 0L, s"cell $cell: nothing rejected yet shortfall $shortfall")
    }
    // the skewed corpus must actually exercise the fractional path
    assert(rows.groupBy(r => (r._2, r._3)).keySet.contains(("en", "big")))
  }

  test("copy structure: whole epochs for every doc, remainder prefix earns one extra") {
    val rows = run()
    val alloc = ledger
    val cp = caps
    val byDoc = rows.groupBy(_._1).map { case (id, rs) =>
      id -> rs.map(_._5).sorted.toSeq
    }
    corpus.filter(_._4 != null).foreach { case (id, lang, source, text) =>
      val cell = (lang, source)
      val n = text.split(" ").length.toLong
      val whole = alloc(cell) / cp(cell)
      val rem = alloc(cell) % cp(cell)
      // cum_before = exclusive prefix over ALL earlier docs in the cell
      val ahead = corpus.filter(d => d._4 != null && (d._2, d._3) == cell && d._1 < id)
        .map(_._4.split(" ").length.toLong).sum
      val copies = whole + (if (ahead + n <= rem) 1L else 0L)
      val got = byDoc.getOrElse(id, Seq.empty)
      assert(got == (1L to copies), s"doc $id: copies $got != 1..$copies")
    }
    // null-text docs never materialize
    assert(!rows.exists(_._1 == 8L))
    // the capped cell's straddler is genuinely rejected from the extra copy
    assert(byDoc(3L).size.toLong == ledger(("en", "big")) / caps(("en", "big")),
      "doc 3 (the straddler) must earn only the whole-epoch copies")
  }

  test("uncapped small cells emit exactly 4 copies of every doc when the level allows") {
    val rows = run()
    val alloc = ledger
    val cp = caps
    // any cell whose allocation equals its 4-epoch cap must emit
    // every doc exactly 4 times (whole=4, rem=0)
    val full = alloc.filter { case (cell, a) => a == 4L * cp(cell) }.keySet
    if (full.nonEmpty) full.foreach { cell =>
      val rs = rows.filter(r => (r._2, r._3) == cell)
      rs.groupBy(_._1).foreach { case (id, copies) =>
        assert(copies.map(_._5).sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"doc $id in full cell $cell")
      }
    } else fail("handcrafted corpus must contain at least one uncapped cell")
  }
}
