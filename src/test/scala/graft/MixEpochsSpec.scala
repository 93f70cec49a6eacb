package graft

/** Epoch-capped upsampling allocation (#150): brute-force level
  * replay on the 4×-scaled caps, plus the regime facts — budget 2×
  * the corpus means every cell gets at least its own mass (≥1000
  * permille), the 4-epoch ceiling binds the smallest cells, and the
  * ledger conserves the budget up to the floor remainder. */
class MixEpochsSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  private def run(rows: Seq[(Long, String, String, String)]) =
    QueriesText.mixEpochsOn(rows.toDF("doc_id", "lang", "source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("hand corpus: small cell pinned at 4 epochs, big cell takes the level") {
    // caps 5 and 95 → cap4 = 20, 380; B = 2·100 = 200
    // used(20) = 20 + 380@20 → 20 + 20 = 40 ≤ 200; level = 20 + (200-40)/1 = 180
    // alloc: small min(20,180)=20 (4000 permille), big min(380,180)=180
    val out = run(Seq(
      (1L, "en", "a", words(5)),
      (2L, "en", "b", words(95))))
    assert(out(("en", "a")) == ((5L, 20L, 4000L, 180L)))
    assert(out(("en", "b")) == ((95L, 180L, 1894L, 180L)))
    assert(out.values.map(_._2).sum == 200L, "budget 2x corpus fully spent here")
  }

  test("closed-form level == brute force on scaled caps; every cell gets >= 1 epoch") {
    val rows = Seq(
      (1L, "en", "a", words(17)), (2L, "en", "b", words(3)),
      (3L, "de", "a", words(29)), (4L, "fr", "c", words(51)))
    val out = run(rows)
    val caps = out.map { case (k, v) => k -> v._1 }
    val b = caps.values.sum * 2
    def used(l: Long) = caps.values.map(c => math.min(4 * c, l)).sum
    val l = (0L to caps.values.max * 4).reverse.find(used(_) <= b).get
    assert(out.values.map(_._4).toSet == Set(l))
    out.foreach { case (k, (cap, alloc, permille, _)) =>
      assert(alloc == math.min(4 * cap, l))
      // >= 1 epoch holds on THIS cap spread (it is not a law of the
      // regime: a flat distribution can dilute below one epoch)
      assert(permille >= 1000L, s"$k under one epoch on this corpus")
      assert(permille <= 4000L, s"$k beyond the 4-epoch ceiling")
    }
  }
}
