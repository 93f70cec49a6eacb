package graft

/** Water-filling mixture allocation (#147): the level is replayed by
  * brute force (scan every integer level, keep the last feasible) —
  * the closed form must agree exactly, including at cap ties and in
  * the below-the-smallest-cap regime the sorted-prefix anchor never
  * sees. */
class MixAllocateSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  private def run(rows: Seq[(Long, String, String, String)]) =
    QueriesText.mixAllocateOn(rows.toDF("doc_id", "lang", "source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  private def bruteForce(caps: Map[(String, String), Long]) = {
    val b = caps.values.sum / 2
    def used(l: Long) = caps.values.map(math.min(_, l)).sum
    (0L to caps.values.max).reverse.find(used(_) <= b).get
  }

  test("hand corpus: small cells whole, big cells at the level, budget exhausted") {
    // caps (en,a)=40 (en,b)=10 (de,a)=6 (fr,c)=100 → B=78, L=31:
    // used(31) = 6+10+31+31 = 78, used(32) = 80 > 78
    val out = run(Seq(
      (1L, "en", "a", words(25)), (2L, "en", "a", words(15)),
      (3L, "en", "b", words(10)), (4L, "de", "a", words(6)),
      (5L, "fr", "c", words(100)), (6L, "fr", "c", null.asInstanceOf[String])))
    assert(out(("de", "a")) == ((6L, 6L, 1000L, 31L)))
    assert(out(("en", "b")) == ((10L, 10L, 1000L, 31L)))
    assert(out(("en", "a")) == ((40L, 31L, 775L, 31L)))
    assert(out(("fr", "c")) == ((100L, 31L, 310L, 31L)))
    assert(out.values.map(_._2).sum == 78L, "this corpus's budget divides exactly")
  }

  test("closed-form level == brute-force level, cap ties included") {
    val rows = Seq(
      (1L, "en", "a", words(17)), (2L, "en", "b", words(17)),
      (3L, "de", "a", words(3)), (4L, "fr", "a", words(29)),
      (5L, "es", "b", words(29)), (6L, "en", "c", words(1)))
    val out = run(rows)
    val caps = out.map { case (k, v) => k -> v._1 }
    val l = bruteForce(caps)
    assert(out.values.map(_._4).toSet == Set(l))
    caps.foreach { case (k, cap) => assert(out(k)._2 == math.min(cap, l)) }
  }

  test("budget below the smallest cap: every cell gets B div n") {
    // caps 10,10,10,10 → B=20 < 4·10 → no feasible anchor row, L=5
    val out = run(Seq(
      (1L, "en", "a", words(10)), (2L, "en", "b", words(10)),
      (3L, "de", "a", words(10)), (4L, "de", "b", words(10))))
    assert(out.values.forall(_ == ((10L, 5L, 500L, 5L))))
  }

  test("allocation is maximal: one more level unit would break the budget") {
    val rows = Seq(
      (1L, "en", "a", words(13)), (2L, "en", "b", words(40)),
      (3L, "de", "a", words(7)), (4L, "fr", "c", words(64)))
    val out = run(rows)
    val caps = out.map { case (k, v) => k -> v._1 }
    val b = caps.values.sum / 2
    val l = out.values.head._4
    assert(caps.values.map(math.min(_, l)).sum <= b)
    assert(caps.values.map(math.min(_, l + 1)).sum > b)
  }
}
