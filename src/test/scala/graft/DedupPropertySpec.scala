package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the distributed exact-Jaccard decision
  * ([[graft.text.DedupOps.verifyPairsExact]]) equals an in-memory
  * reference on arbitrary corpora — same pair set, same half-up
  * integer percentages, docs under n tokens excluded. High-overlap
  * alphabets make the threshold boundary dense, so off-by-one
  * rounding or set/multiset confusion would surface here. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // small alphabet → heavy gram overlap → pairs near the threshold
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(4, 12)
    docs <- Gen.listOfN(nDocs,
      Gen.chooseNum(0, 25).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(0, 7).map(i => s"w$i")).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def refJaccard(
      corpus: Seq[(Long, String)], n: Int, minPct: Int
  ): Set[(Long, Long, Long)] = {
    def grams(t: String): Set[Seq[String]] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < n) Set.empty else toks.sliding(n).map(_.toSeq).toSet
    }
    val g = corpus.map { case (id, t) => id -> grams(t) }.toMap
    (for {
      Seq((a, _), (b, _)) <- corpus.combinations(2).map(_.sortBy(_._1)).toSeq
      ga = g(a); gb = g(b)
      if ga.nonEmpty && gb.nonEmpty
      s = (ga intersect gb).size.toLong
      u = ga.size + gb.size - s
      if s > 0 && u > 0 && s * 100 >= u * minPct
    } yield (a, b, (s * 200L + u) / (u * 2L))).toSet
  }

  test("verifyPairsExact equals the in-memory reference on arbitrary corpora") {
    for ((corpus, i) <- samples(corpusGen, 15, 0xBEEF).zipWithIndex) {
      val minPct = 20 + (i % 3) * 15 // 20, 35, 50
      val docs = corpus.toDF("doc_id", "text").repartition(1 + i % 4)
      val ids = corpus.map(_._1)
      val allPairs = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toDF("doc1", "doc2")
      val got = graft.text.DedupOps
        .verifyPairsExact(allPairs, docs, "doc_id", col("text"), n = 3, minJaccardPct = minPct)
        .as[(Long, Long, Long)].collect().toSet
      val want = refJaccard(corpus, 3, minPct)
      assert(got == want, s"corpus $i (minPct=$minPct): got ${got.toSeq.sorted}, want ${want.toSeq.sorted}")
    }
  }
}
