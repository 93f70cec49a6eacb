package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[QueriesText.ngramNoveltyOn]] equals an in-memory
  * first-occurrence reference on arbitrary corpora — distinct grams
  * per doc, ownership by min doc_id, floor-division permille, docs
  * under n tokens excluded. Small alphabets make gram sharing dense,
  * so ownership ties and zero-novelty docs are exercised heavily. */
class NoveltyPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(3, 12)
    docs <- Gen.listOfN(nDocs,
      Gen.chooseNum(0, 22).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(0, 6).map(i => s"w$i")).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def ref(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    def grams(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < 3) Set.empty else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val g = corpus.map { case (id, t) => id -> grams(t) }
    val owner = g.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (gram, xs) => gram -> xs.map(_._2).min }
    g.collect { case (id, gs) if gs.nonEmpty =>
      val novel = gs.count(owner(_) == id).toLong
      (id, gs.size.toLong, novel, novel * 1000L / gs.size)
    }.sortBy(_._1)
  }

  test("ngram novelty equals the in-memory first-occurrence reference") {
    samples(corpusGen, 15, 99L).foreach { corpus =>
      val got = QueriesText.ngramNoveltyOn(corpus.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == ref(corpus), s"corpus: $corpus")
    }
  }

  test("source rollup equals the per-doc reference aggregated by feed") {
    val withSources = for {
      corpus <- corpusGen
      srcs <- Gen.listOfN(corpus.size, Gen.oneOf("feedA", "feedB", "feedC"))
    } yield corpus.zip(srcs).map { case ((id, t), s) => (id, t, s) }
    samples(withSources, 12, 7L).foreach { corpus =>
      val perDoc = ref(corpus.map { case (id, t, _) => (id, t) })
      val srcOf = corpus.map { case (id, _, s) => id -> s }.toMap
      val expected = perDoc.groupBy { case (id, _, _, _) => srcOf(id) }
        .map { case (s, rows) =>
          val grams = rows.map(_._2).sum
          val novel = rows.map(_._3).sum
          (s, rows.size.toLong, grams, novel, novel * 1000L / grams)
        }.toSeq.sortBy(_._1)
      val got = QueriesText.noveltyBySourceOn(corpus.toDF("doc_id", "text", "source"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"corpus: $corpus")
    }
  }
}
