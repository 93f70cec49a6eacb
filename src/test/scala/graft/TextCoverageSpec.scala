package graft

import org.apache.spark.sql.functions._
import graft.text.DedupOps

/** Unit coverage for the round-7 corpus-analysis operators:
  * containment pairs, boilerplate span accounting, Zipf vocabulary
  * coverage, and semantic group resolution — each on hand-checkable
  * inputs (the registry queries verify them against DuckDB on the
  * real testdata). */
class TextCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("containment catches doc-contains-doc that Jaccard misses") {
    // doc 2 = doc 1 embedded in 10× padding: containment 100, but
    // Jaccard ~ |A|/|B| stays far under any dedup threshold
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 40).map(i => s"pad$i word$i filler$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, "unrelated text entirely different")).toDF("doc_id", "text")

    val contain = DedupOps.ngramContainmentPairs(
      docs, "doc_id", $"text", n = 3, maxDf = 100, minContainPct = 80)
      .select($"doc1", $"doc2", $"containment_pct").as[(Long, Long, Long)].collect().toSet
    assert(contain == Set((1L, 2L, 100L)), contain)

    val jacc = DedupOps.ngramJaccardPairs(
      docs, "doc_id", $"text", n = 3, maxDf = 100, minJaccardPct = 20)
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
    assert(jacc.isEmpty, s"Jaccard at 20% must miss the asymmetric pair: ${jacc.toSeq}")
  }

  test("containment never drops below Jaccard on the same pair") {
    // containment divides by min(|A|,|B|) <= union, so for any pair
    // containment_pct >= jaccard_pct; verified on overlapping docs
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f x y"),
      (3L, "a b c d q r s t")).toDF("doc_id", "text")
    val c = DedupOps.ngramContainmentPairs(docs, "doc_id", $"text", 3, 100, 1)
      .select($"doc1", $"doc2", $"containment_pct").as[(Long, Long, Long)].collect()
      .map { case (d1, d2, p) => (d1, d2) -> p }.toMap
    val j = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, 100, 1)
      .select($"doc1", $"doc2", $"jaccard_pct").as[(Long, Long, Long)].collect()
      .map { case (d1, d2, p) => (d1, d2) -> p }.toMap
    assert(j.nonEmpty)
    j.foreach { case (pair, jp) =>
      assert(c.getOrElse(pair, Long.MaxValue) >= jp, s"$pair: containment < jaccard")
    }
  }

  test("boilerplate accounting: known repeated header across the corpus") {
    // "breaking news today" leads 6 of 8 docs -> df 6 >= max(5, 1) ->
    // boilerplate; the unique tails are not
    val header = "breaking news today colon"
    val docs = (1L to 6L).map(i => (i, s"$header story$i about$i topic$i thing$i"))
      .toDF("doc_id", "text")
      .unionByName(Seq((7L, "completely unique document seven"),
        (8L, "another unique document eight entirely")).toDF("doc_id", "text"))
    val out = QueriesText.boilerplateOn(docs)
      .select($"doc_id", $"n_positions", $"n_boiler", $"boiler_permille")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 8 tokens per header doc -> 6 gram positions; the 2 grams fully
    // inside the header ("breaking news today", "news today colon")
    // have df 6; every gram touching the unique tail has df 1
    (1L to 6L).foreach { i =>
      val (_, n, b, pm) = out(i)
      assert(n == 6 && b == 2, s"doc $i: ($n, $b)")
      assert(pm == 333, s"doc $i permille $pm") // 2/6 half-up
    }
    Seq(7L, 8L).foreach { i =>
      val (_, _, b, pm) = out(i)
      assert(b == 0 && pm == 0, s"doc $i must have no boilerplate")
    }
  }

  test("vocab coverage: ranks by frequency and accumulates to 1000 permille") {
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the cat sat"),
      (3L, "cat mat")).toDF("doc_id", "text")
    val rows = QueriesText.vocabCoverageOn(docs)
      .select($"rank", $"word", $"n_tokens", $"cum_permille")
      .as[(Long, String, Long, Long)].collect().toSeq
    // counts: the=4, cat=3, sat=1, mat=1 (ties on word asc); total 9
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, "the", 4L), (2L, "cat", 3L), (3L, "mat", 1L), (4L, "sat", 1L)))
    assert(rows.head._4 == 444L) // 4/9 half-up permille
    assert(rows.last._4 == 1000L, "full head must cover the whole stream")
  }

  test("new operators tolerate empty and single-token documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "word"), (4L, "two words here okay fine")).toDF("doc_id", "text")
    // boilerplate: no doc reaches 3 grams except #4; zero boiler set
    val b = QueriesText.boilerplateOn(docs)
      .select($"doc_id", $"n_positions", $"n_boiler", $"boiler_permille")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(b(1L) == ((1L, 0L, 0L, 0L)) && b(2L) == ((2L, 0L, 0L, 0L)))
    assert(b(4L)._2 == 3L && b(4L)._3 == 0L)
    // vocab coverage: empty-split tokens ("") count like any token —
    // same contract as the oracle's string_split_regex
    val v = QueriesText.vocabCoverageOn(docs)
      .select($"word", $"n_tokens").as[(String, Long)].collect().toMap
    assert(v("") == 2L, v.toString)
    // containment over a corpus with no 3-gram docs: empty, not a crash
    val c = DedupOps.ngramContainmentPairs(
      docs.where($"doc_id" < 4), "doc_id", $"text", 3, 100, 1).count()
    assert(c == 0L)
  }

  test("semantic resolve: majority label wins, keeper is min id with that label") {
    import graft.text.DedupOps
    // two components: {1,2,3} labels (0,0,1) -> majority 0, keeper 1;
    // {10,11} labels (2,2) -> majority 2, keeper 10
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc1", "doc2")
    val labels = Seq((1L, 0), (2L, 0), (3L, 1), (10L, 2), (11L, 2))
      .toDF("vec_id", "label")
    val groups = DedupOps.resolveGroups(pairs)
      .select($"doc_id".as("vec_id"), $"group_id")
    val out = QueriesVector.resolveSummary(groups, labels)
      .select($"group_id", $"n_vecs", $"majority_label", $"n_majority", $"keeper_vec_id")
      .as[(Long, Long, Int, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 0, 2L, 1L), (10L, 2L, 2, 2L, 10L)), out)
  }
}
