package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-association operators: PMI bigram
  * collocations and pairwise source n-gram overlap — each on
  * hand-checkable corpora (the registry queries verify them against
  * DuckDB on the real testdata). */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  test("pmi bigrams: a welded phrase outranks a chance co-occurrence") {
    // "hong kong" always co-occur (lift = N/(c_x·c_y) maximal for the
    // support); "the cat" co-occurs once out of many "the"s -> low lift
    val phrase = (1 to 6).map(i => (i.toLong, s"hong kong report$i"))
    val noise = (7 to 30).map(i => (i.toLong, s"the word$i and the cat$i"))
    val docs = (phrase ++ noise).toDF("doc_id", "text")
    val out = QueriesText.pmiBigramsOn(docs)
      .select($"word1", $"word2", $"c_xy", $"c_x", $"c_y", $"lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val top = out.head
    assert((top._1, top._2) == ("hong", "kong"), top)
    assert(top._3 == 6L && top._4 == 6L && top._5 == 6L)
    // min support: every emitted bigram has c_xy >= 5
    assert(out.forall(_._3 >= 5L))
    // lift is descending, ties broken by the bigram
    val key = out.map(r => (-r._6, r._1, r._2)).toSeq
    assert(key == key.sorted, "rows must order by lift desc, bigram asc")
  }

  test("pmi bigrams: support filter drops rare pairs entirely") {
    val docs = Seq((1L, "rare pair rare pair rare pair rare pair")).toDF("doc_id", "text")
    // "rare pair" appears 4 times -> below min support 5 -> no rows
    assert(QueriesText.pmiBigramsOn(docs).count() == 0)
  }

  test("source overlap: exact jaccard on known gram sets") {
    // src a: grams {w1 w2 w3, w2 w3 w4} ; src b shares exactly one of
    // them; src c shares nothing -> pairs (a,b) only via inner join
    val docs = Seq(
      (1L, "a", "w1 w2 w3 w4"),
      (2L, "b", "w1 w2 w3 x1 x2 x3"),
      (3L, "c", "q1 q2 q3 q4")
    ).toDF("doc_id", "source", "text")
    val out = QueriesText.sourceOverlapOn(docs)
      .select($"source_a", $"source_b", $"n_a", $"n_b", $"n_inter", $"n_union", $"jaccard_permille")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toList
    // a: 2 grams; b: 4 grams (w1w2w3, w2w3x1, w3x1x2, x1x2x3); inter=1
    assert(out == List(("a", "b", 2L, 4L, 1L, 5L, 200L)), out)
  }

  test("source overlap: duplicate docs within a source don't inflate set sizes") {
    val docs = Seq(
      (1L, "a", "w1 w2 w3"),
      (2L, "a", "w1 w2 w3"), // same gram again, same source
      (3L, "b", "w1 w2 w3")
    ).toDF("doc_id", "source", "text")
    val out = QueriesText.sourceOverlapOn(docs)
      .select($"n_a", $"n_b", $"n_inter", $"jaccard_permille")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List((1L, 1L, 1L, 1000L)), out)
  }
}
