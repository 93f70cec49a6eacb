package graft

import java.sql.Timestamp

/** Unit coverage for the statistics/profiling operators: exact-moment
  * regression (slope + Pearson r), the one-pass column profile, the
  * key-skew and length-outlier reports, event transitions, and ship
  * latency — each on hand-checkable frames (the registry queries
  * verify them against DuckDB on the real testdata). */
class ProfileStatsSpec extends SparkSpec {
  import spark.implicits._

  private def corr(rows: Seq[(String, Double, Double)]) =
    QueriesAnalytics.discountCorrOn(
        rows.toDF("l_returnflag", "l_discount", "l_quantity"))
      .select($"l_returnflag", $"n_lines", $"slope", $"pearson_r")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map { case (k, n, s, r) => k -> ((n, s, r)) }.toMap

  test("perfect line recovers its slope with r ~ 1") {
    // quantity = 2*discount + 1 exactly
    val out = corr(Seq(("A", 0.00, 1.00), ("A", 0.05, 1.10), ("A", 0.10, 1.20)))
    val (n, slope, r) = out("A")
    assert(n == 3L && slope.contains(2.0), out)
    assert(math.abs(r.get - 1.0) < 1e-12, out)
  }

  test("anti-correlation and independence behave; zero variance yields NULL") {
    val out = corr(Seq(
      // B: y falls as x rises -> r ~ -1
      ("B", 0.00, 3.00), ("B", 0.05, 2.00), ("B", 0.10, 1.00),
      // C: constant y -> vy = 0 -> slope 0, r NULL
      ("C", 0.00, 5.00), ("C", 0.10, 5.00),
      // D: constant x -> vx = 0 -> both NULL
      ("D", 0.05, 1.00), ("D", 0.05, 9.00)))
    assert(math.abs(out("B")._3.get + 1.0) < 1e-12, out)
    assert(out("B")._2.get < 0)
    assert(out("C") == ((2L, Some(0.0), None)), out)
    assert(out("D") == ((2L, None, None)), out)
  }

  test("key skew: a power-law key spreads across magnitudes") {
    // key 1: 1000 rows (magnitude 4), keys 2-11: 10 rows (2), keys
    // 12-31: 1 row (1)
    val rows = Seq.fill(1000)(1L) ++ (2L to 11L).flatMap(k => Seq.fill(10)(k)) ++ (12L to 31L)
    val df = rows.toDF("l_partkey")
    val out = QueriesScale.keySkewOn(df, "l_partkey")
      .select($"magnitude", $"n_keys", $"n_rows", $"max_rows_per_key", $"rows_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 20L, 20L, 1L, 17L),
      (2L, 10L, 100L, 10L, 89L),
      (4L, 1L, 1000L, 1000L, 892L)), out)
  }

  test("length outliers: Tukey fences on a hand-built source") {
    // 11 docs of length 100..110 -> q1=102, med=105, q3=108 (ceil-rank
    // selection), iqr=6 -> fences [93, 117]; add one 50 and one 500
    val docs = ((1L to 11L).map(i => (i, "s", 99L + i)) ++
      Seq((12L, "s", 50L), (13L, "s", 500L)))
      .toDF("doc_id", "source", "n_chars")
    val out = QueriesScale.lengthOutliersOn(docs)
      .select($"source", $"q1", $"median", $"q3", $"iqr", $"n_docs",
        $"n_low_outliers", $"n_high_outliers")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // 13 docs sorted: 50,100..110,500; ranks ceil(13q/100): q1 rn=4 ->
    // 102; med rn=7 -> 105; q3 rn=10 -> 108
    assert(out == List(("s", 102L, 105L, 108L, 6L, 13L, 1L, 1L)), out)
  }

  test("event transitions: per-user ordering, first events excluded, rows sum to 1000") {
    def ev(id: Long, user: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), user, typ, 1.0, "{}")
    val events = Seq(
      ev(1, 1, "1995-01-01 10:00:00", "view"),
      ev(2, 1, "1995-01-01 10:00:05", "click"),
      ev(3, 1, "1995-01-01 10:00:10", "view"),
      ev(4, 1, "1995-01-01 10:00:15", "click"),
      ev(5, 2, "1995-01-01 10:00:02", "click"), // user 2's first: no transition
      ev(6, 2, "1995-01-01 10:00:04", "buy")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = QueriesAnalytics.eventTransitionsOn(events)
      .select($"prev_type", $"event_type", $"n", $"p_permille")
      .as[(String, String, Long, Long)].collect().toList
    assert(out == List(
      ("click", "buy", 1L, 500L),
      ("click", "view", 1L, 500L),
      ("view", "click", 2L, 1000L)), out)
  }

  test("ship latency: rank selection and exact mean on a hand-built join") {
    val orders = Seq(
      (1L, Timestamp.valueOf("1995-01-01 00:00:00"), "1-URGENT"),
      (2L, Timestamp.valueOf("1995-01-01 00:00:00"), "1-URGENT")
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    // days: 1,2,3,4 -> p50 rn=ceil(4*50/100)=2 -> 2; p90 rn=4 -> 4;
    // p99 rn=4 -> 4; mean permille = 10*1000/4 = 2500
    val li = Seq(
      (1L, 1, Timestamp.valueOf("1995-01-02 00:00:00")),
      (1L, 2, Timestamp.valueOf("1995-01-03 00:00:00")),
      (2L, 1, Timestamp.valueOf("1995-01-04 00:00:00")),
      (2L, 2, Timestamp.valueOf("1995-01-05 00:00:00"))
    ).toDF("l_orderkey", "l_linenumber", "l_shipdate")
    val out = QueriesAnalytics.shipLatencyOn(li, orders)
      .select($"o_orderpriority", $"n_lines", $"p50_days", $"p90_days", $"p99_days",
        $"mean_days_permille")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(("1-URGENT", 4L, 2L, 4L, 4L, 2500L)), out)
  }

  test("lang confusion: matrix cells and per-label shares on known text") {
    val docs = Seq(
      (1L, "the a and of to in", "en"),
      (2L, "the a and of to on", "en"),
      (3L, "der die und das ist nicht", "de"),
      (4L, "zzz qqq www", "fr") // no stopword hits -> unknown
    ).toDF("doc_id", "text", "lang")
    val out = QueriesText.langConfusionOn(docs)
      .select($"lang", $"predicted", $"n", $"lang_total", $"share_permille", $"is_correct")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toList
    assert(out == List(
      ("de", "de", 1L, 1L, 1000L, true),
      ("en", "en", 2L, 2L, 1000L, true),
      ("fr", "unknown", 1L, 1L, 1000L, false)), out)
  }

  test("source quality: bucket counts and exact mean; null text unscoreable") {
    // high-quality doc hits all four 25-caps (score 100); "a a a"
    // scores 41 (stopword cap + weak diversity) -> medium; null text
    // must NOT score (the unguarded #30 scorer would give it 100:
    // least() SKIPS nulls in both engines — the guard is the point)
    val good = (1 to 60).map(i => s"the word$i of thing$i").mkString(" ")
    val docs = Seq(
      (1L, "s", good),
      (2L, "s", "a a a"),
      (3L, "s", null)
    ).toDF("doc_id", "source", "text")
    val out = QueriesText.sourceQualityOn(docs)
      .select($"source", $"n_docs", $"mean_quality_permille",
        $"n_high", $"n_medium", $"n_low", $"high_permille")
      .as[(String, Long, Option[Long], Long, Long, Long, Long)].collect().toList
    assert(out.size == 1)
    val r = out.head
    assert(r._2 == 3L, r) // null-text doc counted
    assert(r._4 == 1L && r._5 == 1L && r._6 == 0L, r)
    assert(r._4 + r._5 + r._6 == 2L, s"null doc must land in no bucket: $r")
    assert(r._7 == 333L, r)
    // mean = (100 + 41) * 1000 / 3 over ALL docs, null skipped by sum
    assert(r._3.contains(47000L), r)
  }

  test("column profile counts nulls and distincts per column in one pass") {
    val df = Seq(
      (1L, "x", Some(1.5)),
      (2L, "x", None),
      (3L, null, Some(1.5)),
      (3L, "y", None)
    ).toDF("id", "tag", "score")
    val out = QueriesEtl.columnProfileOn(df, Seq("id", "tag", "score"))
      .select($"column_name", $"n_rows", $"n_nulls", $"n_distinct")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("id", 4L, 0L, 3L),
      ("tag", 4L, 1L, 2L),
      ("score", 4L, 2L, 1L)), out)
  }
}
