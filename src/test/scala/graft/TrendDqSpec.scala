package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Unit coverage for the round-8 monitoring queries: the 7-day
  * trailing trend (calendar-gap semantics) and the Benford first-digit
  * DQ profile — each on hand-checkable inputs (the registry queries
  * verify them against DuckDB on the real testdata). */
class TrendDqSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  test("daily trend: RANGE window shrinks across calendar gaps") {
    // days 1,2,3 then a 10-day gap to day 13: the trailing window at
    // day 13 must contain ONLY day 13 (ROWS would wrongly pull 3 rows)
    val orders = Seq(
      (1L, 1L, ts("1995-01-01"), 10.00),
      (2L, 1L, ts("1995-01-02"), 20.00),
      (3L, 1L, ts("1995-01-03"), 30.00),
      (4L, 1L, ts("1995-01-13"), 40.00)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = QueriesAnalytics.dailyTrendOn(orders)
      .select($"day".cast("string"), $"revenue", $"trailing_7d", $"window_days", $"dod_delta")
      .as[(String, Double, Double, Long, Option[Double])].collect().toList
    assert(out == List(
      ("1995-01-01", 10.0, 10.0, 1L, None),
      ("1995-01-02", 20.0, 30.0, 2L, Some(10.0)),
      ("1995-01-03", 30.0, 60.0, 3L, Some(10.0)),
      ("1995-01-13", 40.0, 40.0, 1L, Some(10.0))), out)
  }

  test("daily trend: trailing window drops days older than 6") {
    // 8 consecutive days of 1.00: day 8's window holds days 2..8
    val orders = (1 to 8).map(d =>
      (d.toLong, 1L, ts(f"1995-01-0$d"), 1.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = QueriesAnalytics.dailyTrendOn(orders)
      .select($"trailing_7d", $"window_days").as[(Double, Long)].collect().toList
    assert(out.map(_._2) == List(1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L))
    assert(out.last == (7.0, 7L))
  }

  test("event gaps: ladder boundaries, first events excluded, cross-user isolation") {
    def ev(id: Long, user: Long, t: String) = (id, Timestamp.valueOf(t), user, "click", 1.0, "{}")
    val events = Seq(
      // user 1: gaps of 0s, 10s, 1800s, 1801s
      ev(1, 1, "1995-01-01 10:00:00"), ev(2, 1, "1995-01-01 10:00:00"),
      ev(3, 1, "1995-01-01 10:00:10"), ev(4, 1, "1995-01-01 10:30:10"),
      ev(5, 1, "1995-01-01 11:00:11"),
      // user 2: a single event -> contributes NO gap
      ev(6, 2, "1995-01-01 09:00:00")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = QueriesAnalytics.eventGapsOn(events)
      .select($"bucket", $"gap_bucket", $"n_gaps", $"in_session")
      .as[(Long, String, Long, Boolean)].collect().toList
    assert(out == List(
      (0L, "0s", 1L, true),
      (1L, "1-10s", 1L, true),
      (4L, "10-30min", 1L, true),    // exactly 1800 s is still in-session
      (5L, "30-60min", 1L, false)),  // 1801 s crosses the 30-min line
      out)
  }

  test("benford: digit comes from exact cents, zero/negative excluded") {
    // 0.05 -> cents 5 -> digit 5 (NOT '0'); 912.34 -> digit 9;
    // 19.99 -> digit 1; 0.00 and -3.00 drop out of the profile
    val orders = Seq(
      (1L, 1L, ts("1995-01-01"), 0.05),
      (2L, 1L, ts("1995-01-01"), 912.34),
      (3L, 1L, ts("1995-01-01"), 19.99),
      (4L, 1L, ts("1995-01-01"), 1000.00),
      (5L, 1L, ts("1995-01-01"), 0.00),
      (6L, 1L, ts("1995-01-01"), -3.00)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = QueriesEtl.benfordOn(orders)
      .select($"digit", $"n", $"share_permille", $"expected_permille", $"dev_permille")
      .as[(Int, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1, 2L, 500L, 301L, 199L),
      (5, 1L, 250L, 79L, 171L),
      (9, 1L, 250L, 46L, 204L)), out)
  }
}
