package graft

import org.apache.spark.sql.functions._

/** Rows #113-#114: inter-purchase cadence and rolling 7-day active
  * users. Oracle hashes verify values at verify SF; these pin the
  * algebra on handcrafted inputs (single-order exclusion, window
  * coverage at day 7 boundaries, multi-day users counted once).
  */
class CadenceSpec extends SparkSpec {
  import spark.implicits._

  test("interpurchase: gaps, permille mean, and single-order exclusion") {
    val orders = Seq(
      (1L, 10L, "2024-01-01"), (1L, 11L, "2024-01-04"), (1L, 12L, "2024-01-10"),
      (2L, 20L, "2024-03-05"), // single order: no cadence
      (3L, 30L, "2024-02-01"), (3L, 31L, "2024-02-01") // same-day: gap 0
    ).toDF("o_custkey", "o_orderkey", "d")
      .select($"o_custkey", $"o_orderkey", to_timestamp($"d").as("o_orderdate"))
    val out = QueriesAnalytics.interpurchaseOn(orders).orderBy("custkey").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), "customer 2 must be excluded")
    val c1 = out(0) // gaps 3 and 6
    assert(c1.getAs[Long]("n_orders") == 3L && c1.getAs[Long]("n_gaps") == 2L)
    assert(c1.getAs[Long]("min_gap_days") == 3L && c1.getAs[Long]("max_gap_days") == 6L)
    assert(c1.getAs[Long]("mean_gap_days_permille") == 4500L)
    val c3 = out(1) // one zero-day gap
    assert(c3.getAs[Long]("min_gap_days") == 0L)
    assert(c3.getAs[Long]("mean_gap_days_permille") == 0L)
  }

  test("rolling users: 7-day window covers day d-6..d, users counted once") {
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (2L, "2024-01-01 09:00:00"),
      (1L, "2024-01-05 10:00:00"), // u1 again: one vote per window day
      (3L, "2024-01-09 11:00:00")
    ).toDF("user_id", "t").select($"user_id", to_timestamp($"t").as("ts"))
    val out = QueriesAnalytics.rollingUsersOn(ev).collect()
    assert(out.map(_.getDate(0).toString).toSeq ==
      Seq("2024-01-01", "2024-01-05", "2024-01-09"))
    // Jan 1: both users that day
    assert(out(0).getAs[Long]("n_users_1d") == 2L)
    assert(out(0).getAs[Long]("active_users_7d") == 2L)
    // Jan 5: window Jan 1(-6)..Jan 5 — u1 (twice, counted once) + u2
    assert(out(1).getAs[Long]("n_users_1d") == 1L)
    assert(out(1).getAs[Long]("active_users_7d") == 2L)
    // Jan 9: window Jan 3..9 — u1@Jan5 and u3@Jan9; Jan-1 users aged out
    assert(out(2).getAs[Long]("n_users_1d") == 1L)
    assert(out(2).getAs[Long]("active_users_7d") == 2L)
  }
}
