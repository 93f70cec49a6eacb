package graft

import org.apache.spark.sql.functions._

/** Rows #110-#112: basket-lift association rules, weekday
  * seasonality, supplier scorecard. Oracle hashes verify values
  * end-to-end at verify SF; these pin the algebra on handcrafted
  * inputs and the cross-row invariants the oracle can't state.
  */
class BasketSeasonSupplierSpec extends SparkSpec {
  import spark.implicits._

  test("basket lift: permilles are integer ratios of emitted counts; pairs match #66") {
    val out = QueriesScale.basketLift(spark, sf).cache()
    assert(out.count() > 0)
    // self-consistency: every permille is re-derivable from the counts
    val bad = out.where(
      expr("conf_p1_permille <> (1000 * n_orders) div n1") ||
        expr("conf_p2_permille <> (1000 * n_orders) div n2") ||
        expr("lift_permille <> (1000 * n_orders * n_baskets) div (n1 * n2)"))
    assert(bad.isEmpty, "permille columns must be the exact integer ratios")
    // the basket total is the corpus's distinct order count
    val expected = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    assert(out.select("n_baskets").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(expected))
    // the pair matrix and supports are EXACTLY #66's
    val co = QueriesScale.copurchase(spark, sf)
      .select("p1", "p2", "n_orders", "n1", "n2")
    val mine = out.select("p1", "p2", "n_orders", "n1", "n2")
    assert(mine.except(co).isEmpty && co.except(mine).isEmpty)
    out.unpersist()
  }

  test("weekday seasonality: handcrafted week gives exact shares and index") {
    // 2024-01-01 is a Monday; 30/30/40 over Mon/Tue/Sun of 100 total
    val orders = Seq(
      ("2024-01-01", 10.00), ("2024-01-01", 20.00), // Mon
      ("2024-01-02", 30.00), // Tue
      ("2024-01-07", 40.00) // Sun
    ).toDF("d", "o_totalprice")
      .select(to_timestamp($"d").as("o_orderdate"), $"o_totalprice")
    val out = QueriesAnalytics.weekdaySeasonalityOn(orders).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 7L), "ISO weekday keys")
    val mon = out(0)
    assert(mon.getAs[Long]("n_orders") == 2L)
    assert(mon.getAs[Double]("revenue") == 30.00)
    assert(mon.getAs[Long]("share_permille") == 300L)
    assert(mon.getAs[Long]("idx_permille") == 2100L)
    val sun = out(2)
    assert(sun.getAs[Long]("share_permille") == 400L)
    assert(sun.getAs[Long]("idx_permille") == 2800L)
    // truncation is the only share loss possible
    val s = out.map(_.getAs[Long]("share_permille")).sum
    assert(s <= 1000 && s >= 1000 - out.length)
  }

  test("supplier scorecard: exact return rate, latency permille, revenue") {
    val li = Seq(
      (1L, 101L, 1L, 100.0, 0.0, "N", "2024-01-03"), // +2 days
      (1L, 101L, 2L, 100.0, 0.0, "R", "2024-01-04"), // +3 days
      (2L, 101L, 2L, 100.0, 0.0, "N", "2024-01-06"), // +5 days
      (2L, 202L, 3L, 50.0, 0.5, "R", "2024-01-02") // +1 day
    ).toDF("l_orderkey", "l_suppkey", "l_partkey",
        "l_extendedprice", "l_discount", "l_returnflag", "d")
      .withColumn("l_shipdate", to_timestamp($"d")).drop("d")
    val o = Seq((1L, "2024-01-01"), (2L, "2024-01-01")).toDF("o_orderkey", "d")
      .select($"o_orderkey", to_timestamp($"d").as("o_orderdate"))
    val sup = Seq((101L, "Acme", 1L), (202L, "Zeta", 2L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((1L, "FRANCE"), (2L, "PERU")).toDF("n_nationkey", "n_name")
    val out = QueriesAnalytics.supplierScorecardOn(li, o, sup, nat).collect()
    assert(out.length == 2)
    val a = out(0) // 101: 3 lines, 1 R; days 2+3+5=10
    assert(a.getAs[Long]("s_suppkey") == 101L && a.getAs[String]("nation") == "FRANCE")
    assert(a.getAs[Long]("n_lines") == 3L)
    assert(a.getAs[Long]("distinct_parts") == 2L)
    assert(a.getAs[Double]("revenue") == 300.0)
    assert(a.getAs[Long]("return_permille") == 333L)
    assert(a.getAs[Long]("mean_ship_days_permille") == 3333L)
    val z = out(1) // 202: the single-line all-returns vendor
    assert(z.getAs[Double]("revenue") == 25.0)
    assert(z.getAs[Long]("return_permille") == 1000L)
    assert(z.getAs[Long]("mean_ship_days_permille") == 1000L)
  }
}
