package graft

import org.apache.spark.sql.functions._

/** Rows #116–#121 ([[QueriesMart]]): the TPC-H-shaped decision-support
  * marts plus ABC / WoW / heatmap. Oracle hashes verify end-to-end
  * values at verify SF; these pin the algebra on handcrafted inputs
  * (exclusion rules, class boundaries, ratio exactness) and the plan
  * shapes that decide scale behavior.
  */
class MartSpec extends SparkSpec {
  import spark.implicits._

  test("shipping priority: shipped lines, late orders, other segments excluded; ties break on orderkey") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "2024-01-01", "1-URGENT"),  // in segment, placed before cut
      (11L, 2L, "2024-01-01", "2-HIGH"),    // wrong segment
      (12L, 3L, "2024-03-01", "3-MEDIUM"),  // placed AFTER cut
      (13L, 3L, "2024-01-15", "2-HIGH")     // in segment, ties with 10 on revenue
    ).toDF("o_orderkey", "o_custkey", "d", "o_orderpriority")
      .select($"o_orderkey", $"o_custkey", to_timestamp($"d").as("o_orderdate"), $"o_orderpriority")
    val li = Seq(
      (10L, 100.0, 0.0, "2024-02-10"), // unshipped at cut
      (10L, 999.0, 0.0, "2024-01-20"), // shipped before cut -> excluded
      (11L, 500.0, 0.0, "2024-02-10"), // wrong segment
      (12L, 500.0, 0.0, "2024-03-10"), // late order
      (13L, 100.0, 0.0, "2024-02-11")  // revenue tie with order 10
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "d")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount", to_timestamp($"d").as("l_shipdate"))
    val out = QueriesMart.shippingPriorityOn(li, orders, cust, "BUILDING", "2024-02-01").collect()
    assert(out.map(_.getAs[Long]("orderkey")).toSeq == Seq(10L, 13L),
      "only unshipped in-segment pre-cut orders; equal revenue orders by orderkey")
    assert(out.forall(_.getAs[Double]("revenue") == 100.0))
  }

  test("shipping priority plan: distributed TakeOrdered head, broadcast segment filter") {
    val p = QueriesMart.shippingPriority(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "top-10 must never plan a global sort:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("promo share: exact permille of promo revenue per ship-month") {
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val li = Seq(
      (1L, 30.0, 0.0, "2024-01-05"),  // promo    Jan: 30 of 100
      (2L, 70.0, 0.0, "2024-01-20"),  // standard
      (1L, 10.0, 0.5, "2024-02-01")   // promo    Feb: 5 of 5 (discounted)
    ).toDF("l_partkey", "l_extendedprice", "l_discount", "d")
      .select($"l_partkey", $"l_extendedprice", $"l_discount", to_timestamp($"d").as("l_shipdate"))
    val out = QueriesMart.promoShareOn(li, part).collect()
    assert(out.length == 2)
    val jan = out(0)
    assert(jan.getAs[Long]("n_lines") == 2L && jan.getAs[Double]("revenue") == 100.0)
    assert(jan.getAs[Double]("promo_revenue") == 30.0)
    assert(jan.getAs[Long]("promo_permille") == 300L)
    val feb = out(1)
    assert(feb.getAs[Double]("promo_revenue") == 5.0)
    assert(feb.getAs[Long]("promo_permille") == 1000L)
  }

  test("local supplier volume: nation-equality, region, and year filters all bind") {
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "JAPAN", 0), (11, "INDIA", 0), (20, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((1L, 10), (2L, 11), (3L, 20)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 10), (101L, 11), (102L, 20)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq(
      (1L, 1L, "1997-05-01"), // JAPAN customer, in year
      (2L, 2L, "1997-06-01"), // INDIA customer, in year
      (3L, 1L, "1998-05-01"), // wrong year
      (4L, 3L, "1997-05-01")  // FRANCE customer (wrong region)
    ).toDF("o_orderkey", "o_custkey", "d")
      .select($"o_orderkey", $"o_custkey", to_timestamp($"d").as("o_orderdate"))
    val li = Seq(
      (1L, 100L, 50.0, 0.0),  // JAPAN cust + JAPAN supp -> counts
      (1L, 101L, 70.0, 0.0),  // JAPAN cust + INDIA supp -> nation mismatch
      (2L, 101L, 30.0, 0.0),  // INDIA + INDIA -> counts
      (3L, 100L, 99.0, 0.0),  // wrong year
      (4L, 102L, 99.0, 0.0)   // wrong region
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = QueriesMart
      .localSupplierVolumeOn(li, orders, cust, supp, nation, region, "ASIA", 1997)
      .collect()
    assert(out.map(r => (r.getAs[String]("nation"), r.getAs[Double]("revenue"))).toSeq
      == Seq(("JAPAN", 50.0), ("INDIA", 30.0)), out.mkString(", "))
  }

  test("abc parts: cumulative-permille class boundaries are exact and inclusive") {
    // revenues 70/20/10 -> cum permille 700 (A, boundary inclusive), 900 (B), 1000 (C)
    val li = Seq(
      (1L, 70.0, 0.0), (2L, 20.0, 0.0), (3L, 10.0, 0.0)
    ).toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = QueriesMart.abcPartsOn(li).collect()
    assert(out.map(r => (r.getAs[String]("abc_class"), r.getAs[Long]("n_parts"),
      r.getAs[Double]("revenue"), r.getAs[Long]("share_permille"))).toSeq
      == Seq(("A", 1L, 70.0, 700L), ("B", 1L, 20.0, 200L), ("C", 1L, 10.0, 100L)))
  }

  test("abc parts: equal-revenue ties are deterministic on partkey") {
    // four equal parts: cum 250/500/750/1000 -> A,A,B,C regardless of input order
    val li = Seq((4L, 25.0, 0.0), (2L, 25.0, 0.0), (3L, 25.0, 0.0), (1L, 25.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = QueriesMart.abcPartsOn(li).collect()
    assert(out.map(r => (r.getAs[String]("abc_class"), r.getAs[Long]("n_parts"))).toSeq
      == Seq(("A", 2L), ("B", 1L), ("C", 1L)))
  }

  test("wow growth: permille ratio of adjacent observed weeks; calendar gap exposed") {
    val orders = Seq(
      ("2024-01-01", 100.0), // week of Jan 1 (Monday)
      ("2024-01-08", 150.0), // next week: ratio 1500
      ("2024-01-22", 75.0)   // SKIPS a week: prev_week_start shows Jan 8
    ).toDF("d", "o_totalprice")
      .select(to_timestamp($"d").as("o_orderdate"), $"o_totalprice")
    val out = QueriesMart.wowGrowthOn(orders).collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(out(0).fieldIndex("wow_ratio_permille")))
    assert(out(0).isNullAt(out(0).fieldIndex("prev_week_start")))
    assert(out(1).getAs[Long]("wow_ratio_permille") == 1500L)
    assert(out(2).getAs[Long]("wow_ratio_permille") == 500L)
    assert(out(2).getAs[java.sql.Date]("prev_week_start").toString == "2024-01-08",
      "gap weeks compare adjacent OBSERVED weeks and say so")
  }

  test("hourly heatmap: cells, exact value sums, truncated permille shares") {
    val ev = Seq(
      ("2024-01-01 09:10:00", 1.50), // Mon 9h
      ("2024-01-01 09:50:00", 2.50), // Mon 9h
      ("2024-01-07 23:00:00", 4.00)  // Sun 23h
    ).toDF("d", "value").select(to_timestamp($"d").as("ts"), $"value")
    val out = QueriesMart.hourlyHeatmapOn(ev).collect()
    assert(out.map(r => (r.getAs[Long]("dow_iso"), r.getAs[Long]("hour"),
      r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
      r.getAs[Long]("share_permille"))).toSeq
      == Seq((1L, 9L, 2L, 4.0, 666L), (7L, 23L, 1L, 4.0, 333L)))
  }

  test("part rank: hand-computed 3-iteration PageRank on a path graph") {
    // path 1—2—3: deg(2)=2, deg(1)=deg(3)=1; exact ppm arithmetic gives
    // r3 = (629187, 1741624, 629187) — every div floor checked by hand
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val out = QueriesScale.partRankFromPairs(pairs).collect()
    assert(out.map(r => (r.getAs[Long]("partkey"), r.getAs[Long]("degree"),
      r.getAs[Long]("rank_ppm"))).toSeq
      == Seq((2L, 2L, 1741624L), (1L, 1L, 629187L), (3L, 1L, 629187L)))
  }

  test("part rank on real data: damping floor holds, head ordering is deterministic") {
    val out = QueriesScale.partRank(spark, sf).collect()
    assert(out.nonEmpty)
    // ranks are positive and ordered; tie-break is ascending partkey
    val ranked = out.map(r => (r.getAs[Long]("rank_ppm"), r.getAs[Long]("partkey")))
    assert(ranked.forall(_._1 >= 150000L), "damping floor")
    assert(ranked.sliding(2).forall { case Array((r1, k1), (r2, k2)) =>
      r1 > r2 || (r1 == r2 && k1 < k2); case _ => true })
  }

  test("part rank: structurally mirrored nodes get exactly equal ranks") {
    // two disjoint mirrored triangles plus the 1-2-3 path's symmetric
    // endpoints: every mirrored pair must land on the same integer rank
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // path: 1 and 3 are mirrors
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle A
      (20L, 21L), (21L, 22L), (20L, 22L) // triangle B, mirror of A
    ).toDF("p1", "p2")
    val r = QueriesScale.partRankFromPairs(pairs).collect()
      .map(x => x.getAs[Long]("partkey") -> x.getAs[Long]("rank_ppm")).toMap
    assert(r(1L) == r(3L), "path endpoints are mirrors")
    assert(Set(10L, 11L, 12L, 20L, 21L, 22L).map(r).size == 1,
      "all six triangle nodes are structurally identical")
  }

  test("zipf check: a perfect 1/r head scores zero deviation; a flat head does not") {
    // f = 60/r for r=1..5 is exactly Zipf -> every term's permille is
    // 1000, deviation 0. A flat 60,60,60 head deviates by (r-1)*1000.
    val perfect = Seq(
      ("xx", 1L, "a", 60L), ("xx", 2L, "b", 30L), ("xx", 3L, "c", 20L),
      ("xx", 4L, "d", 15L), ("xx", 5L, "e", 12L),
      ("yy", 1L, "a", 60L), ("yy", 2L, "b", 60L), ("yy", 3L, "c", 60L)
    ).toDF("lang", "rank", "word", "n_occurrences")
    val out = QueriesScale.zipfCheckOn(perfect).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[String]("top_word"), r.getAs[Long]("n_top"),
          r.getAs[Long]("zipf_dev_permille"))).toMap
    assert(out("xx") == (("a", 60L, 0L)), "exact 1/r must score 0")
    // flat head: dev terms are |r*1000 - 1000| = 1000, 2000 -> mean 1500
    assert(out("yy") == (("a", 60L, 1500L)))
  }

  test("trend slope: hand-built linear decline recovers the exact slope; sparse parts excluded") {
    // part 1: revenue 70-10t over t=1..6 -> slope exactly -10.0/month
    // part 2: 3 observed months -> excluded by the >=6 gate
    val rows = (1 to 6).map(m => (1L, 70.0 - 10.0 * m, 0.0, f"1992-$m%02d-15")) ++
      (1 to 3).map(m => (2L, 50.0, 0.0, f"1992-$m%02d-15"))
    val li = rows.toDF("l_partkey", "l_extendedprice", "l_discount", "d")
      .select($"l_partkey", $"l_extendedprice", $"l_discount", to_timestamp($"d").as("l_shipdate"))
    val out = QueriesMart.trendSlopeOn(li).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("partkey") == 1L)
    assert(out(0).getAs[Long]("n_months") == 6L)
    assert(out(0).getAs[Double]("revenue") == 210.0)
    assert(out(0).getAs[Double]("slope_per_month") == -10.0,
      "exact integer moments must recover the exact slope")
  }

  test("anomaly days: 3-MAD weekday gate flags the planted spike only") {
    // five Mondays, one 10x spike: median 100, MAD 0, only the spike
    // has deviation > 3*MAD
    val orders = Seq(
      ("2024-01-01", 100.0), ("2024-01-08", 100.0), ("2024-01-15", 100.0),
      ("2024-01-22", 100.0), ("2024-01-29", 1000.0)
    ).toDF("d", "o_totalprice")
      .select(to_timestamp($"d").as("o_orderdate"), $"o_totalprice")
    val out = QueriesMart.anomalyDaysOn(orders).collect()
    assert(out.length == 1, out.mkString(", "))
    val r = out(0)
    assert(r.getAs[java.sql.Date]("day").toString == "2024-01-29")
    assert(r.getAs[Double]("revenue") == 1000.0)
    assert(r.getAs[Double]("weekday_median") == 100.0)
    assert(r.getAs[Double]("deviation") == 900.0)
    assert(r.getAs[Double]("weekday_mad") == 0.0)
  }

  test("trend slope plan: distributed TakeOrdered head, one exchange to the part grain") {
    val p = QueriesMart.trendSlope(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "top-20 must never plan a global sort:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("order lines profile: histogram cells and truncated shares") {
    val li = Seq((1L, 1), (2L, 1), (3L, 1), (3L, 2))
      .toDF("l_orderkey", "l_linenumber")
    val out = QueriesMart.orderLinesProfileOn(li).collect()
    assert(out.map(r => (r.getAs[Long]("n_lines"), r.getAs[Long]("n_orders"),
      r.getAs[Long]("share_permille"))).toSeq
      == Seq((1L, 2L, 666L), (2L, 1L, 333L)))
  }

  test("customer migration: band transitions, churn to gone, final-year trim") {
    // c1: 1 order in 2000 (one) -> 5 in 2001 (many) -> absent 2002 (gone)
    // c2: 2 in 2000 (few) -> 1 in 2001 (one) -> 1 in 2002 (trimmed as source)
    val rows =
      Seq((1L, "2000-05-01")) ++ (1 to 5).map(i => (1L, f"2001-0$i%d-01")) ++
        Seq((2L, "2000-03-01"), (2L, "2000-04-01"), (2L, "2001-06-01"), (2L, "2002-02-01"))
    val orders = rows.toDF("o_custkey", "d")
      .select($"o_custkey", to_timestamp($"d").as("o_orderdate"))
    val out = QueriesMart.customerMigrationOn(orders).collect()
    assert(out.map(r => (r.getAs[Long]("year_from"), r.getAs[String]("band_from"),
      r.getAs[String]("band_to"), r.getAs[Long]("n_customers"),
      r.getAs[Long]("cohort_permille"))).toSeq
      == Seq(
        (2000L, "few", "one", 1L, 1000L),
        (2000L, "one", "many", 1L, 1000L),
        (2001L, "many", "gone", 1L, 1000L),
        (2001L, "one", "one", 1L, 1000L)),
      "2002 sources must be trimmed (vacuously gone)")
  }

  test("freshness audit: days behind the freshest table") {
    val orders = Seq(("2024-01-10", 1.0)).toDF("d", "o_totalprice")
      .select(to_timestamp($"d").as("o_orderdate"), $"o_totalprice")
    val li = Seq(("2024-01-12", 1L)).toDF("d", "l_orderkey")
      .select(to_timestamp($"d").as("l_shipdate"), $"l_orderkey")
    val ev = Seq(("2024-01-15", 1L)).toDF("d", "user_id")
      .select(to_timestamp($"d").as("ts"), $"user_id")
    val out = QueriesMart.dqFreshnessOn(orders, li, ev).collect()
    assert(out.map(r => (r.getAs[String]("table_name"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("days_behind"))).toSeq
      == Seq(("events", 1L, 0L), ("lineitem", 1L, 3L), ("orders", 1L, 5L)))
  }

  test("discount depth: exact decimal binning and leakage shares") {
    // 0.05 * 100 on a DOUBLE is 5.000000000000001 — the decimal path
    // must bin it as exactly 5
    val li = Seq(
      (100.0, 0.05), (200.0, 0.05), // forgone 5 + 10 = 15
      (100.0, 0.10),                // forgone 10
      (100.0, 0.00)                 // forgone 0
    ).toDF("l_extendedprice", "l_discount")
    val out = QueriesMart.discountDepthOn(li).collect()
    assert(out.map(r => (r.getAs[Long]("discount_pct"), r.getAs[Long]("n_lines"),
      r.getAs[Double]("forgone_revenue"), r.getAs[Long]("leakage_share_permille"))).toSeq
      == Seq((0L, 1L, 0.0, 0L), (5L, 2L, 15.0, 600L), (10L, 1L, 10.0, 400L)))
    assert(out.map(r => r.getAs[Double]("gross_revenue")).sum == 500.0)
  }

  test("zipf check on real data: one row per language, shape sane") {
    val out = QueriesScale.zipfCheck(spark, sf).collect()
    // shape on real testdata: one row per language, dev >= 0, top word non-empty
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("zipf_dev_permille") >= 0L))
    assert(out.forall(_.getAs[Long]("n_top") >= 1L))
    assert(out.map(_.getAs[String]("lang")).distinct.length == out.length)
  }

  test("trade balance: full-outer nation grain, exact share, one-sided nations kept") {
    val nation = Seq((1, "A"), (2, "B"), (3, "C")).toDF("n_nationkey", "n_name")
    val supp = Seq((10L, 1), (11L, 2)).toDF("s_suppkey", "s_nationkey")
    val cust = Seq((20L, 1), (21L, 3)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 20L), (101L, 21L)).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 10L, 60.0, 0.0), // supplied by A, purchased by A
      (101L, 11L, 40.0, 0.0)  // supplied by B, purchased by C
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = QueriesMart.nationTradeBalanceOn(li, orders, cust, supp, nation).collect()
    assert(out.map(r => (r.getAs[String]("nation"), r.getAs[Double]("supplied_revenue"),
      r.getAs[Double]("purchased_revenue"), r.getAs[Long]("supplied_share_permille"))).toSeq
      == Seq(("A", 60.0, 60.0, 500L), ("B", 40.0, 0.0, 1000L), ("C", 0.0, 40.0, 0L)),
      "customer-only and supplier-only nations must both survive the full join")
  }

  test("dedup inflation: normalized duplicates counted per source") {
    val docs = Seq(
      (1L, "Hello World", "s1"), (2L, "  hello world  ", "s1"), (3L, "unique", "s1"),
      (4L, "clean", "s2")
    ).toDF("doc_id", "text", "source")
    val out = QueriesMart.dedupInflationOn(docs).collect()
    assert(out.map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_docs"),
      r.getAs[Long]("inflation_permille"))).toSeq
      == Seq(("s1", 3L, 2L, 1L, 1500L), ("s2", 1L, 1L, 0L, 1000L)))
  }

  test("open orders: backlog accumulates placements and releases full shipments") {
    // day1: 2 placed; day2: 1 placed, order 1 completes (last line day2);
    // day3: order 2 completes. Backlog: 2, 2, 1
    val orders = Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("o_orderkey", "d")
      .select($"o_orderkey", to_timestamp($"d").as("o_orderdate"))
    val li = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), // order 1 completes day2
      (2L, "2024-01-03"),                     // order 2 completes day3
      (3L, "2024-01-02")                      // order 3 completes day2
    ).toDF("l_orderkey", "d")
      .select($"l_orderkey", to_timestamp($"d").as("l_shipdate"))
    val out = QueriesMart.openOrdersOn(orders, li).collect()
    assert(out.map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n_placed"),
      r.getAs[Long]("n_shipped_complete"), r.getAs[Long]("open_backlog"))).toSeq
      == Seq(("2024-01-01", 2L, 0L, 2L), ("2024-01-02", 1L, 2L, 1L),
        ("2024-01-03", 0L, 1L, 0L)))
  }

  test("degenerate inputs: empty facts return zero rows, never throw") {
    val emptyLi = Seq.empty[(Long, Long, Double, Double, String)]
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "d")
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice", $"l_discount",
        to_timestamp($"d").as("l_shipdate"))
    val emptyOrders = Seq.empty[(Long, Double, String)]
      .toDF("o_custkey", "o_totalprice", "d")
      .select($"o_custkey", $"o_totalprice", to_timestamp($"d").as("o_orderdate"))
    assert(QueriesMart.abcPartsOn(emptyLi).count() == 0)
    assert(QueriesMart.trendSlopeOn(emptyLi).count() == 0)
    assert(QueriesMart.orderLinesProfileOn(emptyLi).count() == 0)
    assert(QueriesMart.discountDepthOn(emptyLi).count() == 0)
    assert(QueriesMart.wowGrowthOn(emptyOrders).count() == 0)
    assert(QueriesMart.anomalyDaysOn(emptyOrders).count() == 0)
    assert(QueriesMart.customerMigrationOn(emptyOrders).count() == 0)
  }

  test("single-grain inputs: one week has no ratio; one year migrates nowhere") {
    val one = Seq((1L, 100.0, "2024-01-03")).toDF("o_custkey", "o_totalprice", "d")
      .select($"o_custkey", $"o_totalprice", to_timestamp($"d").as("o_orderdate"))
    val wow = QueriesMart.wowGrowthOn(one.drop("o_custkey")).collect()
    assert(wow.length == 1 && wow(0).isNullAt(wow(0).fieldIndex("wow_ratio_permille")))
    // a single observed year: every source row is the final year -> trimmed
    assert(QueriesMart.customerMigrationOn(one).count() == 0,
      "single-year data must not report everyone as churned")
  }

  test("supplier concentration: exact truncated-share HHI, single-supplier parts excluded") {
    val li = Seq(
      (1L, 10L, 50.0, 0.0), (1L, 11L, 50.0, 0.0),                  // 500/500 -> HHI 500000
      (2L, 10L, 90.0, 0.0), (2L, 11L, 10.0, 0.0),                  // 900/100 -> HHI 820000
      (3L, 10L, 70.0, 0.0)                                          // single supplier -> excluded
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = QueriesMart.supplierConcentrationOn(li).collect()
    assert(out.map(r => (r.getAs[Long]("partkey"), r.getAs[Long]("n_suppliers"),
      r.getAs[Long]("hhi"))).toSeq
      == Seq((2L, 2L, 820000L), (1L, 2L, 500000L)),
      "riskiest (most concentrated) part first; vacuous monopolies excluded")
  }

  test("bot regularity: a metronome scores 0, a bursty stream scores high") {
    // user 1: 60 events exactly 10 s apart -> variance 0 -> burstiness 0
    // user 2: 59 gaps alternating 1 s / 99 s -> strongly bursty
    // user 3: only 10 events -> below the n>=50 gate
    val rows =
      (0 until 60).map(i => (1L, 100L + i, i * 10L)) ++
        (0 until 60).map { i =>
          val t = (i / 2) * 100L + (if (i % 2 == 1) 1L else 0L)
          (2L, 200L + i, t)
        } ++
        (0 until 10).map(i => (3L, 300L + i, i * 7L))
    val ev = rows.toDF("user_id", "event_id", "off")
      .select($"user_id", $"event_id",
        (lit(1700000000L) + $"off").cast("timestamp").as("ts"))
    val out = QueriesMart.botRegularityOn(ev).collect()
    val byUser = out.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Long]("n_events"), r.getAs[Long]("burstiness_permille"))).toMap
    assert(!byUser.contains(3L), "below the event-count gate")
    assert(byUser(1L) == ((60L, 0L)), "constant gaps = perfect metronome")
    assert(byUser(2L)._2 > 500L, s"alternating 1/99 gaps must read bursty: ${byUser(2L)}")
    assert(out.head.getAs[Long]("user_id") == 1L, "most regular user first")
  }

  test("category affinity: exact lift vs independence on a handcrafted matrix") {
    val part = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("p_partkey", "p_type")
    // baskets: {A,B} x2, {A} x1, {B} x1, {A,C} x1 -> 5 baskets
    // n(A)=4, n(B)=3, n(C)=1; both(A,B)=2, both(A,C)=1
    val li = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (4L, 2L), (5L, 1L), (5L, 3L),
      (5L, 1L) // duplicate line, must not double-count the category
    ).toDF("l_orderkey", "l_partkey")
    val out = QueriesMart.categoryAffinityOn(li, part).collect()
    assert(out.map(r => (r.getAs[String]("cat_1"), r.getAs[String]("cat_2"),
      r.getAs[Long]("n_both"), r.getAs[Long]("lift_permille"))).toSeq
      == Seq(
        ("A", "B", 2L, 833L),  // 2*5*1000 / (4*3) = 833
        ("A", "C", 1L, 1250L)) // 1*5*1000 / (4*1) = 1250
      , out.mkString(", "))
  }

  test("mart plans: no cartesian products beyond the 1-row total recombines") {
    for (q <- Seq("q_promo_share", "q_local_supplier_volume", "q_wow_growth")) {
      val p = Queries.all(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
    // abc_parts and hourly_heatmap recombine a broadcast 1-row total:
    // the only nested-loop allowed is that single-row join
    for (q <- Seq("q_abc_parts", "q_hourly_heatmap")) {
      val p = Queries.all(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, s"$q:\n$p")
    }
  }
}
