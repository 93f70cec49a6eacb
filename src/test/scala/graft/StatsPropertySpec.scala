package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-8 statistics operators against
  * brute-force in-memory oracles on random frames and partitionings:
  * Gini (exact rational recomputation + range bound), the regression
  * moments (BigInt two-pass covariance), and the histogram quantile
  * selection (sorted in-memory rank pick). Seeded generators,
  * deterministic run. */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val ts = Timestamp.valueOf("1995-01-01 00:00:00")

  // (custkey, 2-decimal order value) frames with repeated customers
  private val ordersGen: Gen[List[(Long, Double)]] = for {
    nCust <- Gen.chooseNum(2, 30)
    len <- Gen.chooseNum(2, 120)
    rows <- Gen.listOfN(len, for {
      ck <- Gen.chooseNum(1L, nCust.toLong)
      cents <- Gen.chooseNum(0L, 500000L)
    } yield (ck, cents / 100.0))
  } yield rows

  test("gini matches the exact rational formula and stays in [0, (n-1)/n]") {
    for ((rows, i) <- samples(ordersGen, 20, 0xBEEF01).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((ck, v), k) => (k.toLong, ck, ts, v) }
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .repartition(1 + i % 5)
      val (n, _, gini, top) = QueriesScale.revenueGiniOn(df)
        .select($"n_customers", $"total_revenue", $"gini", $"top_decile_permille")
        .as[(Long, Double, Double, Long)].head()
      // in-memory oracle on exact cents
      val cents = rows.groupBy(_._1).view
        .mapValues(_.map(r => math.round(r._2 * 100)).sum).toMap
      val xs = cents.toSeq.sortBy { case (ck, c) => (c, ck) }.map(_._2)
      val nn = xs.size
      assert(n == nn)
      val s0 = xs.map(BigInt(_)).sum
      val s1 = xs.zipWithIndex.map { case (x, k) => BigInt(k + 1) * x }.sum
      val expected =
        (BigInt(2) * s1 - BigInt(nn + 1) * s0).toDouble / (BigInt(nn) * s0).toDouble
      assert(gini == expected, s"frame $i: gini $gini != $expected")
      assert(gini >= 0.0 && gini <= (nn - 1).toDouble / nn + 1e-15, s"frame $i: $gini out of range")
      val topExpected = xs.takeRight(nn / 10).map(BigInt(_)).sum * 1000 / s0
      assert(top == topExpected.toLong, s"frame $i: top decile $top != $topExpected")
    }
  }

  // (group, x cents, y cents) regression frames
  private val xyGen: Gen[List[(Int, Long, Long)]] = for {
    len <- Gen.chooseNum(2, 150)
    rows <- Gen.listOfN(len, for {
      g <- Gen.chooseNum(0, 2)
      x <- Gen.chooseNum(0L, 10L)
      y <- Gen.chooseNum(100L, 5000L)
    } yield (g, x, y))
  } yield rows

  test("regression moments equal a BigInt two-pass oracle at any partitioning") {
    for ((rows, i) <- samples(xyGen, 20, 0xBEEF02).zipWithIndex) {
      val df = rows.map { case (g, x, y) => (s"g$g", x / 100.0, y / 100.0) }
        .toDF("l_returnflag", "l_discount", "l_quantity")
        .repartition(1 + i % 5)
      val out = QueriesAnalytics.discountCorrOn(df)
        .select($"l_returnflag", $"slope", $"pearson_r")
        .as[(String, Option[Double], Option[Double])].collect()
        .map { case (g, s, r) => g -> ((s, r)) }.toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val n = BigInt(grp.size)
        val sx = grp.map(r => BigInt(r._2)).sum
        val sy = grp.map(r => BigInt(r._3)).sum
        val sxy = grp.map(r => BigInt(r._2) * r._3).sum
        val sxx = grp.map(r => BigInt(r._2) * r._2).sum
        val syy = grp.map(r => BigInt(r._3) * r._3).sum
        val (cov, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        val (slope, r) = out(s"g$g")
        if (vx == 0) assert(slope.isEmpty && r.isEmpty, s"frame $i group $g")
        else {
          assert(slope.contains(cov.toDouble / vx.toDouble), s"frame $i group $g slope")
          if (vy == 0) assert(r.isEmpty)
          else assert(r.contains(cov.toDouble /
            (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))), s"frame $i group $g r")
        }
      }
    }
  }

  // latency frames: one order per line keeps the join trivial and the
  // day distribution arbitrary
  private val latencyGen: Gen[List[(String, Long)]] = for {
    len <- Gen.chooseNum(1, 200)
    rows <- Gen.listOfN(len, for {
      p <- Gen.oneOf("1-URGENT", "2-HIGH")
      d <- Gen.chooseNum(0L, 60L)
    } yield (p, d))
  } yield rows

  test("histogram quantiles equal sorted in-memory rank selection") {
    for ((rows, i) <- samples(latencyGen, 20, 0xBEEF03).zipWithIndex) {
      val orders = rows.zipWithIndex.map { case ((p, _), k) => (k.toLong, ts, p) }
        .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = rows.zipWithIndex.map { case ((_, d), k) =>
        (k.toLong, 1, new Timestamp(ts.getTime + d * 86400000L))
      }.toDF("l_orderkey", "l_linenumber", "l_shipdate").repartition(1 + i % 5)
      val out = QueriesAnalytics.shipLatencyOn(li, orders)
        .select($"o_orderpriority", $"n_lines", $"p50_days", $"p90_days", $"p99_days")
        .as[(String, Long, Long, Long, Long)].collect()
        .map { case (p, n, a, b, c) => p -> ((n, a, b, c)) }.toMap
      rows.groupBy(_._1).foreach { case (p, grp) =>
        val sorted = grp.map(_._2).sorted
        val n = sorted.size
        def at(pc: Int) = sorted(((pc * n + 99) / 100 - 1).max(0))
        assert(out(p) == ((n.toLong, at(50), at(90), at(99))), s"frame $i priority $p")
      }
    }
  }
}
