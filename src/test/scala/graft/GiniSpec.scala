package graft

import java.sql.Timestamp

/** Unit coverage for the revenue-concentration operator (#94): the
  * Gini formula on hand-computed distributions, its two boundary
  * cases, and order-invariance of the distributed rank (the registry
  * query verifies it against DuckDB on the real testdata). */
class GiniSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("1995-01-01 00:00:00")

  private def giniOf(rows: Seq[(Long, Double)]): (Long, Double, Double, Long) = {
    val orders = rows.zipWithIndex
      .map { case ((ck, v), i) => (i.toLong, ck, ts, v) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    QueriesScale.revenueGiniOn(orders)
      .select($"n_customers", $"total_revenue", $"gini", $"top_decile_permille")
      .as[(Long, Double, Double, Long)].head()
  }

  test("perfect equality gives gini 0, top decile share = its headcount share") {
    val out = giniOf((1L to 20L).map(ck => ck -> 5.00))
    assert(out == ((20L, 100.0, 0.0, 100L)), out)
  }

  test("total concentration approaches (n-1)/n") {
    // 9 customers at 0.00, one holds everything
    val out = giniOf((1L to 9L).map(ck => ck -> 0.00) :+ (10L -> 70.00))
    assert(out._1 == 10L && out._3 == 0.9 && out._4 == 1000L, out)
  }

  test("hand-computed case: cents (1,2,3) gives gini 2/9") {
    val out = giniOf(Seq(1L -> 0.01, 2L -> 0.02, 3L -> 0.03))
    assert(out._1 == 3L)
    assert(math.abs(out._3 - 2.0 / 9.0) < 1e-15, out)
    // n < 10 -> decile headcount 0 -> share 0
    assert(out._4 == 0L)
  }

  test("multi-order customers aggregate before ranking; input order is irrelevant") {
    val base = Seq(1L -> 10.00, 1L -> 20.00, 2L -> 30.00, 3L -> 15.00, 3L -> 15.00)
    val a = giniOf(base)
    val b = giniOf(scala.util.Random.shuffle(base))
    assert(a == b)
    // three customers all at 30.00 -> equality
    assert(a._3 == 0.0, a)
  }
}
