package graft

import org.apache.spark.sql.functions._
import graft.operators.Gold
import graft.functions.Money

class GoldSpec extends SparkSpec {
  import spark.implicits._

  test("starJoin broadcast-hints dimensions (plan shows BroadcastHashJoin)") {
    val plan = QueriesEtl.goldEnriched(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("entityMetrics computes exact sums and half-up averages") {
    val fact = Seq(
      (1L, 100.01, "2024-01-01"), (1L, 100.02, "2024-02-01"),
      (2L, 50.00, "2024-03-01")
    ).toDF("k", "amt", "d").withColumn("d", $"d".cast("date"))
    val m = Gold.entityMetrics(fact, "k", $"amt", $"d")
      .select("k", "total_orders", "total_spent", "avg_order_value")
      .as[(Long, Long, Double, Double)].collect().toMap2
    assert(m(1L) == ((2L, 200.03, 100.02))) // 100.015 rounds half-up to 100.02
    assert(m(2L) == ((1L, 50.00, 50.00)))
  }

  test("monthlyMart groups by calendar month") {
    val out = Gold.monthlyMart(Tables.orders(spark, sf), "o_custkey", col("o_orderdate"), col("o_totalprice"))
    val monthly = out.select(date_format($"sales_month", "dd HH:mm").as("t")).distinct().as[String].collect()
    assert(monthly.forall(_ == "01 00:00")) // truncated to month starts
  }

  test("money sums are partitioning-independent") {
    val o = Tables.orders(spark, sf)
    val s1 = o.repartition(1).agg(Money.sumExact($"o_totalprice")).as[Double].head()
    val s17 = o.repartition(17).agg(Money.sumExact($"o_totalprice")).as[Double].head()
    assert(s1 == s17) // bit-identical, not just close
  }

  implicit class MapOps[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
