package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Diagnostic main: stage wall times of the co-purchase pipeline. */
object ProbeR6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val baskets = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .select("parts")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("baskets materialize")(println("  n = " + baskets.count()))
    val support = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
    time("support")(println("  n = " + support.count()))
    val pairList = flatten(transform(col("parts"), (x, i) =>
      transform(slice(col("parts"), i + lit(2), size(col("parts"))), y =>
        struct(x.as("p1"), y.as("p2")))))
    val pairs = baskets
      .select(explode(pairList).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 3)
    time("pairs")(println("  n = " + pairs.count()))
    time("full query") {
      graft.Queries.all("q_copurchase")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
