package graft.tools

import graft.GraftSession
import graft.plans.ExpandFreeDistinct

/** Measure the Expand-free multi-distinct rewrite on real data: the
  * same 3-distinct aggregate over lineitem with the rule off (Spark's
  * Expand plan) and on, 3 runs each. Usage:
  * runMain graft.tools.DistinctRewriteProbe [sfDir] */
object DistinctRewriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val sql =
      """SELECT count(DISTINCT l_orderkey) AS d1, count(DISTINCT l_partkey) AS d2,
        |       count(DISTINCT l_suppkey) AS d3, sum(l_quantity) AS q, count(1) AS n
        |FROM lineitem""".stripMargin
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(tag: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      println(f"[$tag run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
    }
    spark.conf.set(ExpandFreeDistinct.ConfKey, "false")
    println("plan(off) has Expand: " +
      spark.sql(sql).queryExecution.executedPlan.toString.contains("Expand"))
    run("expand")
    spark.conf.unset(ExpandFreeDistinct.ConfKey)
    println("plan(on) has Expand: " +
      spark.sql(sql).queryExecution.executedPlan.toString.contains("Expand"))
    run("rewrite")
    spark.stop()
  }
}
