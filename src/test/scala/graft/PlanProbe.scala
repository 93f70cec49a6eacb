package graft

/** Dump formatted plans for key queries (plan-quality review). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.local(4)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pricing_summary", "q_gold_enriched", "q_incremental_read", "q_top_products")
    names.foreach { n =>
      println(s"========== $n ==========")
      Queries.all(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
