package graft.tools

import graft.GraftSession

/** Generic per-query diagnostic: time any registered query and
  * optionally dump its formatted plan.
  *
  * Usage: runMain graft.tools.QueryProbe <query_name> [sfDir] [explain]
  *        [conf:key=value ...]   (session confs, e.g. variant flips)
  *
  * Timing matches Bench (noop sink, warm session, storage hygiene
  * between runs); three runs are printed so a GC pause or cold cache
  * is visible instead of silently folded into one number. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <query_name> [sfDir] [explain]")
    val name = args(0)
    val dir = args.lift(1).filterNot(a => a.startsWith("conf:") || a == "explain")
      .getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("explain")
    val spark = GraftSession.local(32)
    args.filter(_.startsWith("conf:")).map(_.stripPrefix("conf:").split("=", 2))
      .foreach { case Array(k, v) => spark.conf.set(k, v) }
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = graft.Queries.all.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.Queries.all.keys.toSeq.sorted.mkString(", ")}"))
    if (explain) fn(spark, dir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
