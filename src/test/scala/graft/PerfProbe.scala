package graft

/** Warm-timing probe: runs named queries twice in one session and
  * prints cold/warm timings. Usage:
  *   sbt "Test/runMain graft.PerfProbe <sfDir> <query...>"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Queries.all.keys.toSeq.sorted
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    names.foreach { n =>
      val q = Queries.all(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n%-24s cold=${times(0)}%6.2fs warm=${times(1)}%6.2fs")
    }
    spark.stop()
  }
}
