package graft.tools

import graft.GraftSession
import graft.operators.SalesPipelineDag

/** CLI driver for the batch medallion DAG — the `run_pipeline` shell
  * entry of the reference, minus the shell: builds the job graph over
  * `sfDir` and executes it into `root`, printing the Airflow-style
  * report table (status, attempts, wall millis, row metric per job).
  *
  * Usage: runMain graft.tools.RunPipeline [sfDir] [root] [maxParallel]
  * Exit code 1 when any job failed or was skipped. */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val maxParallel = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val g = SalesPipelineDag.build(spark, sfDir, SalesPipelineDag.Layout(root))
    val reports = g.runConcurrent(maxParallel)
    println(f"${"job"}%-22s ${"status"}%-28s ${"tries"}%5s ${"ms"}%8s ${"rows"}%10s")
    reports.foreach { r =>
      val st = r.status match {
        case graft.operators.JobGraph.Succeeded => "ok"
        case graft.operators.JobGraph.Failed(e) => s"FAILED: ${e.getMessage.take(40)}"
        case graft.operators.JobGraph.Skipped(b) => s"skipped (${b.mkString(",")})"
      }
      println(f"${r.id}%-22s $st%-28s ${r.attempts}%5d ${r.millis}%8d ${r.metric}%10d")
    }
    println(s"layout: $root")
    spark.stop()
    if (!g.allOk(reports)) sys.exit(1)
  }
}
