package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.vector.Ivf

/** Diagnostic main: the [[Ivf.recallReport]] tuning table on real
  * testdata — what recall each nprobe buys on this corpus's embedding
  * distribution (near-orthogonal vectors are the HARD case for IVF:
  * lists barely separate, so low nprobe recall here is a floor, not a
  * ceiling). Pass `clustered[:n[:dim[:clusters]]]` as the first arg to
  * run on [[MakeClustered]]'s deterministic clustered twin instead —
  * the distribution IVF exists for; the two tables together are the
  * operator's honest tuning input (recall ≈ scan fraction on the
  * orthogonal floor, recall ≫ scan fraction when lists carry signal).
  * Usage: runMain graft.tools.IvfRecallProbe [sfDir|clustered[:n:dim:c]] [k] */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    implicit val s: org.apache.spark.sql.SparkSession = spark
    spark.sparkContext.setLogLevel("WARN")
    val emb =
      if (dir.startsWith("clustered")) {
        val p = dir.split(":")
        MakeClustered.frame(spark,
          n = p.lift(1).map(_.toLong).getOrElse(20000L),
          dim = p.lift(2).map(_.toInt).getOrElse(64),
          clusters = p.lift(3).map(_.toInt).getOrElse(16))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      } else Tables.embeddings(spark, dir)
    val n = emb.count()
    val index = Ivf.build(emb, "vec_id", "embedding", k = k, iters = 2)
    // deterministic ~2% sample; PRIME step so it cannot alias with
    // MakeClustered's vec_id-mod-clusters axis assignment (a step
    // sharing a factor with the cluster count samples a cluster
    // subset and measures only those router buckets)
    val qs = emb.where(col("vec_id") % 53 === 0)
    val rep = Ivf.recallReport(index, qs, "vec_id", "embedding",
      topK = 10, nprobes = Seq(1, 2, 4, 8, k))
    println(s"corpus=$dir n=$n lists=$k queries=${qs.count()} topK=10")
    println("| nprobe | recall_permille | scanned fraction ≈ nprobe/k |")
    println("|---|---|---|")
    rep.orderBy("nprobe").collect().foreach { r =>
      println(f"| ${r.getAs[Int]("nprobe")} | ${r.getAs[Long]("recall_permille")} " +
        f"| ${r.getAs[Int]("nprobe").toDouble / k}%.2f |")
    }
    index.release()
    spark.stop()
  }
}
