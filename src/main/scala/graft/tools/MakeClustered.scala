package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embedding corpus — the IVF recall twin of
  * [[MakeSkew]] (VERDICT r14 item 5). The driver testdata's embeddings
  * are near-orthogonal (pairwise cosine ≈ 0), which is IVF's measured
  * WORST case: lists barely separate, the router has no signal, and
  * recall ≈ the scanned fraction (BENCH_NOTES r14 table). Real-world
  * embedding corpora are clustered — topical/semantic structure is
  * exactly what IVF exploits — so the honest recall story needs a
  * measured table on BOTH distributions. This generator produces the
  * clustered one, with zero randomness (reruns are bit-identical):
  * `clusters` tight clusters on distinct coordinate axes, each member
  * the axis unit vector plus a small deterministic per-coordinate
  * perturbation (within-cluster cosine ≈ 0.97+, across ≈ 0.1).
  *
  * Generation is a map-only `range` projection — no driver loop, no
  * collect; scale the row count freely. */
object MakeClustered {

  /** `n` vectors of `dim` float dims in `clusters` clusters
    * (clusters ≤ dim required — one axis per cluster). */
  def frame(s: SparkSession, n: Long, dim: Int, clusters: Int): DataFrame = {
    require(clusters <= dim, s"clusters ($clusters) must be <= dim ($dim)")
    s.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val axis = pmod(col("id"), lit(clusters.toLong))
        val base = when(d.cast("long") === axis, lit(1.0d)).otherwise(lit(0.0d))
        val perturb = (pmod(col("id") * 31L + d.cast("long") * 7L, lit(11L)) - lit(5L))
          .cast("double") * lit(0.02d)
        (base + perturb).cast("float")
      }).as("embedding"))
  }

  /** Write a clustered corpus as parquet (the probe-at-scale path).
    * Usage: runMain graft.tools.MakeClustered <outDir> [n] [dim] [clusters] */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MakeClustered <outDir> [n] [dim] [clusters]")
    val out = args(0)
    val n = args.lift(1).map(_.toLong).getOrElse(20000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val clusters = args.lift(3).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    frame(spark, n, dim, clusters)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote $n clustered vectors (dim=$dim, clusters=$clusters) to $out")
    spark.stop()
  }
}
