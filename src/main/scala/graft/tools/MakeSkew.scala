package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Skew-ADVERSARIAL twin of the sf1 testdata (VERDICT r13 item 7).
  * [[MakeSf1]]'s striding preserves the sf0.1 key distribution, so
  * the standard boards never exercise the skew machinery (AQE skew
  * split, salting, combinable-min aggregates). This twin plants the
  * hot spots a real 100 TB corpus has:
  *
  *  - **hot customer**: ~1% of orders re-keyed to ONE custkey
  *    (`o_orderkey % 100 == 7`) — the customer⋈orders join and every
  *    per-customer rollup see a key carrying ~15k rows at sf1;
  *  - **hot part**: ~1% of lineitem re-keyed to ONE partkey
  *    (`(l_orderkey * 7 + l_linenumber) % 100 == 13`) — ~60k rows on
  *    one join key at sf1;
  *  - **viral paragraph block**: 1% of documents (`doc_id % 100 ==
  *    42`) get a fixed 20-token block repeated `viralRepeats` times
  *    PREPENDED (block-aligned: the 20-token grain means each repeat
  *    IS one block), so one block hash reaches ~10⁵ multiplicity at
  *    sf1 (500 docs × 200) — the boilerplate banner case the
  *    combinable-min paragraph family claims to absorb, plus a dense
  *    500-doc true near-dup cluster for resolution;
  *  - **dominant source**: half of all documents re-labelled
  *    `src_hot` — the per-source prefix scans (selection, packing)
  *    and per-source aggregates see one cell holding half the corpus.
  *
  * Everything else copies verbatim, so unskewed queries are
  * comparable 1:1 against the plain sf1 board. Deterministic —
  * key-mod rules only, never rand(). Output is gitignored
  * (`testdata_skew/`), regenerable on demand. */
object MakeSkew {
  val DefaultSrc = "/root/repo/testdata_sf1"
  val DefaultOut = "/root/repo/testdata_skew"
  private val marker = "_SKEW_COMPLETE"

  val ViralBlock: String = (1 to 20).map(i => s"boiler$i").mkString(" ")

  def ensure(spark: SparkSession, src: String = DefaultSrc,
             out: String = DefaultOut, viralRepeats: Int = 200): String = {
    if (Files.exists(Paths.get(out, marker))) return out
    generate(spark, src, out, viralRepeats)
    out
  }

  def generate(spark: SparkSession, src: String, out: String, viralRepeats: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit =
      (if (files == 1) df.coalesce(1) else df.repartition(files))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    // verbatim copies
    Seq(("region", 1), ("nation", 1), ("customer", 1), ("supplier", 1),
      ("part", 1), ("embeddings", 32)).foreach { case (t, f) => write(read(t), t, f) }

    val hotCust = read("customer").agg(min("c_custkey")).head().getLong(0)
    val hotPart = read("part").agg(min("p_partkey")).head().getLong(0)

    write(read("orders")
      .withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(100)) === 7, lit(hotCust))
          .otherwise(col("o_custkey"))),
      "orders", 32)
    write(read("lineitem")
      .withColumn("l_partkey",
        when(pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(100)) === 13,
          lit(hotPart)).otherwise(col("l_partkey"))),
      "lineitem", 32)
    write(read("events"), "events", 32)

    val viral = (ViralBlock + " ") * viralRepeats
    write(read("documents")
      .withColumn("text",
        when(pmod(col("doc_id"), lit(100)) === 42, concat(lit(viral), col("text")))
          .otherwise(col("text")))
      .withColumn("source",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("src_hot")).otherwise(col("source")))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", 32)

    Files.createDirectories(Paths.get(out))
    Files.write(Paths.get(out, marker),
      s"src=$src viralRepeats=$viralRepeats hotCust=$hotCust hotPart=$hotPart\n".getBytes)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse(DefaultSrc)
    val out = args.lift(1).getOrElse(DefaultOut)
    val reps = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val t0 = System.nanoTime()
    val dir = ensure(spark, src, out, reps)
    println(f"[make_skew] $dir ready in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
