package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Cut-THRASH twin corpus for the composed release-lifecycle soak
  * (VERDICT r16 item 1). The standard sf1 documents leave the
  * admission threshold nearly static across ingest batches, so the
  * delta-selection machinery's hard paths — stratum-crossing cuts,
  * standing evictions, re-admits, tombstone debt, the policy-fired
  * compaction — barely fire. This corpus engineers them to fire EVERY
  * batch:
  *
  *  - two quality strata by construction: HIGH docs score exactly 100
  *    (one stopword every 4th token → stop ratio 25%), LOW docs score
  *    exactly 75 (exactly two stopwords → stop score 0); every doc is
  *    300 words, so stratum mass == doc count and the #145 half-mass
  *    budget sits wherever the H/L composition puts it;
  *  - batch k (size B) carries `B/2 + 2A` HIGH docs when k is odd and
  *    `B/2 - 2A` when even (A = B/10; batch 1 seeds +A), so the
  *    CUMULATIVE high-stratum share is exactly 50% ± A docs — above
  *    half after odd batches (cut = 100: every LOW doc evicted, the
  *    HIGH stratum boundary-refined), below half after even ones
  *    (cut = 75: all HIGH in, LOW boundary-refined). The admission
  *    cut CROSSES a stratum boundary on every single batch, with an
  *    A-doc (=400) margin on both sides so the verdict never sits on a
  *    knife edge, and per-cycle churn stays a few percent of the
  *    corpus — churn-proportional patches are checkable;
  *  - a HOT SOURCE: half of all docs land in `src_hot` (the rest
  *    split `src_a`/`src_b`), so per-source prefix scans (selection,
  *    packing) and the water-fill allocation carry one cell holding
  *    half the corpus — the skew posture — and copy-count margins
  *    shift every batch;
  *  - every token is doc-unique (`d<id>w<j>`) except the stopword:
  *    zero exact dups, zero near-dup candidates, zero shared
  *    paragraph blocks, zero retractions — so the per-cycle
  *    equivalence check must come back EXACTLY equal, and every
  *    mismatch is a real bug, never first-arrival drift.
  *
  * Funnel admission holds for both strata: ≥20 words, ≥100 chars,
  * stop_hits > 0, no repeated trigram (unique tokens), en prediction
  * (the stopword is the only language marker). Deterministic — pure
  * functions of doc_id, never rand(). Output is gitignored
  * (`testdata_thrash/`), regenerable on demand.
  *
  * Batch boundaries for the soak: upTo = k·B − 1 for k = 1..batches
  * (ids are 0-based), e.g. B=4000 → 3999 7999 11999 ... 43999 rest.
  */
object MakeThrash {
  val DefaultOut = "/root/repo/testdata_thrash"
  private val marker = "_THRASH_COMPLETE"

  val Batches = 12
  val PerBatch = 4000L
  /** Cumulative high-share amplitude in docs (±A around half). */
  val Amplitude: Long = PerBatch / 10L

  /** HIGH docs in batch k (1-based): cumHigh_k − cumHigh_{k−1} with
    * cumHigh_k = k·B/2 + (−1)^(k+1)·A. */
  def highsInBatch(k: Int, b: Long = PerBatch, a: Long = Amplitude): Long =
    cumHigh(k, b, a) - cumHigh(k - 1, b, a)
  def cumHigh(k: Int, b: Long = PerBatch, a: Long = Amplitude): Long =
    if (k <= 0) 0L else k * b / 2L + (if (k % 2 == 1) a else -a)

  def ensure(spark: SparkSession, out: String = DefaultOut): String = {
    if (Files.exists(Paths.get(out, marker))) return out
    generate(spark, out)
    out
  }

  def generate(spark: SparkSession, out: String): Unit = {
    val b = PerBatch
    val ids = spark.range(0L, Batches * b, 1L, 32).select(col("id").as("doc_id"))
    // batch index (1-based) and position inside the batch
    val base = ids
      .withColumn("__k", (col("doc_id") / b).cast("long") + 1L)
      .withColumn("__j", pmod(col("doc_id"), lit(b)))
    // HIGH iff the Bresenham interleave admits position j among the
    // batch's nH highs: floor((j+1)·nH/B) > floor(j·nH/B) — spreads
    // the highs evenly through the id range so the within-stratum
    // doc_id-ordered boundary prefix cuts through every batch
    val nH = {
      // per-batch high counts as a small broadcast lookup column
      val entries = (1 to Batches).map(k => (k.toLong, highsInBatch(k)))
      val m = map(entries.flatMap { case (k, n) => Seq(lit(k), lit(n)) }: _*)
      m(col("__k"))
    }
    val withKind = base
      .withColumn("__nH", nH)
      .withColumn("__high",
        ((col("__j") + 1L) * col("__nH") / b).cast("long") >
          (col("__j") * col("__nH") / b).cast("long"))
    // 300 tokens per doc; HIGH: every 4th token "the" (stop ratio 25%
    // → score 100); LOW: tokens 0 and 150 "the" (stop score 0 → 75).
    // All other tokens are doc-unique d<id>w<j>.
    val text = concat_ws(" ", transform(sequence(lit(0), lit(299)), j =>
      when(col("__high") && pmod(j, lit(4)) === 0, lit("the"))
        .when(!col("__high") && (j === 0 || j === 150), lit("the"))
        .otherwise(concat(lit("d"), col("doc_id"), lit("w"), j))))
    val docs = withKind
      .withColumn("text", text)
      .withColumn("lang", lit("en"))
      .withColumn("source",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("src_hot"))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit("src_a"))
          .otherwise(lit("src_b")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "lang", "source", "n_chars", "text")
    docs.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    Files.createDirectories(Paths.get(out))
    Files.write(Paths.get(out, marker),
      s"batches=$Batches perBatch=$b amplitude=$Amplitude tokensPerDoc=300\n".getBytes)
  }

  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse(DefaultOut)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val t0 = System.nanoTime()
    val dir = ensure(spark, out)
    // sanity print: per-batch high counts and the cumulative share
    (1 to Batches).foreach { k =>
      val c = cumHigh(k)
      println(f"[make_thrash] batch $k%2d highs=${highsInBatch(k)}%5d cumHigh=$c%6d " +
        f"cumShare=${c * 100.0 / (k * PerBatch)}%.2f%% cut=${if (c * 2 > k * PerBatch) 100 else 75}")
    }
    println(f"[make_thrash] $dir ready in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
