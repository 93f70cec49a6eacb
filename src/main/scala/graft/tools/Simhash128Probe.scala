package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.DedupOps

/** Diagnostic main: measures, on real testdata, the 128-bit SimHash
  * hamming distances of the exact J>=50 ground-truth pairs — the
  * evidence behind the band geometry of `simhashPairs128` (the
  * pigeonhole bound `maxDist < bands` only yields full recall if every
  * true pair's 128-bit distance fits the budget; distances scale with
  * fingerprint width, so the 64-bit corpus margin cannot be assumed).
  *
  * Usage: runMain graft.tools.Simhash128Probe [sfDir ...]
  */
object Simhash128Probe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local(16)
    for (dir <- dirs) {
      println(s"=== $dir ===")
      val docs = Tables.documents(spark, dir)
      val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", col("text"), 3, Int.MaxValue, 50)
        .select("doc1", "doc2", "jaccard_pct")
      val hashes = DedupOps.simhashGrams128(docs, "doc_id", col("text"), 3)
      val a = hashes.select(col("doc_id").as("doc1"),
        col("simhash0").as("a0"), col("simhash1").as("a1"))
      val b = hashes.select(col("doc_id").as("doc2"),
        col("simhash0").as("b0"), col("simhash1").as("b1"))
      val d = truth.join(a, "doc1").join(b, "doc2")
        .withColumn("d0", bit_count(col("a0").bitwiseXOR(col("b0"))))
        .withColumn("d1", bit_count(col("a1").bitwiseXOR(col("b1"))))
        .withColumn("d128", col("d0") + col("d1"))
      println(s"truth pairs: ${d.count()}")
      println("per-half and total distance extremes:")
      d.agg(max("d0").as("max_d0"), max("d1").as("max_d1"), max("d128").as("max_d128"),
        expr("percentile(d128, 0.99)").as("p99_d128")).show()
      println("d128 histogram:")
      d.groupBy("d128").count().orderBy("d128").show(130)
      println("worst pairs (d128 desc):")
      d.orderBy(col("d128").desc).select("doc1", "doc2", "jaccard_pct", "d0", "d1", "d128").show(15)
      println("16x8-band (over 128 bits) hit for true pairs — guaranteed iff d128 <= 15:")
      def bandHit(h1a: org.apache.spark.sql.Column, h2a: org.apache.spark.sql.Column,
                  h1b: org.apache.spark.sql.Column, h2b: org.apache.spark.sql.Column) =
        exists(sequence(lit(0), lit(7)), k =>
          call_function("shiftright", h1a, (k * 8).cast("int")).bitwiseAND(lit(0xFFL)) ===
            call_function("shiftright", h2a, (k * 8).cast("int")).bitwiseAND(lit(0xFFL))) ||
        exists(sequence(lit(0), lit(7)), k =>
          call_function("shiftright", h1b, (k * 8).cast("int")).bitwiseAND(lit(0xFFL)) ===
            call_function("shiftright", h2b, (k * 8).cast("int")).bitwiseAND(lit(0xFFL)))
      val bh = d.withColumn("hit", bandHit(col("a0"), col("b0"), col("a1"), col("b1")))
      bh.groupBy("hit").agg(count(lit(1)).as("n"), max("d128").as("max_d128"),
        min("jaccard_pct").as("min_j")).show()
      bh.where(!col("hit")).select("doc1", "doc2", "jaccard_pct", "d0", "d1", "d128").show(30)
    }
    spark.stop()
  }
}
