package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.DedupOps

/** Diagnostic main: measures, on real testdata, the recall margins of
  * the sketch-based candidate generators against the exact n-gram
  * Jaccard ground truth — the evidence behind the band/threshold
  * choices in QueriesText (see BENCH_NOTES).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
    // ground truth: exact pairs at jaccard>=50 over FULL gram sets
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", col("text"), 3, Int.MaxValue, 50)
      .select("doc1", "doc2", "jaccard_pct")
    println(s"TRUTH pairs: ${truth.count()}")

    // simhash hamming for the true pairs
    val hashes = DedupOps.simhashGrams(docs, "doc_id", col("text"), 3)
    val h1 = hashes.select(col("doc_id").as("doc1"), col("simhash").as("h1"))
    val h2 = hashes.select(col("doc_id").as("doc2"), col("simhash").as("h2"))
    val withHam = truth.join(h1, "doc1").join(h2, "doc2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
    println("SIMHASH hamming histogram of true pairs:")
    withHam.groupBy("hamming").count().orderBy("hamming").show(70)
    println("SIMHASH hamming by jaccard bucket:")
    withHam.groupBy((col("jaccard_pct") >= 90).as("j90"))
      .agg(max("hamming").as("max_ham"), count(lit(1)).as("n")).show()
    println("8x8-band hit for true pairs (guaranteed if hamming<=7):")
    val bh = withHam.withColumn("bandHit8", exists(
      sequence(lit(0), lit(7)),
      b => call_function("shiftright", col("h1"), (b * 8).cast("int")).bitwiseAND(lit(0xFFL)) ===
        call_function("shiftright", col("h2"), (b * 8).cast("int")).bitwiseAND(lit(0xFFL))))
    bh.groupBy("bandHit8").agg(count(lit(1)).as("n"), max("hamming").as("maxham"),
      min("jaccard_pct").as("minj")).show()
    bh.where(!col("bandHit8")).select("doc1", "doc2", "jaccard_pct", "hamming").show(30)
    println("4x16-band hit for true pairs:")
    val bh16 = withHam.withColumn("bandHit16", exists(
      sequence(lit(0), lit(3)),
      b => call_function("shiftright", col("h1"), (b * 16).cast("int")).bitwiseAND(lit(0xFFFFL)) ===
        call_function("shiftright", col("h2"), (b * 16).cast("int")).bitwiseAND(lit(0xFFFFL))))
    bh16.groupBy("bandHit16").agg(count(lit(1)).as("n"), max("hamming").as("maxham"),
      min("jaccard_pct").as("minj")).show()
    bh16.where(!col("bandHit16")).select("doc1", "doc2", "jaccard_pct", "hamming").show(30)

    // minhash (k=48, bands of 3): per true pair, does any band match?
    val sigs = DedupOps.minhashSignaturesNative(docs, "doc_id", col("text"), 3, 48)
    val s1 = sigs.select(col("doc_id").as("doc1"), col("sig").as("s1"))
    val s2 = sigs.select(col("doc_id").as("doc2"), col("sig").as("s2"))
    val eq = truth.join(s1, "doc1").join(s2, "doc2")
      .withColumn("matches",
        aggregate(zip_with(col("s1"), col("s2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (a, v) => a + v))
      .withColumn("bandHit", exists(
        sequence(lit(0), lit(15)),
        b => slice(col("s1"), b * 3 + 1, lit(3)) === slice(col("s2"), b * 3 + 1, lit(3))))
    println("MINHASH (k=48, 16 bands x 3): true pairs missing every band:")
    eq.where(!col("bandHit")).show(20)
    println("matching-seed-fraction histogram (of 48):")
    eq.groupBy((col("matches") / 8).cast("int").as("oct")).count().orderBy("oct").show()
    spark.stop()
  }
}
