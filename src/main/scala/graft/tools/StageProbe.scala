package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.DedupOps

/** Diagnostic main: per-stage row counts and wall times of the
  * sketch-dedup pipelines (band-join volume vs verified pairs). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val hashes = DedupOps.simhashGrams(docs, "doc_id", col("text"), 3)
    time("simhash cands (16x4, d<=12)") {
      val c = DedupOps.simhashPairs(hashes, "doc_id", maxDist = 12, bands = 16)
      println("  n_cands = " + c.count())
      time("  verify") {
        println("  verified = " +
          DedupOps.verifyPairsExact(c, docs, "doc_id", col("text"), 3, 50).count())
      }
    }
    val h128 = DedupOps.simhashGrams128(docs, "doc_id", col("text"), 3)
    time("simhash cands (16x8/128b, d<=31)") {
      val c = DedupOps.simhashPairs128(h128, "doc_id", maxDist = 31, bands = 16)
      println("  n_cands = " + c.count())
    }
    time("simhash raw band collisions (pre-hamming-gate)") {
      // the quadratic floor term: chance band-key collisions the
      // hamming xor kills before the distinct. Expected n²·b/2^(w+1)
      // for uniform keys — measured here because real band keys
      // concentrate (templated corpora), so algebra underestimates
      val banded = h128.select(col("doc_id"),
        explode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(15)),
          b => struct(b.as("band"),
            call_function("shiftright",
              when(b < 8, col("simhash0")).otherwise(col("simhash1")),
              (when(b < 8, b).otherwise(b - 8) * 8).cast("int"))
              .bitwiseAND(lit(0xFFL)).as("bkey")))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      val n = banded.groupBy("band", "bkey").count()
        .agg(sum(col("count") * (col("count") - 1))).head.getLong(0) / 2
      println("  n_collision_pairs = " + n)
    }
    val sigs = DedupOps.minhashSignaturesNative(docs, "doc_id", col("text"), 3, 48)
    time("minhash cands (16x3, est>=.25)") {
      val c = DedupOps.minhashLshPairs(sigs, "doc_id", k = 48, bands = 16, minEst = 0.25)
      println("  n_cands = " + c.count())
    }
    spark.stop()
  }
}
