package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.{DedupOps, TextOps}

/** Diagnostic main: stage wall times inside q_dedup_incremental. */
object ProbeR6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val isNew = pmod(col("doc_id"), lit(10)) === 7
    val sigsAll = DedupOps.minhashSignaturesNative(docs, "doc_id", col("text"), n = 3, k = 48)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sig materialize")(sigsAll.count())
    val cands = time("lsh across + reap") {
      graft.Caching.reap(
        DedupOps.minhashLshPairsAcross(
          sigsAll.where(isNew), sigsAll.where(!isNew), "doc_id", k = 48, bands = 24, minEst = 0.25)
      )(sigsAll)
    }
    time("gramsets only") {
      println("  gs = " + DedupOps.wordGramHashSets(docs, "doc_id", col("text"), 3)
        .agg(sum(size(col("__grams")))).collect().mkString)
    }
    val v = DedupOps.verifyPairsExact(cands, docs, "doc_id", col("text"), 3, 50)
    time("verify explain")(v.explain("formatted"))
    time("verify run")(println("  verified = " + v.count()))
    spark.stop()
  }
}
