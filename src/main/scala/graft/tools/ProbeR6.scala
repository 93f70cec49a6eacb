package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.DedupOps

/** Diagnostic main: wordGramHashes plan shape + ngram-jaccard time. */
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
    val g = DedupOps.wordGramHashes(docs, "doc_id", col("text"), 3)
    g.explain("formatted")
    time("gram count")(println("  n = " + g.count()))
    time("ngram jaccard") {
      println("  pairs = " + graft.Queries.all("q_ngram_jaccard")(spark, dir).count())
    }
    spark.stop()
  }
}
