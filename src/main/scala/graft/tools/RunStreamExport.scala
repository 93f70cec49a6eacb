package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.CorpusStream

/** Streaming export-posture rehearsal: full cut vs patch, MEASURED.
  *
  * The spec pins the patch posture's semantics on a toy corpus; this
  * harness drives both postures over the cut-thrash corpus
  * ([[MakeThrash]] — the admission cut crosses a stratum boundary on
  * every batch, so evictions and re-admits fire every cycle) and
  * reports, per cycle: the patch's add rows + tombstones vs the full
  * cut's release rows, both wall times, and a symmetric-diff
  * equality check of `exportPatchView` against the full-cut
  * artifact. The claim under test is the batch side's, restated for
  * streams: a changed cycle's WRITE volume is churn-proportional
  * (flips + new docs), never corpus-proportional, while replaying
  * the patch layers reconstructs the full artifact exactly.
  *
  * Layout: two sibling roots (`<out>/patch`, `<out>/full`) each
  * carrying identical `clean/batch_v*` + `ledger/batch_v*` layers
  * (written per cycle from the corpus, scored the same way the
  * streaming ledger step scores), so each posture runs on its own
  * checkpointless stand-in of the post-funnel state — this rehearses
  * the EXPORT TAIL, not the funnel (the funnel has its own specs and
  * the MemoryStream twins).
  *
  * usage: runMain graft.tools.RunStreamExport [outDir] [corpusDir]
  * (corpus defaults to [[MakeThrash.ensure]]'s; out to /tmp). Exits
  * nonzero on any per-cycle equality mismatch.
  */
object RunStreamExport {
  private val cleanDdl =
    "doc_id BIGINT, lang STRING, source STRING, n_paras BIGINT, n_kept BIGINT, text STRING"

  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/stream_export_rehearsal")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val corpus = args.lift(1).getOrElse(MakeThrash.ensure(spark))
    val docs = spark.read.parquet(s"$corpus/documents.parquet")
      .select("doc_id", "lang", "source", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val roots = Seq(s"$out/patch", s"$out/full")
    roots.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    val Seq(patchL, fullL) = roots.map(CorpusStream.Layout)

    val b = MakeThrash.PerBatch
    val n = MakeThrash.Batches
    val exCols = Seq("doc_id", "copy_id", "lang", "source", "split", "n_words", "text")
    var mismatches = 0
    println(f"[stream_export] corpus=$corpus cycles=$n perBatch=$b")
    println("| cycle | patch adds | patch tombs | patch wall s | full rows | full wall s | view==full |")
    println("|---|---|---|---|---|---|---|")
    (1 to n).foreach { k =>
      val batch = docs
        .where(col("doc_id") >= (k - 1) * b && col("doc_id") < k.toLong * b)
        .select(col("doc_id"), col("lang"), col("source"),
          lit(1L).as("n_paras"), lit(1L).as("n_kept"), col("text"))
      roots.foreach { r =>
        batch.write.mode("overwrite").parquet(s"$r/clean/batch_v$k")
        // the cumulative score cells, exactly as the streaming ledger
        // step accumulates them (latest() takes max per cell)
        val all = spark.read.schema(
          org.apache.spark.sql.types.StructType.fromDDL(cleanDdl))
          .parquet(s"$r/clean/batch_v*")
        graft.QueriesText.scoredTokens(all.select("doc_id", "text"))
          .groupBy("quality_score")
          .agg(sum("n_words").as("token_mass"), count(lit(1)).as("n_docs"))
          .write.mode("overwrite").parquet(s"$r/ledger/batch_v$k")
      }
      val t0 = System.nanoTime()
      val pAdds = CorpusStream.exportPatchStep(spark, patchL, k.toLong)
      val pWall = (System.nanoTime() - t0) / 1e9
      val tombs = spark.read.parquet(s"${patchL.exportPatchTombs}/cycle=$k").count()
      val t1 = System.nanoTime()
      val fRows = CorpusStream.exportStep(spark, fullL, k.toLong)
      val fWall = (System.nanoTime() - t1) / 1e9
      val pv = CorpusStream.exportPatchView(spark, patchL)
        .select(exCols.map(col): _*)
      val fv = spark.read.parquet(s"${fullL.export}/cycle=$k")
        .select(exCols.map(col): _*)
      val missing = fv.exceptAll(pv).count()
      val extra = pv.exceptAll(fv).count()
      val ok = missing == 0 && extra == 0
      if (!ok) mismatches += 1
      println(f"| $k%2d | $pAdds%6d | $tombs%5d | $pWall%6.1f | $fRows%6d | $fWall%6.1f | " +
        (if (ok) "OK" else s"MISMATCH missing=$missing extra=$extra") + " |")
    }
    docs.unpersist(blocking = false)
    println(s"[stream_export] mismatched cycles: $mismatches" +
      (if (mismatches == 0) " — ALL OK" else " — FAILURES ABOVE"))
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
