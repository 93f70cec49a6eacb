package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.operators.{CorpusIncrementalDag, CorpusPipelineDag}

/** Drive [[CorpusIncrementalDag]] cycles from the shell — the scale
  * rehearsal harness for the incremental release path (each arg after
  * the two dirs is one batch boundary; a final unbounded cycle picks
  * up the rest).
  *
  * Usage: `runMain graft.tools.RunIncremental <sfDir> <root> [upTo...]`
  * e.g. `runMain graft.tools.RunIncremental /root/repo/testdata_sf1
  * /tmp/inc_sf1 24999` → batch 1 = doc_id ≤ 24999, batch 2 = rest.
  *
  * `SPARK_GRAFT_INC_MODE=delta` runs the [[CorpusSelectionDelta]]
  * selection path instead of the per-batch full rebuild — the
  * rehearsal that shows the selection chain's cycle wall dropping to
  * batch-proportional; the equivalence check then compares the delta
  * VIEWS against the full rebuild (packs content-equal, ids
  * batch-sequential by design).
  *
  * `SPARK_GRAFT_INC_SNAPSHOT=N` (delta mode): roll the narrow op
  * ledgers up once the unsnapshotted tail reaches N batches. Unset =
  * the DAG default (ON at [[CorpusIncrementalDag.defaultSnapshotEvery]]);
  * 0 = explicitly unbounded.
  *
  * `SPARK_GRAFT_INC_CHECK=1`: after ALL cycles, run the full rebuild
  * on the same corpus and diff the release layers/views.
  * `SPARK_GRAFT_INC_CHECK=every` (the r16 soak posture): run that
  * diff after EVERY cycle, against a full rebuild of the corpus
  * bounded at the cycle's committed watermark (the bounded twin is
  * materialized per cycle — corpus-proportional, which is the point:
  * the check is the oracle, the delta run is the engine).
  *
  * The scheduler branch (VERDICT r15 item 1): before each delta
  * cycle, a standing rebuild flag ([[CorpusIncrementalDag
  * .rebuildRequested]] — raised by the release policy on retractions
  * or dead-token debt) triggers [[CorpusIncrementalDag
  * .runCompaction]] INSTEAD of proceeding straight to the next
  * incremental batch: packs/export/payloads are rewritten contiguous,
  * the delta ledgers rebase onto a fresh generation of the compacted
  * release, the pointer flips, the flag clears, and the cycle then
  * runs on the compacted base. */
object RunIncremental {

  /** Diff the incremental release (layers + delta views at the
    * committed watermark) against a full rebuild at `fullRoot` built
    * from `corpusDir`. Symmetric exceptAll — both directions must be
    * empty. Returns the number of mismatched layers. */
  def equivalenceCheck(spark: SparkSession, corpusDir: String, root: String,
                       fullRoot: String, delta: Boolean, tag: String): Int = {
    val t0 = System.nanoTime()
    val rf = CorpusPipelineDag.run(spark, corpusDir, fullRoot)
    val okJobs = rf.count(_.status == graft.operators.JobGraph.Succeeded)
    println(f"[$tag] full rebuild wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"statuses=$okJobs/${rf.size} ok")
    // the diff is meaningless without its oracle — a failed rebuild
    // must fail the check, not print OK rows against garbage (r17)
    require(okJobs == rf.size,
      s"[$tag] oracle full rebuild FAILED ($okJobs/${rf.size} jobs succeeded)")
    val li = CorpusIncrementalDag.Layout(root)
    val lf = CorpusPipelineDag.Layout(fullRoot)
    val dl = graft.operators.CorpusSelectionDelta.Layers.active(spark, root)
    // committed-state read: out-of-band view consumers pass the
    // release watermark, never the in-flight MaxValue default
    val mark = CorpusIncrementalDag.releaseWatermark(li)
    val layers: Seq[(String, () => org.apache.spark.sql.DataFrame, String, Seq[String])] =
      if (delta) Seq(
        ("flags", () => spark.read.parquet(li.flags), lf.flags,
          Seq("doc_id", "lang", "source", "n_words", "r0", "r1", "r2", "r3")),
        ("clean", () => spark.read.parquet(li.clean), lf.clean,
          Seq("doc_id", "lang", "source", "n_paras", "n_kept", "text")),
        ("selected(view)", () => graft.operators.CorpusSelectionDelta.selectedView(spark, dl, mark),
          lf.selected, Seq("doc_id", "lang", "source", "quality_score", "n_words", "text")),
        ("mixture(view)", () => graft.operators.CorpusSelectionDelta.mixtureView(spark, dl, mark),
          lf.mixture, Seq("doc_id", "lang", "source", "n_words", "copy_id")),
        ("export(view)", () => graft.operators.CorpusSelectionDelta.exportView(spark, dl, mark),
          lf.export, Seq("doc_id", "copy_id", "lang", "source", "split", "n_words", "text")),
        ("packs(content)", () => graft.operators.CorpusSelectionDelta.packsLive(spark, dl, mark),
          lf.packs, Seq("doc_id", "copy_id", "source", "n_words")))
      else Seq(
        ("flags", () => spark.read.parquet(li.flags), lf.flags,
          Seq("doc_id", "lang", "source", "n_words", "r0", "r1", "r2", "r3")),
        ("clean", () => spark.read.parquet(li.clean), lf.clean,
          Seq("doc_id", "lang", "source", "n_paras", "n_kept", "text")),
        ("selected", () => spark.read.parquet(li.selected), lf.selected,
          Seq("doc_id", "lang", "source", "quality_score", "n_words", "text")),
        ("packs", () => spark.read.parquet(li.packs), lf.packs,
          Seq("doc_id", "copy_id", "source", "n_words", "pack_id", "pack_offset")),
        ("pack_payloads", () => spark.read.parquet(li.packPayloads), lf.packPayloads,
          Seq("source", "pack_id", "n_docs", "n_tokens", "payload")))
    var bad = 0
    layers.foreach { case (name, incRead, fullPath, cols) =>
      val inc = incRead().select(cols.map(col): _*)
      val full = spark.read.parquet(fullPath).select(cols.map(col): _*)
      val missing = full.exceptAll(inc).count()
      val extra = inc.exceptAll(full).count()
      val verdict = if (missing == 0 && extra == 0) "OK" else { bad += 1; "MISMATCH" }
      println(s"[$tag] $name: $verdict (missing=$missing extra=$extra rows=${full.count()})")
    }
    val retr = spark.read.parquet(li.retractions).count()
    println(s"[$tag] retraction ledger: $retr rows" +
      (if (retr > 0) " — first-arrival divergence, mismatches above are BY CONTRACT" else ""))
    bad
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunIncremental <sfDir> <root> [upTo...]")
    val sfDir = args(0)
    val root = args(1)
    val delta = sys.env.get("SPARK_GRAFT_INC_MODE").contains("delta")
    // unset = the DAG default (snapshots ON, VERDICT r16 item 5);
    // "0" = explicitly unbounded (the DAG warns past the tail bound)
    val snapEvery = sys.env.get("SPARK_GRAFT_INC_SNAPSHOT").map(_.toInt)
      .getOrElse(CorpusIncrementalDag.defaultSnapshotEvery)
    // rehearsal knob: tighten the dead-token bound (permille) so the
    // compaction branch can be driven deliberately at any SF
    val policy = sys.env.get("SPARK_GRAFT_INC_DEAD_PERMILLE")
      .map(b => CorpusIncrementalDag.ReleasePolicy(maxDeadTokenPermille = b.toLong))
      .getOrElse(CorpusIncrementalDag.ReleasePolicy())
    val checkMode = sys.env.getOrElse("SPARK_GRAFT_INC_CHECK", "")
    val bounds = args.drop(2).map(_.toLong).toSeq :+ Long.MaxValue
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val layout = CorpusIncrementalDag.Layout(root)
    var mismatches = 0
    bounds.zipWithIndex.foreach { case (upTo, i) =>
      if (delta && CorpusIncrementalDag.rebuildRequested(spark, layout)) {
        val t0 = System.nanoTime()
        val cr = CorpusIncrementalDag.runCompaction(spark, root)
        println(f"[cycle ${i + 1}] COMPACTION (rebuild flag standing) wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
        cr.foreach { r =>
          println(f"[cycle ${i + 1}]   ${r.id}%-22s ${r.status}%-12s ${r.millis / 1000.0}%8.2f s  metric=${r.metric}")
        }
      }
      val t0 = System.nanoTime()
      val reports =
        if (delta) CorpusIncrementalDag.runDelta(spark, sfDir, root, upTo,
          policy = policy, snapshotEvery = snapEvery)
        else CorpusIncrementalDag.run(spark, sfDir, root, upTo)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[cycle ${i + 1}] upTo=$upTo mode=${if (delta) "delta" else "rebuild"} wall=$wall%.1f s")
      reports.foreach { r =>
        println(f"[cycle ${i + 1}]   ${r.id}%-22s ${r.status}%-12s ${r.millis / 1000.0}%8.2f s  metric=${r.metric}")
      }
      if (delta) {
        // the ledger-growth signal (VERDICT r15 item 2's rehearsal
        // artifact): hive tail partitions per narrow ledger + whether
        // a snapshot base is standing — with SPARK_GRAFT_INC_SNAPSHOT
        // the tail stays bounded as cycles accumulate
        val L = graft.operators.CorpusSelectionDelta.Layers.active(spark, root)
        val counts = Seq("verdicts" -> L.verdicts, "mix" -> L.mixDelta,
          "cells" -> L.cells, "heads" -> L.packHeads,
          "packs" -> L.packsDelta, "index" -> L.docIndex).map { case (n, p) =>
          val tail = graft.operators.CorpusSelectionDelta.tailPartitions(spark, p)
          val snap = graft.operators.CorpusSelectionDelta.latestSnap(spark, p)
            .map(sid => s"snap@$sid+").getOrElse("")
          s"$n=$snap$tail"
        }
        println(s"[cycle ${i + 1}] ledger partitions: ${counts.mkString(" ")}")
      }
      if (checkMode == "every") {
        // bounded twin corpus at this cycle's committed watermark:
        // the full rebuild must see exactly the docs the incremental
        // side has ingested so far
        val mark = CorpusIncrementalDag.releaseWatermark(layout)
        val twinDir = s"${root}_twin"
        graft.Tables.documents(spark, sfDir).where(col("doc_id") <= mark)
          .write.mode("overwrite").parquet(s"$twinDir/documents.parquet")
        mismatches += equivalenceCheck(spark, twinDir, root, s"${root}_full",
          delta, tag = s"check c${i + 1}")
      }
    }

    // SPARK_GRAFT_INC_CHECK=1: one equivalence check at the end, over
    // the whole corpus
    if (checkMode == "1")
      mismatches += equivalenceCheck(spark, sfDir, root, s"${root}_full", delta, tag = "check")
    if (checkMode.nonEmpty)
      println(s"[check] TOTAL mismatched layers across checks: $mismatches" +
        (if (mismatches == 0) " — ALL OK" else " — FAILURES ABOVE"))
    spark.stop()
    // a scripted soak (set -e wrapper, CI gate) must see the failure
    // in the exit code, not just the log (review r17)
    if (mismatches > 0) sys.exit(1)
  }
}
