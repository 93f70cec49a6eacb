package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusIncrementalDag, CorpusPipelineDag, WatermarkStore}
import graft.operators.JobGraph.Succeeded

/** Incremental corpus release (operators/CorpusIncrementalDag.scala):
  * the watermark-gated daily-batch path. The headline contract is
  * EQUIVALENCE — two incremental batches produce, layer by layer, the
  * same release a full [[CorpusPipelineDag]] rebuild on the union
  * produces (first-arrival = min-id; the retraction ledger is the
  * documented divergence channel and must be EMPTY on this corpus) —
  * plus restart convergence (rerun of an unadvanced batch overwrites
  * its own partitions) and empty-batch no-op.
  */
class CorpusIncrementalDagSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cinc").toString

  private def rows(path: String, cols: Seq[String]): Set[Seq[Any]] =
    spark.read.parquet(path).select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet

  test("two-batch incremental release == full rebuild on the union, ledger empty, restart converges") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val mid = ids(ids.length / 2)

    val incRoot = tmp()
    val li = CorpusIncrementalDag.Layout(incRoot)

    // batch 1: everything up to mid (bootstrap against empty indexes)
    val r1 = CorpusIncrementalDag.run(spark, sf, incRoot, upTo = mid)
    assert(r1.forall(_.status == Succeeded), s"batch1: ${r1.map(r => r.id -> r.status)}")
    assert(new WatermarkStore(li.marks, CorpusIncrementalDag.bootstrapMark)
      .get(CorpusIncrementalDag.entity).trim.toLong == mid,
      "watermark advanced to the batch max")

    // batch 2: the rest
    val r2 = CorpusIncrementalDag.run(spark, sf, incRoot)
    assert(r2.forall(_.status == Succeeded), s"batch2: ${r2.map(r => r.id -> r.status)}")
    assert(new WatermarkStore(li.marks, CorpusIncrementalDag.bootstrapMark)
      .get(CorpusIncrementalDag.entity).trim.toLong == ids.last)

    // the equivalence PRECONDITION, asserted so it can't silently rot:
    // no batch-2 doc bridged two standing components (if this corpus
    // ever does, the contract is the ledger, not bit-equality)
    assert(spark.read.parquet(li.retractions).isEmpty,
      "spec corpus must produce no retractions — bridge merges break bit-equality by design")

    // full rebuild on the whole corpus
    val fullRoot = tmp()
    val lf = CorpusPipelineDag.Layout(fullRoot)
    val rf = CorpusPipelineDag.run(spark, sf, fullRoot)
    assert(rf.forall(_.status == Succeeded), s"full: ${rf.map(r => r.id -> r.status)}")

    // layer-by-layer equality (incremental layers carry an extra
    // `batch` partition column; compare the data columns)
    val flagsCols = Seq("doc_id", "lang", "source", "n_words", "r0", "r1", "r2", "r3")
    val fi = rows(li.flags, flagsCols); val ff = rows(lf.flags, flagsCols)
    assert(fi == ff,
      s"flags layer: inc-only=${(fi -- ff).toSeq.sortBy(_.head.toString).take(6)} " +
        s"full-only=${(ff -- fi).toSeq.sortBy(_.head.toString).take(6)}")
    val pairCols = Seq("doc1", "doc2", "jaccard_pct")
    assert(rows(li.pairs, pairCols) == rows(lf.pairs, pairCols), "near-dup pair set")
    val keepCols = Seq("doc_id", "lang", "source", "n_words")
    assert(rows(li.keep, keepCols) == rows(lf.keep, keepCols), "keep layer")
    val cleanCols = Seq("doc_id", "lang", "source", "n_paras", "n_kept", "text")
    assert(rows(li.clean, cleanCols) == rows(lf.clean, cleanCols), "clean layer")
    val selCols = Seq("doc_id", "lang", "source", "quality_score", "n_words", "text")
    assert(rows(li.selected, selCols) == rows(lf.selected, selCols), "selected layer")
    val mixCols = Seq("doc_id", "lang", "source", "n_words", "copy_id")
    assert(rows(li.mixture, mixCols) == rows(lf.mixture, mixCols), "mixture layer")
    val splitCols = mixCols :+ "split"
    assert(rows(li.splits, splitCols) == rows(lf.splits, splitCols), "splits layer")
    val packCols = Seq("doc_id", "copy_id", "source", "n_words", "pack_id", "pack_offset")
    assert(rows(li.packs, packCols) == rows(lf.packs, packCols), "packs layer")
    val exCols = Seq("doc_id", "copy_id", "lang", "source", "split", "n_words", "text")
    assert(rows(li.export, exCols) == rows(lf.export, exCols), "export layer")
    val ppCols = Seq("source", "pack_id", "n_docs", "n_tokens", "payload")
    assert(rows(li.packPayloads, ppCols) == rows(lf.packPayloads, ppCols), "pack payload layer")

    // RESTART: reset the watermark to mid (simulates a crash anywhere
    // before advance_watermark) and rerun — batch 2 reprocesses into
    // its own partitions and every layer converges bit-identically
    new WatermarkStore(li.marks, CorpusIncrementalDag.bootstrapMark)
      .update(CorpusIncrementalDag.entity, CorpusIncrementalDag.pad(mid))
    val r2b = CorpusIncrementalDag.run(spark, sf, incRoot)
    assert(r2b.forall(_.status == Succeeded), s"rerun: ${r2b.map(r => r.id -> r.status)}")
    assert(rows(li.clean, cleanCols) == rows(lf.clean, cleanCols), "clean after rerun")
    assert(rows(li.packs, packCols) == rows(lf.packs, packCols), "packs after rerun")
    assert(rows(li.flags, flagsCols) == rows(lf.flags, flagsCols), "flags after rerun")

    // EMPTY BATCH: nothing new — every stage succeeds as a no-op, the
    // watermark stays, the release layers are unchanged
    val r3 = CorpusIncrementalDag.run(spark, sf, incRoot)
    assert(r3.forall(_.status == Succeeded), s"empty: ${r3.map(r => r.id -> r.status)}")
    assert(r3.find(_.id == "watermark_batch").get.metric == 0L, "empty batch detected")
    // an empty batch must SKIP the corpus-scale selection rebuild
    // (metric 0 = stage body short-circuited), not rerun it
    Seq("token_budget", "mix_materialize", "train_split", "seq_pack",
      "export_release", "pack_payloads").foreach { id =>
      assert(r3.find(_.id == id).get.metric == 0L, s"$id must no-op on an empty batch")
    }
    assert(new WatermarkStore(li.marks, CorpusIncrementalDag.bootstrapMark)
      .get(CorpusIncrementalDag.entity).trim.toLong == ids.last, "watermark unchanged")
    assert(rows(li.clean, cleanCols) == rows(lf.clean, cleanCols), "clean unchanged")
    assert(rows(li.packs, packCols) == rows(lf.packs, packCols), "packs unchanged")
  }

  test("torn partition from a crashed wider-upTo attempt is healed before the narrower rerun") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val mid = ids(ids.length / 2)
    val mid2 = ids(ids.length * 3 / 4)

    val root = tmp()
    val li = CorpusIncrementalDag.Layout(root)
    val r1 = CorpusIncrementalDag.run(spark, sf, root, upTo = mid)
    assert(r1.forall(_.status == Succeeded), s"batch1: ${r1.map(r => r.id -> r.status)}")

    // simulate a crashed WIDER attempt (upTo = ids.last) that landed a
    // clean partition before dying: batch id ids.last > the narrower
    // rerun's bid (mid2), so without healing its rows pass every
    // doc_id filter once the watermark advances past them
    val wideBid = ids.last
    spark.read.parquet(s"${li.clean}/batch=$mid")
      .write.mode("overwrite").parquet(s"${li.clean}/batch=$wideBid")

    val r2 = CorpusIncrementalDag.run(spark, sf, root, upTo = mid2)
    assert(r2.forall(_.status == Succeeded), s"batch2: ${r2.map(r => r.id -> r.status)}")

    val fs = new org.apache.hadoop.fs.Path(li.clean)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${li.clean}/batch=$wideBid")),
      "healing must delete the torn wider-upTo partition")
    // no doc appears twice across clean batch partitions
    val dups = spark.read.parquet(li.clean)
      .groupBy("doc_id").count().where(col("count") > 1).count()
    assert(dups == 0L, "clean layer must hold each doc at most once after healing")
  }

  test("gated cross-corpus probe == ungated probe (Bloom adds no misses), on a clone corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docsSeq = (0 until 40).flatMap { g =>
      val base = Vector.fill(120)(s"w${rnd.nextInt(400)}")
      Seq((g * 2L, base.mkString(" ")),
        (g * 2L + 1, base.updated(rnd.nextInt(120), s"m$g").mkString(" ")))
    }
    val docs = docsSeq.toDF("doc_id", "text")
    val newSide = docs.where($"doc_id" % 2 === 1)
    val standing = docs.where($"doc_id" % 2 === 0)
    val sigsNew = graft.text.DedupOps.minhashSignaturesNative(newSide, "doc_id", $"text", 3, 48)
    val sigsOld = graft.text.DedupOps.minhashSignaturesNative(standing, "doc_id", $"text", 3, 48)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val ungated = pairs(graft.text.DedupOps.minhashLshPairsAcross(
      sigsNew, sigsOld, "doc_id", 48, 24, 0.25))
    val gated = pairs(graft.text.DedupOps.minhashLshPairsAcrossGated(
      sigsNew, sigsOld, "doc_id", 48, 24, 0.25))
    assert(ungated.nonEmpty, "clone corpus must produce cross pairs")
    assert(gated == ungated, "the Bloom pre-gate must not lose a single candidate")
  }

  test("incremental paragraph strip against an empty index == the full strip") {
    val docs = Tables.documents(spark, sf).limit(200)
    val full = graft.text.DedupOps.paragraphStrip(docs, "doc_id", col("text"), 20)
      .collect().map(_.toSeq).toSet
    val emptyKnown = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("para_hash STRING"))
    val (inc, fresh, release) = graft.text.DedupOps.paragraphStripIncremental(
      docs, "doc_id", col("text"), 20, emptyKnown)
    val got = inc.collect().map(_.toSeq).toSet
    val freshN = fresh.count()
    release()
    assert(got == full, "empty-index incremental strip must equal the full strip")
    assert(freshN > 0, "fresh hash set covers the batch's blocks")
  }
}
