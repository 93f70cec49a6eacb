package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusIncrementalDag, CorpusSelectionDelta}
import graft.operators.JobGraph.Succeeded

/** [[CorpusIncrementalDag.ReleasePolicy]] — the consumption hook for
  * the release's honesty ledgers (VERDICT r14 item 4). Two firing
  * paths, each driven end-to-end:
  *   1. a BRIDGE batch (a new doc near-dups two standing keepers that
  *      aren't near-dups of each other) produces a retraction ledger
  *      row AND raises the rebuild flag;
  *   2. on the delta selection path, evicted train copies accumulate
  *      dead tokens inside standing pack shards; past the bound the
  *      flag fires (exercised with bound 0 so any eviction trips it),
  *      and the export tombstones are visible to a release reader.
  */
class ReleasePolicySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_policy").toString

  /** Token master sequence: "the tok0 the tok1 …" — every doc slices
    * a range. Funnel-passing by construction (en stopwords, ≥ 20
    * words, ≥ 100 chars, no repeated trigrams). */
  private def slice(lo: Int, hi: Int): String =
    (lo until hi).map(i => if (i % 2 == 0) "the" else s"tok${i / 2}").mkString(" ")

  test("a bridge batch writes a retraction row and schedules a full-rebuild compaction") {
    // A = m[0,100), B = m[50,150): 3-gram Jaccard ~32% (no pair).
    // C = m[25,125): ~59% with BOTH — C bridges {A} and {B}; a full
    // rebuild would merge the component and drop B, an append-only
    // release cannot retract it.
    val corpusDir = tmp()
    Seq(
      (1L, "en", "s1", slice(0, 100)),
      (2L, "en", "s1", slice(50, 150)),
      (3L, "en", "s1", slice(25, 125)))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")

    val root = tmp()
    val li = CorpusIncrementalDag.Layout(root)
    val r1 = CorpusIncrementalDag.run(spark, corpusDir, root, upTo = 2L)
    assert(r1.forall(_.status == Succeeded), s"batch1: ${r1.map(r => r.id -> r.status)}")
    assert(spark.read.parquet(li.keep).count() == 2L, "A and B both standing keepers")
    assert(!CorpusIncrementalDag.rebuildRequested(spark, li), "no flag before the bridge")

    val r2 = CorpusIncrementalDag.run(spark, corpusDir, root)
    assert(r2.forall(_.status == Succeeded), s"batch2: ${r2.map(r => r.id -> r.status)}")

    // the honesty ledger: B (standing keeper) would have been dropped
    // by a full rebuild — it resolves to A's component
    val retr = spark.read.parquet(li.retractions)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toSet
    assert(retr == Set((2L, 1L)), s"retraction ledger must name B -> A, got $retr")

    // the policy consumed it: flag row written, scheduler hook true
    val flags = spark.read.parquet(li.rebuildFlag)
      .select("reason", "metric").as[(String, Long)].collect().toSet
    assert(flags == Set(("retractions", 1L)), s"rebuild flag rows: $flags")
    assert(CorpusIncrementalDag.rebuildRequested(spark, li),
      "the scheduler hook must report a pending compaction")
    assert(r2.find(_.id == "release_policy").get.metric == 1L, "policy metric = fired rules")
  }

  test("delta path: evicted train copies trip the dead-token bound; export tombstones are readable") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val mid = ids(ids.length / 2)

    val root = tmp()
    val li = CorpusIncrementalDag.Layout(root)
    val L = CorpusSelectionDelta.Layers(root)
    val policy = CorpusIncrementalDag.ReleasePolicy(maxDeadTokenPermille = 0L)
    val r1 = CorpusIncrementalDag.runDelta(spark, sf, root, upTo = mid, policy = policy)
    assert(r1.forall(_.status == Succeeded), s"batch1: ${r1.map(r => r.id -> r.status)}")
    val r2 = CorpusIncrementalDag.runDelta(spark, sf, root, policy = policy)
    assert(r2.forall(_.status == Succeeded), s"batch2: ${r2.map(r => r.id -> r.status)}")

    // batch 2 must evict standing train copies on this corpus
    val tombs = spark.read.parquet(L.packTombs).count()
    assert(tombs > 0, "batch 2 must tombstone standing train copies")
    val deadFlag = spark.read.parquet(li.rebuildFlag)
      .where(col("reason") === "dead_tokens")
    assert(!deadFlag.isEmpty, "dead-token rule must fire at bound 0")
    assert(CorpusIncrementalDag.rebuildRequested(spark, li))

    // a release reader sees the eviction: tombstoned copies are
    // absent from the export view but present in the raw shards
    val ev = CorpusSelectionDelta.exportView(spark, L)
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    val tombstoned = spark.read.parquet(L.exportTombs)
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    assert(tombstoned.nonEmpty, "export tombstones written")
    // a tombstoned copy that was NOT re-added later must not be live
    val lastBatch = spark.read.parquet(L.mixDelta)
      .agg(max(col("batch").cast("long"))).head().getLong(0)
    val readded = spark.read.parquet(L.mixDelta)
      .where(col("op") === "add" && col("batch") === lastBatch)
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    val deadForGood = tombstoned -- readded
    assert(deadForGood.nonEmpty && deadForGood.intersect(ev).isEmpty,
      "evicted copies are invisible to the export view")
  }
}
