package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHashBandKeys
import graft.text.DedupOps

/** The round-11 adaptive dedup routing surface:
  *
  *  1. [[SimHashBandKeys]] — table 0 is bit-compatible with the
  *     contiguous-slice banding it replaced, every table's permutation
  *     is a deterministic bijection, and permuted keys re-derive from
  *     the published permutation;
  *  2. the pure routing/budget math ([[DedupOps.simhashPreGateBound]],
  *     [[DedupOps.simhashBudgetFromStats]]);
  *  3. route EQUALITY: the MinHash route (forced via a zero candidate
  *     budget) and the SimHash route emit the same verified pair set,
  *     which equals the exact n-gram Jaccard ground truth;
  *  4. budget CERTIFICATION: the first keyed run at the loose cap
  *     measures the corpus-wide true-pair hamming distribution and
  *     memoizes a tightened budget; the certified re-run emits the
  *     identical pair set (the certificate covers every true pair by
  *     construction — no sampled tail to clip).
  */
class AdaptiveDedupSpec extends SparkSpec {
  import spark.implicits._

  test("band-key table 0 is bit-compatible with contiguous 8-bit slices") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val h0 = rnd.nextLong(); val h1 = rnd.nextLong()
      val keys = SimHashBandKeys.compute(h0, h1, 16, 2).toLongArray()
      assert(keys.length == 32)
      (0 until 16).foreach { b =>
        val expected =
          if (b < 8) (h0 >>> (b * 8)) & 0xFFL
          else (h1 >>> ((b - 8) * 8)) & 0xFFL
        assert(keys(b) == expected, s"table-0 band $b")
      }
    }
  }

  test("band-table permutations are deterministic bijections and keys re-derive") {
    (0 to 3).foreach { t =>
      val p = SimHashBandKeys.perm(t)
      assert(p.sorted.sameElements(0 until 128), s"table $t is a bijection of 0..127")
      assert(SimHashBandKeys.perm(t).sameElements(p), s"table $t deterministic")
    }
    assert(SimHashBandKeys.perm(0).sameElements(0 until 128), "table 0 = identity")
    assert(!SimHashBandKeys.perm(1).sameElements(0 until 128), "table 1 actually permutes")
    // permuted keys re-derive from the permutation: bit j of band b in
    // table 1 is fingerprint bit perm(1)[b*8+j]
    val h0 = 0x0123456789ABCDEFL; val h1 = 0xFEDCBA9876543210L
    val keys = SimHashBandKeys.compute(h0, h1, 16, 2).toLongArray()
    val p1 = SimHashBandKeys.perm(1)
    (0 until 16).foreach { b =>
      var expected = 0L
      (0 until 8).foreach { j =>
        val pos = p1(b * 8 + j)
        val bit = if (pos < 64) (h0 >>> pos) & 1L else (h1 >>> (pos - 64)) & 1L
        expected |= bit << j
      }
      assert(keys(16 + b) == expected, s"table-1 band $b")
    }
  }

  test("pre-gate bound and budget-from-stats math") {
    // 16 bands × 8-bit keys × 2 tables: n²/2 · 32/256 = n²/16
    assert(DedupOps.simhashPreGateBound(1000, 16, 2) == 1000.0 * 1000 / 16)
    assert(DedupOps.simhashPreGateBound(1000, 16, 1) == 1000.0 * 1000 / 32)
    // the default cutover sits just above 32k docs: 2048·n = n²/16
    val cut = (2048L * 16).toDouble
    assert(DedupOps.simhashPreGateBound(32768, 16, 2) == 2048.0 * 32768)
    assert(DedupOps.simhashPreGateBound(32769, 16, 2) > 2048.0 * 32769 - 1)
    assert(cut == 32768.0)

    // thin evidence keeps the cap
    assert(DedupOps.certifiedBudgetFromStats(5, 5, 31, 12) == 31)
    // corpus-wide max + 3 drift margin
    assert(DedupOps.certifiedBudgetFromStats(100, 12, 31, 12) == 15)
    // never looser than the cap
    assert(DedupOps.certifiedBudgetFromStats(100, 30, 31, 12) == 31)
  }

  /** Clone-heavy corpus: groups of near-identical docs (1-token edits
    * of a 200-token base) are true J>=50 pairs; unrelated bases are
    * far. 200 tokens matter for the tightening test: a 1-token edit
    * perturbs 3 of ~198 grams, so per-bit counter margins are wide and
    * the pair hamming distribution concentrates (measured μ≈8.3,
    * σ≈2.8, max 16 — μ+6σ ≈ 26 < the 31 cap). Short docs would NOT
    * tighten: at 40 tokens the same edit measures μ≈18/σ≈5.9/max 33,
    * i.e. a noisy fingerprint whose honest budget IS the cap — which
    * is exactly the adaptive behavior being tested. Deterministic. */
  private def cloneCorpus(nGroups: Int, perGroup: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    (0 until nGroups).flatMap { g =>
      val base = Vector.fill(200)(s"tok${rnd.nextInt(500)}")
      (0 until perGroup).map { c =>
        val doc = if (c == 0) base else base.updated(rnd.nextInt(200), s"mut${g}_$c")
        ((g * perGroup + c).toLong, doc.mkString(" "))
      }
    }
  }

  test("minhash and simhash routes emit the same exact-verified pairs (= ground truth)") {
    val docs = cloneCorpus(12, 3).toDF("doc_id", "text")
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, Int.MaxValue, 50)
      .select("doc1", "doc2", "jaccard_pct").as[(Long, Long, Long)].collect().toSet
    assert(truth.nonEmpty, "corpus must contain true pairs")
    // default budget → simhash route (36 docs, bound ≪ budget)
    val viaSimhash = DedupOps.nearDupPairsAdaptive(docs, "doc_id", $"text", 3, 50)
      .as[(Long, Long, Long)].collect().toSet
    // zero budget → pre-gate bound always exceeds it → minhash route
    val viaMinhash = DedupOps.nearDupPairsAdaptive(docs, "doc_id", $"text", 3, 50,
      candBudgetPerDoc = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSimhash == truth, s"simhash route: missing=${(truth -- viaSimhash).take(3)}")
    assert(viaMinhash == truth, s"minhash route: missing=${(truth -- viaMinhash).take(3)}")
  }

  test("first keyed run certifies a tightened budget; certified re-run stays exact") {
    val docs = cloneCorpus(30, 4).toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, Int.MaxValue, 50)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(truth.size >= 100, "clone corpus must contain many true pairs")
    DedupOps.clearBudgetMemo()
    val key = Some("spec://adaptive-certify")
    def run() = DedupOps.nearDupPairsAdaptive(docs, "doc_id", $"text", 3, 50,
      budgetKey = key)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    // run 1: uncertified → loose cap, exact-complete, certifies as a
    // byproduct (200-token docs with 1-token edits concentrate the
    // pair hamming distribution: μ≈8.3, σ≈2.8, max 16 → μ+6σ < 31)
    assert(run() == truth, "certification run at the cap equals ground truth")
    val certified = DedupOps.certifiedBudget(key.get, docs.count(), 3, 50, 16, 2, 31)
    assert(certified.exists(b => b < 31 && b >= 1),
      s"tight clone corpus must certify below the cap, got $certified")
    // run 2: tightened gate — the certificate covers every true pair,
    // so the pruned candidates are all proven non-dups
    assert(run() == truth, "certified run equals ground truth")
    DedupOps.clearBudgetMemo()
    docs.unpersist()
  }

  test("certificate persists: a fresh memo (new JVM) seeds from the store and skips re-certification") {
    val docs = cloneCorpus(30, 4).toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, Int.MaxValue, 50)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val store = java.nio.file.Files.createTempDirectory("graft_budget_store").toString
    val key = Some("spec://adaptive-persist")
    def run() = DedupOps.nearDupPairsAdaptive(docs, "doc_id", $"text", 3, 50,
      budgetKey = key, budgetStore = Some(store))
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    DedupOps.clearBudgetMemo()
    assert(run() == truth, "certification run equals ground truth")
    val n = docs.count()
    val certified = DedupOps.certifiedBudget(key.get, n, 3, 50, 16, 2, 31)
    assert(certified.exists(_ < 31), s"must certify below the cap, got $certified")
    // fresh JVM simulation: wipe the in-memory memo; the disk
    // certificate must seed it on the next run (run 1 of JVM 2 pays
    // the WARM gate, not the loose-cap certification pass)
    DedupOps.clearBudgetMemo()
    assert(DedupOps.certifiedBudget(key.get, n, 3, 50, 16, 2, 31).isEmpty)
    assert(run() == truth, "store-seeded run equals ground truth")
    assert(DedupOps.certifiedBudget(key.get, n, 3, 50, 16, 2, 31) == certified,
      "the disk certificate must re-seed the memo with the same tightened budget")
    DedupOps.clearBudgetMemo()
    docs.unpersist()
  }

  test("snapshotKey folds a content fingerprint: an in-place mutation changes the key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap")
    val f = dir.resolve("part-0.parquet")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    val k1 = DedupOps.snapshotKey(dir.toString)
    assert(k1.startsWith(dir.toString + "#"), "key carries the visible path")
    // row-count-preserving mutation: same file name, same length is
    // NOT preserved here — but even a same-length rewrite moves mtime
    Thread.sleep(5)
    java.nio.file.Files.write(f, Array[Byte](9, 9, 9, 9))
    val k2 = DedupOps.snapshotKey(dir.toString)
    assert(k1 != k2, "mutated corpus must produce a different snapshot key")
    assert(DedupOps.snapshotKey(dir.toString) == k2, "key is deterministic for a fixed snapshot")
  }

  test("snapshotKey refuses to mint a key for a path that resolves to nothing") {
    // a key for an invisible corpus would digest a constant, letting
    // every later mutation reuse a stale certificate — fail loudly
    val e = intercept[IllegalArgumentException] {
      DedupOps.snapshotKey("/nonexistent/graft_spec_corpus_xyz")
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("loadBudget rejects out-of-range (tampered/corrupt) budgets") {
    val store = java.nio.file.Files.createTempDirectory("graft_budget_tamper").toString
    val key = "spec://tamper|36|3|50|16|2|31"
    // a crafted too-small (negative) budget would narrow the hamming
    // gate below anything certifiable and drop true pairs silently
    DedupOps.saveBudget(store, key, -5)
    assert(DedupOps.loadBudget(store, key, cap = 31).isEmpty, "negative budget must be a miss")
    DedupOps.saveBudget(store, key, 40)
    assert(DedupOps.loadBudget(store, key, cap = 31).isEmpty, "above-cap budget must be a miss")
    DedupOps.saveBudget(store, key, 12)
    assert(DedupOps.loadBudget(store, key, cap = 31).contains(12), "in-range budget loads")
    assert(DedupOps.loadBudget(store, key, cap = 11).isEmpty,
      "a budget certified under a looser cap than the caller's must be a miss")
  }

  test("a gate-rules version bump forces re-certification on an unchanged corpus") {
    val docs = cloneCorpus(30, 4).toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, Int.MaxValue, 50)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    DedupOps.clearBudgetMemo()
    val n = docs.count()
    def run(rulesVersion: String) = DedupOps.nearDupPairsAdaptive(
      docs, "doc_id", $"text", 3, 50,
      budgetKey = Some(s"spec://rules-bump|gate|$rulesVersion"))
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(run("v1") == truth)
    assert(DedupOps.certifiedBudget("spec://rules-bump|gate|v1", n, 3, 50, 16, 2, 31).isDefined)
    // same corpus, bumped rules version: the v1 certificate must NOT
    // apply — the survivor set it was measured on may have changed
    assert(DedupOps.certifiedBudget("spec://rules-bump|gate|v2", n, 3, 50, 16, 2, 31).isEmpty,
      "v1 certificate must not pre-seed the v2 key")
    assert(run("v2") == truth)
    assert(DedupOps.certifiedBudget("spec://rules-bump|gate|v2", n, 3, 50, 16, 2, 31).isDefined,
      "the v2 run must have re-certified under its own key")
    DedupOps.clearBudgetMemo()
    docs.unpersist()
  }

  test("caller-injected hammingBudget skips certification and is honored") {
    val docs = cloneCorpus(8, 3).toDF("doc_id", "text")
    DedupOps.clearBudgetMemo()
    val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 3, Int.MaxValue, 50)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val got = DedupOps.nearDupPairsAdaptive(docs, "doc_id", $"text", 3, 50,
      hammingBudget = Some(31))
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(DedupOps.budgetMemoSize == 0, "injected budgets must not write the memo")
  }
}
