package graft

import org.apache.spark.sql.functions._
import graft.vector.Ivf

class IvfSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  test("IVF finds planted duplicates through the probed lists") {
    // corpus with planted near-duplicates of queries 0 and 1
    val base = Tables.embeddings(spark, sf).where($"vec_id" < 100)
    val dups = base.where($"vec_id" < 2)
      .select(($"vec_id" + 1000).as("vec_id"), $"embedding", $"label")
    val corpus = base.unionByName(dups)
    val index = Ivf.build(corpus, "vec_id", "embedding", k = 4, iters = 2)
    val out = Ivf.probe(index, corpus.where($"vec_id" < 2), "vec_id", "embedding", nprobe = 2, topK = 3)
      .where($"rank" === 1)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().toMap2
    // an identical vector always lands in the same centroid list ->
    // IVF must rank it first with cosine 1.0
    assert(out(0L) == ((1000L, 1.0)))
    assert(out(1L) == ((1001L, 1.0)))
  }

  test("recallReport: recall is monotone in nprobe and hits 1000 permille at nprobe = k") {
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val qs = emb.where($"vec_id" < 20)
    val rep = Ivf.recallReport(index, qs, "vec_id", "embedding",
      topK = 5, nprobes = Seq(1, 2, 4, 8))
      .orderBy("nprobe")
      .select($"nprobe", $"n_queries", $"n_hits", $"n_truth", $"recall_permille")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).toSeq == Seq(1, 2, 4, 8))
    assert(rep.forall(r => r._2 == 20 && r._4 == 100), s"20 queries x top-5 truth: ${rep.toSeq}")
    // more lists scanned can only move the returned top-k toward the
    // exact top-k (same tiebreak order on both sides)
    assert(rep.map(_._5).toSeq == rep.map(_._5).toSeq.sorted,
      s"recall must be monotone in nprobe: ${rep.toSeq}")
    assert(rep.last._5 == 1000L,
      s"scanning all k lists IS the exact scan: ${rep.toSeq}")
    index.release()
  }

  test("index structure: every vector in exactly one list, k centroids") {
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 1)
    assert(index.centroids.count() == 8)
    assert(index.lists.count() == emb.count())
    assert(index.lists.select("vec_id").distinct().count() == emb.count())
  }

  test("k larger than the corpus degrades to a smaller index") {
    val emb = Tables.embeddings(spark, sf).where($"vec_id" < 5)
    val index = Ivf.build(emb, "vec_id", "embedding", k = 64, iters = 2)
    assert(index.cids.length <= 5 && index.cids.nonEmpty)
    assert(index.lists.count() == 5) // every vector still lands in a list
    val out = Ivf.probe(index, emb.where($"vec_id" < 1), "vec_id", "embedding",
      nprobe = 2, topK = 2)
    assert(out.count() > 0)
    index.release()
  }

  test("null vectors are excluded from the index instead of crashing the build") {
    val emb = Tables.embeddings(spark, sf).where($"vec_id" < 20)
    // vec_id 0 is among the k-smallest-id seed rows — nulling it
    // exercises the seed path, not just the assignment path
    val withNulls = emb.select($"vec_id",
      when($"vec_id" % 3 === 0, lit(null)).otherwise($"embedding").as("embedding"))
    val index = Ivf.build(withNulls, "vec_id", "embedding", k = 4, iters = 2)
    val nonNull = withNulls.where($"embedding".isNotNull).count()
    assert(index.lists.count() == nonNull)
    assert(index.lists.where($"embedding".isNull).isEmpty)
    index.release()
  }

  test("map-only NearestCentroid assignment == join-based max_by assignment") { withShareMode("persist") {
      val emb = Tables.embeddings(spark, sf)
      val index = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      // reference formulation: score every (vector, centroid) pair,
      // keep the max-cosine centroid (ties -> smallest cid)
      graft.functions.VectorFunctions.register(spark)
      val joined = emb.crossJoin(broadcast(index.centroids))
        .withColumn("__c", call_function("cosine_sim", $"embedding", $"centroid"))
        .groupBy($"vec_id")
        .agg(max_by($"cid", struct($"__c", (-$"cid").as("__nc"))).as("cid"),
          max($"__c").as("__c"))
      val fast = index.lists.select($"vec_id", $"cid", $"__c")
      assert(fast.exceptAll(joined).isEmpty && joined.exceptAll(fast).isEmpty)
      // and the assignment itself must be a projection: it adds ZERO
      // exchanges over the bare corpus scan (the loader's gated
      // single-row-group spread is the only one in either plan)
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        // a materialized AQE plan prints "== Final Plan ==" AND
        // "== Initial Plan ==" — count the final section only
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        "Exchange".r.findAllIn(plan).length
      }
      assert(exchanges(index.lists) == exchanges(emb),
        index.lists.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
      index.release()
  }
  }

  test("saved index round-trips: probe on the loaded artifact equals brute force") {
    val emb = Tables.embeddings(spark, sf)
    val built = Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    Ivf.save(built, dir)

    val loaded = Ivf.load(spark, dir)
    // structure survives: same centroid set, same inverted file
    assert(loaded.cids.toSeq == built.cids.toSeq)
    assert(loaded.lists.count() == built.lists.count())
    assert(loaded.lists.select("vec_id", "cid").exceptAll(
      built.lists.select("vec_id", "cid")).isEmpty)
    built.release()

    // probe-many against the loaded artifact, no rebuild: exact probe
    // must equal brute force (the build+probe guarantee, now through
    // the persistence boundary)
    val queries = emb.where($"vec_id" < 5)
    val probed = Ivf.probeExact(loaded, queries, "vec_id", "embedding", nprobe = 2, topK = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = graft.vector.VectorOps.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(probed == brute, "loaded-index exact probe must equal brute force")

    // the lists artifact is cid-partitioned on disk: probing specific
    // lists can prune directories instead of scanning the corpus
    val listDirs = new java.io.File(s"$dir/lists.parquet").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    assert(listDirs.size == built.cids.length, s"one directory per list: $listDirs")
    loaded.release()
  }

  test("cosinePairsExact == brute-force tiled pairs at multiple thresholds") {
    val emb = Tables.embeddings(spark, sf)
    for (minCos <- Seq(0.30, 0.40, 0.60)) {
      val brute = graft.vector.VectorOps.cosinePairs(emb, "vec_id", "embedding", minCos)
        .select("id1", "id2", "cosine").as[(Long, Long, Double)].collect().toSet
      val pruned = Ivf.cosinePairsExact(emb, "vec_id", "embedding", minCos)
        .select("id1", "id2", "cosine").as[(Long, Long, Double)].collect().toSet
      assert(pruned == brute,
        s"block-pruned threshold join must equal brute force at minCos=$minCos " +
          s"(missing=${(brute -- pruned).take(5)}, extra=${(pruned -- brute).take(5)})")
    }
  }

  test("cosinePairsExact on a clustered corpus: blocks prune hard, result still equals brute") {
    // 5 tight clusters on distinct axes of an 8-dim space: within-
    // cluster cosine ≈ 0.99, across ≈ 0.1 — the shape of a real
    // embedding corpus (deterministic perturbations, no randomness)
    val rows = (0 until 200).map { i =>
      val c = i % 5
      val v = Array.tabulate(8) { d =>
        val perturb = (((i * 31 + d * 7) % 11) - 5) * 0.01f
        (if (d == c) 1.0f else 0.0f) + perturb
      }
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")

    // the bound table itself: with minCos=0.8, only near-diagonal
    // blocks can qualify — assert the pruning is real, not vacuous
    val k = 15
    val idx = Ivf.build(emb, "vec_id", "embedding", k, iters = 2)
    graft.functions.VectorFunctions.register(spark)
    val clamp = (c: org.apache.spark.sql.Column) => greatest(lit(-1.0), least(lit(1.0), c))
    val radii = idx.lists.groupBy("cid").agg(max(acos(clamp($"__c"))).as("__r"))
    val cents = idx.centroids.join(radii, "cid")
    val nBlocks = cents.select($"cid".as("i"), $"centroid".as("vi"), $"__r".as("ri"))
      .crossJoin(cents.select($"cid".as("j"), $"centroid".as("vj"), $"__r".as("rj")))
      .where($"i" <= $"j")
      .withColumn("best", cos(greatest(
        acos(clamp(call_function("cosine_sim", $"vi", $"vj"))) - $"ri" - $"rj", lit(0.0))))
    val admitted = nBlocks.where($"best" >= 0.8 - 1e-4).count()
    val total = nBlocks.count()
    idx.release()
    assert(admitted * 3 <= total,
      s"clustered corpus must prune most blocks (admitted $admitted of $total)")

    // and the pruned path's output is still the exact pair set
    val brute = graft.vector.VectorOps.cosinePairs(emb, "vec_id", "embedding", 0.8)
      .select("id1", "id2", "cosine").as[(Long, Long, Double)].collect().toSet
    val pruned = Ivf.cosinePairsExact(emb, "vec_id", "embedding", 0.8, k = k)
      .select("id1", "id2", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(pruned == brute && brute.nonEmpty,
      s"pruned threshold join must equal brute force (|brute|=${brute.size})")
  }

  test("append maintains the saved index: probe stays exact, drift flags a shifted batch") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.where($"vec_id" < 150)
    val batch = emb.where($"vec_id" >= 150 && $"vec_id" < 200)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val built = Ivf.build(base, "vec_id", "embedding", k = 6, iters = 2)
    Ivf.save(built, dir)
    built.release()

    // append an in-distribution batch: O(batch) work, no rebuild
    val appended = Ivf.append(spark, dir, batch, "vec_id", "embedding")
    assert(appended == batch.count())
    val loaded = Ivf.load(spark, dir)
    val corpus = base.unionByName(batch)
    assert(loaded.lists.count() == corpus.count(), "lists must hold build + appended rows")

    // exact probe over the maintained artifact == brute force over the
    // grown corpus: appended members widen their list's radius at
    // probe time, so the triangle-inequality bound still covers them
    val queries = emb.where($"vec_id" >= 150 && $"vec_id" < 155)
    val probed = Ivf.probeExact(loaded, queries, "vec_id", "embedding", nprobe = 2, topK = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = graft.vector.VectorOps.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(probed == brute, "append must not cost probe exactness")
    loaded.release()

    // staleness: in-distribution appends barely move the metric; a
    // distribution-shifted batch (negated vectors — maximally far in
    // cosine) drives corpus-wide drift up, signaling rebuild
    val driftBefore = Ivf.drift(spark, dir)
      .where($"cid".isNull).select($"drift").as[Double].head()
    val shifted = emb.where($"vec_id" >= 200 && $"vec_id" < 260)
      .select($"vec_id" + 100000, transform($"embedding", x => -x).as("embedding"))
      .toDF("vec_id", "embedding")
    Ivf.append(spark, dir, shifted, "vec_id", "embedding")
    val driftAfter = Ivf.drift(spark, dir)
      .where($"cid".isNull).select($"drift").as[Double].head()
    // measured: ~0.040 -> ~0.061 on this corpus (the shifted rows are
    // 60/260 of the index; their assignment cosine is ~0.25 lower).
    // The bar is a >25% relative rise — the signal, not a magic value.
    assert(driftAfter > driftBefore * 1.25 && driftAfter > driftBefore + 0.01,
      s"shifted batch must raise corpus-wide drift (before=$driftBefore after=$driftAfter)")
    // per-list rows carry the build baseline for every list
    val per = Ivf.drift(spark, dir).where($"cid".isNotNull)
    assert(per.where($"n_build".isNull).isEmpty, "every list existed at build time")
  }

  test("recallReport on the clustered twin: routing signal beats the scan fraction (the orthogonal contrast)") {
    // the testdata embeddings are near-orthogonal — IVF's worst case,
    // where recall ≈ nprobe/k. On a CLUSTERED corpus (the distribution
    // IVF exists for) the router carries real signal: recall at
    // nprobe=1 must far exceed the 1/k scan fraction, stay monotone,
    // and still reach exactly 1000 permille at nprobe=k.
    val k = 8
    val emb = graft.tools.MakeClustered.frame(spark, 2000L, dim = 16, clusters = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = Ivf.build(emb, "vec_id", "embedding", k = k, iters = 2)
    // sample step COPRIME to the cluster count: vec_id % clusters is
    // the cluster axis, so a multiple-of-8 step would draw every
    // query from cluster 0 and measure one router bucket
    val qs = emb.where($"vec_id" % 41 === 0)
    val rep = Ivf.recallReport(index, qs, "vec_id", "embedding",
      topK = 5, nprobes = Seq(1, 2, 4, k))
      .orderBy("nprobe").collect()
    val recalls = rep.map(_.getAs[Long]("recall_permille")).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall monotone in nprobe: $recalls")
    assert(recalls.last == 1000L, s"nprobe=k is exact: $recalls")
    // scan fraction at nprobe=1 is 1/8 = 125 permille; clustered
    // routing must beat it by a wide margin (measured ~1000 here —
    // the bar is 3x, the SIGNAL not a magic value)
    assert(recalls.head >= 3L * 1000L / k,
      s"clustered corpus: nprobe=1 recall ${recalls.head} must be >> scan fraction ${1000 / k}")

    // the contrast leg: the same report on the near-orthogonal
    // testdata shows recall in the same ballpark as the scan fraction
    // (the r14 BENCH_NOTES floor) — pin the CONTRAST, not the exact
    // floor value
    val ortho = Tables.embeddings(spark, sf)
    val oIndex = Ivf.build(ortho, "vec_id", "embedding", k = k, iters = 2)
    val oQs = ortho.where($"vec_id" % 41 === 0)
    val oHead = Ivf.recallReport(oIndex, oQs, "vec_id", "embedding",
      topK = 5, nprobes = Seq(1))
      .collect().head.getAs[Long]("recall_permille")
    assert(recalls.head > 2L * oHead,
      s"clustered nprobe=1 recall (${recalls.head}) must dominate the orthogonal floor ($oHead)")
    emb.unpersist(blocking = false)
  }

  implicit class MapOps2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
