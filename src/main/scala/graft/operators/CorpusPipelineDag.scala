package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueriesText, Tables}
import graft.text.DedupOps

/** The LLM training-data pipeline composed as a restartable batch DAG
  * over [[JobGraph]] — the corpus-side twin of [[SalesPipelineDag]]
  * (which mirrors the reference's airflow/dags + run_pipeline.sh for
  * the sales medallion). A data-release user runs THIS chain, not 30
  * individual queries:
  *
  * {{{
  *   validate ── funnel_flags ── neardup_pairs ─┬─ neardup_resolve ── paragraph_strip
  *                                              └─ dup_profile (sibling branch)
  *   paragraph_strip ── clean_quality_check ── token_budget ── mix_materialize
  *     ── train_split ── seq_pack ── pipeline_metrics (also waits on dup_profile)
  * }}}
  *
  * Stages and the registry rows they compose (SURVEY §2):
  *   - `funnel_flags`: the #144 gate chain (ingest → lang-id →
  *     quality → exact-dup keeper flag) at doc grain, ONE flags pass
  *     (shared derivation [[QueriesText.funnelFlags]] — bit-identical
  *     to the #144 profile and the streaming twin by construction);
  *   - `neardup_pairs`: the #24 adaptive router (SimHash vs floor-free
  *     MinHash banding by the measured pre-gate bound) over the exact
  *     survivors, with the persisted certified-budget store;
  *   - `neardup_resolve`: #38's adaptive connected components → keep
  *     set (min-id keeper per group);
  *   - `paragraph_strip`: #142's C4-style block strip of the keepers
  *     (docs stripped to nothing drop out);
  *   - `clean_quality_check`: a [[DataQuality]] gate on the WRITTEN
  *     clean layer (failure skips selection but not the sibling
  *     profile branch — Airflow `upstream_failed` semantics);
  *   - `token_budget`: #145's greedy quality-ordered admission (half
  *     the clean corpus's token mass) via the two-level bucket scan;
  *   - `mix_materialize`: #151's epoch-capped water-fill allocation
  *     EMITTED as doc copies;
  *   - `train_split`: #72's stable md5 split at doc grain (copies of
  *     a doc share the split — eval hygiene);
  *   - `seq_pack`: #51's deterministic 2048-token packing of the
  *     train split, per source, prefix-scan division.
  *
  * Restartability contract (the [[SalesPipelineDag]] shape): every
  * stage WRITES its parquet layer with mode(overwrite) and downstream
  * stages read only the WRITTEN layer — never the upstream's
  * in-memory frame — so each job is independently restartable, the
  * dependency edges are real I/O barriers, and a crash mid-write
  * converges to the uninterrupted run on plain rerun.
  *
  * Scale shape: the corpus-grain work is the flags projection, the
  * router's banding, the strip's hash-cell aggregate, the selection's
  * bucket scan and the materialization's prefix scan — every one a
  * registry row whose plan is already swept by
  * ScaleUpSpec/GlobalWindowSpec; the DAG adds only doc-grain keyed
  * joins between written layers (narrow keys, standard hash joins)
  * and collapsed-grain ledgers. Orchestration itself is driver-side
  * sequencing of Catalyst-planned jobs — zero data-plane cost.
  */
object CorpusPipelineDag {

  /** On-disk layer layout under one root. */
  final case class Layout(root: String) {
    val flags: String = s"$root/flags"
    val pairs: String = s"$root/neardup_pairs"
    val keep: String = s"$root/keep"
    val dupStats: String = s"$root/dup_stats"
    val clean: String = s"$root/clean"
    val selected: String = s"$root/selected"
    val mixture: String = s"$root/mixture"
    val splits: String = s"$root/splits"
    val packs: String = s"$root/packs"
    val export: String = s"$root/export"
    val packPayloads: String = s"$root/pack_payloads"
  }

  /** Columns the pipeline REQUIRES on the corpus. */
  private[operators] val requiredColumns: Set[String] = Set("doc_id", "text", "lang", "source")
  /** Known corpus metadata the pipeline tolerates but doesn't read. */
  private[operators] val toleratedColumns: Set[String] = Set("n_chars")

  /** Write the layer, counting rows ON the writing job via
    * `observe()` — one scan per stage. The r13 read-back (`count()`
    * of the landed parquet) was a second corpus-scale scan per layer;
    * at 100 TB that's ~9 extra full reads per run. A torn write still
    * can't report success rows: a failed write throws before the
    * observed value is read. `auditReadBack` keeps the old
    * paranoid mode opt-in (count what LANDED, trusting nothing). */
  private[operators] def writeLayer(df: DataFrame, path: String, auditReadBack: Boolean): Long =
    if (auditReadBack) {
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path).count()
    } else {
      val obs = org.apache.spark.sql.Observation()
      // observe sits ABOVE the whole plan (any Sort included) so a
      // range-partitioner sampling pass can't double-fire it
      df.observe(obs, count(lit(1)).as("rows")).write.mode("overwrite").parquet(path)
      obs.get("rows").asInstanceOf[Long]
    }

  /** The gate the pipeline runs on the stripped clean layer. */
  def defaultCleanSuite: Seq[DataQuality.Expectation] = Seq(
    DataQuality.NotNull("doc_id"),
    DataQuality.Unique("doc_id"),
    DataQuality.NotNull("text"),
    DataQuality.Satisfies("kept_blocks_positive", col("n_kept") >= 1))

  /** Build the job graph. `cleanSuite` is the quality gate's
    * expectation set (tests drive the failure path through it).
    *
    * `sketchRoute` (default "minhash") pins the near-dup candidate
    * generator. The DAG pins MinHash rather than inheriting the #24
    * adaptive router (ADVICE r14): [[CorpusIncrementalDag]]'s standing
    * signature index is MinHash by necessity (SimHash has no standing
    * cross-probe), and the two DAGs' layer-by-layer equality contract
    * must be SKETCH-IDENTICAL — two sketches have independent
    * probabilistic recall, so equality across different generators
    * would hold only until one sketch misses a true pair the other
    * finds. At 100 TB the adaptive router cuts over to MinHash anyway
    * (~33k docs at the defaults); the pin only changes small-corpus
    * runs, where the banding cost difference is immaterial. Pass
    * "adaptive" to restore routing (standalone full rebuilds that
    * never feed an incremental twin).
    *
    * `boilerGuardPermille` arms the boilerplate-before-banding guard
    * on the near-dup stage (warn-only here — the DAG strips paragraphs
    * AFTER dedup by design, so the guard surfaces the one input shape
    * where that order breaks the banding contract's cost bound).
    * Default OFF: the detector is a corpus-scale gram pass that can
    * only warn, so a standing daily release should not pay it every
    * run — arm it when the ingest mix changes (new crawl, new
    * source), or run the standalone #154 `q_boiler_coverage` as a
    * scheduled diagnostic instead (same derivation, same number). */
  def build(
      s: SparkSession, sfDir: String, layout: Layout,
      cleanSuite: Seq[DataQuality.Expectation] = defaultCleanSuite,
      auditReadBack: Boolean = false,
      sketchRoute: String = "minhash",
      boilerGuardPermille: Int = 0
  ): JobGraph = {
    val g = new JobGraph()
    def docs: DataFrame = Tables.documents(s, sfDir)
    def write(df: DataFrame, path: String): Long = writeLayer(df, path, auditReadBack)

    g.add("validate_corpus") {
      // drift check runs on the UNPROJECTED frame: a select() of the
      // expected columns would throw AnalysisException on a missing
      // column (bypassing the drift message) and silently drop
      // unexpected ones. Tolerated metadata columns are excluded from
      // the "unexpected" side only — they may be absent or present.
      val drift = DataQuality.columnsMatchSet(
        docs.drop(toleratedColumns.toSeq: _*), requiredColumns)
      if (drift.nonEmpty)
        throw new IllegalStateException(s"corpus schema drift: ${drift.toSeq.sorted.mkString(", ")}")
      requiredColumns.size.toLong
    }

    g.add("funnel_flags", deps = Seq("validate_corpus"), retries = 1) {
      // the #144 derivation + the exact-dup keeper flag, written at
      // doc grain WITHOUT text (the layer is narrow; text always
      // re-reads from the immutable source corpus)
      val flags = QueriesText.funnelFlags(docs)
      val r3set = flags.where(col("r2"))
        .groupBy(md5(lower(trim(col("text")))).as("__th"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(true).as("__r3"))
      write(
        flags.select("doc_id", "lang", "source", "n_words", "r0", "r1", "r2")
          .join(r3set, Seq("doc_id"), "left")
          .withColumn("r3", coalesce(col("__r3"), lit(false)))
          .drop("__r3"),
        layout.flags)
    }

    g.add("neardup_pairs", deps = Seq("funnel_flags"), retries = 1) {
      val survivors = s.read.parquet(layout.flags).where(col("r3")).select("doc_id")
      val gated = docs.join(survivors, Seq("doc_id"), "left_semi")
      write(
        DedupOps.nearDupPairsAdaptive(gated, "doc_id", col("text"),
          n = 3, minJaccardPct = 50,
          // key = corpus fingerprint + gate id + RULES VERSION: the
          // certified budget is only valid for the survivor set it
          // was measured on, and that set depends on the gate rules'
          // CODE, which the corpus fingerprint can't see — a rules
          // bump forces re-certification on an unchanged corpus
          budgetKey = Some(DedupOps.snapshotKey(s"$sfDir/documents.parquet") +
            s"|r3|${QueriesText.funnelRulesVersion}"),
          budgetStore = Some(DedupOps.defaultBudgetStore),
          route = sketchRoute,
          boilerGuardPermille = boilerGuardPermille),
        layout.pairs)
    }

    g.add("neardup_resolve", deps = Seq("neardup_pairs"), retries = 1) {
      val resolved = DedupOps.resolveGroups(s.read.parquet(layout.pairs))
      val drops = resolved.where(col("doc_id") =!= col("group_id")).select("doc_id")
      write(
        s.read.parquet(layout.flags).where(col("r3"))
          .select("doc_id", "lang", "source", "n_words")
          .join(drops, Seq("doc_id"), "left_anti"),
        layout.keep)
    }

    // sibling branch: the release's dup-cluster profile from the SAME
    // written pairs layer — must keep running when the clean gate fails
    g.add("dup_profile", deps = Seq("neardup_pairs"), retries = 1) {
      val pairs = s.read.parquet(layout.pairs)
      val deg = pairs.select(col("doc1").as("doc_id"))
        .union(pairs.select(col("doc2").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      write(deg.groupBy("degree").agg(count(lit(1)).as("n_docs")), layout.dupStats)
    }

    g.add("paragraph_strip", deps = Seq("neardup_resolve"), retries = 1) {
      val keep = s.read.parquet(layout.keep)
      val gated = docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      val stripped = DedupOps.paragraphStrip(gated, "doc_id", col("text"), paraTokens = 20)
        .where(col("n_kept") >= 1) // stripped-to-nothing docs drop out
      write(
        stripped.join(keep.select("doc_id", "lang", "source"), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_paras"), col("n_kept"), col("text_clean").as("text")),
        layout.clean)
    }

    g.add("clean_quality_check", deps = Seq("paragraph_strip")) {
      JobGraph.gate(DataQuality.run(s.read.parquet(layout.clean), cleanSuite))
    }

    val terminals = addSelectionChain(g, s, () => s.read.parquet(layout.clean),
      layout.selected, layout.mixture, layout.splits, layout.packs,
      layout.export, layout.packPayloads,
      firstDep = Seq("clean_quality_check"), write = write)

    g.add("pipeline_metrics", deps = terminals :+ "dup_profile") {
      s.read.parquet(layout.packs).count()
    }
    g
  }

  /** Register the GLOBAL selection chain (token budget → mixture
    * materialization → split → pack) over a clean layer — shared by
    * the full-rebuild DAG and [[CorpusIncrementalDag]]'s per-batch
    * refresh. Selection is corpus-global BY NATURE: the #145 budget
    * threshold and the #147 water-fill allocation both move with
    * every appended batch (a new batch can evict previously admitted
    * docs), so the incremental path reruns this chain over the full
    * clean layer instead of pretending admission composes per batch.
    * One derivation = the two DAGs stay bit-identical on identical
    * clean content (the batch/stream twin-contract practice). */
  private[operators] def addSelectionChain(
      g: JobGraph, s: SparkSession, readClean: () => DataFrame,
      selected: String, mixture: String, splits: String, packs: String,
      export: String, packPayloads: String,
      firstDep: Seq[String], write: (DataFrame, String) => Long,
      skipWhen: () => Boolean = () => false): Seq[String] = {
    // `skipWhen`: the incremental DAG passes "this batch was empty" —
    // the standing selection layers are already exactly what a rerun
    // would produce (selection is a pure function of the clean layer,
    // which didn't change), so a no-op ingest day must not pay a
    // corpus-scale selection rebuild. Stages report metric 0 and leave
    // the layers untouched.
    def stage(id: String, deps: Seq[String])(body: => Long): Unit = {
      g.add(id, deps = deps, retries = 1) { if (skipWhen()) 0L else body }
      ()
    }

    stage("token_budget", deps = firstDep) {
      val clean = readClean()
      val admitted = QueriesText.tokenBudgetOn(clean.select("doc_id", "text"))
        .where(col("admitted"))
        .select("doc_id", "quality_score", "n_words")
      write(
        clean.join(admitted, Seq("doc_id"))
          .select("doc_id", "lang", "source", "quality_score", "n_words", "text"),
        selected)
    }

    stage("mix_materialize", deps = Seq("token_budget")) {
      // unordered #151: the layer is keyed by (doc_id, copy_id); only
      // the registered query pays the determinism orderBy — here it
      // would be an avoidable corpus-scale range exchange + sort
      write(
        QueriesText.mixMaterializeRaw(s.read.parquet(selected)),
        mixture)
    }

    stage("train_split", deps = Seq("mix_materialize")) {
      write(
        s.read.parquet(mixture)
          .withColumn("split", QueriesText.mdSplit(col("doc_id"))),
        splits)
    }

    stage("seq_pack", deps = Seq("train_split")) {
      val train = s.read.parquet(splits).where(col("split") === "train")
      val budget = 2048L
      write(
        ScanOps.exclusivePrefixSum(train, Seq("source"), Seq("doc_id", "copy_id"),
          col("n_words"), "tok_before")
          .select(col("doc_id"), col("copy_id"), col("source"), col("n_words"),
            call_function("div", col("tok_before"), lit(budget)).as("pack_id"),
            pmod(col("tok_before"), lit(budget)).as("pack_offset")),
        packs)
    }

    // the EXPORT last mile (r13 verdict #2): the mixture ledger joined
    // back to text, written as the release artifact users actually
    // read — hive-partitioned by (split, source) so a training reader
    // prunes at the directory level, range-clustered on doc_id so
    // row-group min/max prune inside partitions. repartitionByRange +
    // sortWithinPartitions makes the file layout a pure function of
    // the data: a rerun emits the same files (spec-pinned).
    stage("export_release", deps = Seq("train_split")) {
      val release = s.read.parquet(splits)
        .join(readClean().select("doc_id", "text"), Seq("doc_id"))
        .select("doc_id", "copy_id", "lang", "source", "split", "n_words", "text")
        .repartitionByRange(col("split"), col("source"), col("doc_id"), col("copy_id"))
      val obs = org.apache.spark.sql.Observation()
      // observe above a HASH-free layout chain: sortWithinPartitions
      // has no sampling pass, so the counter can sit under it safely —
      // but top placement costs nothing, so it goes on top
      graft.sources.ParquetSink.write(
        release.observe(obs, count(lit(1)).as("rows"))
          .sortWithinPartitions("split", "source", "doc_id", "copy_id"),
        export, partitionCols = Seq("split", "source"))
      obs.get("rows").asInstanceOf[Long]
    }

    // actual packed sequences (pack_id → concatenated token payload),
    // shared derivation with #153 — offsets reconcile with seq_pack's
    // ledger by construction (same prefix scan)
    stage("pack_payloads", deps = Seq("train_split")) {
      val train = s.read.parquet(splits).where(col("split") === "train")
        .select("doc_id", "copy_id", "source")
      write(
        graft.QueriesScale.packPayloadsOn(
          train.join(readClean().select("doc_id", "text"), Seq("doc_id"))),
        packPayloads)
    }

    Seq("seq_pack", "export_release", "pack_payloads")
  }

  /** Build and run sequentially; returns the report table. */
  def run(s: SparkSession, sfDir: String, root: String): Seq[JobGraph.JobReport] =
    build(s, sfDir, Layout(root)).run()
}
