package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Bronze, Gold, Scd2, Silver}

/** End-to-end INCREMENTAL medallion: the DAG-of-jobs composition the
  * reference drives sequentially in `main.py:100-340` (bronze split →
  * silver clean → SCD2 customer merge → gold star join → monthly
  * mart), re-expressed as two Structured Streaming sinks over one
  * shared on-disk layout plus derived gold/mart reads.
  *
  *  - [[dimWriter]]: dimension updates → within-batch silver prepare →
  *    [[ScdStream]] versioned SCD2 state (replay-safe pointer swap).
  *  - [[factWriter]]: raw facts → bronze valid/rejected split → silver
  *    transform → per-batch parquet appends. Each micro-batch writes
  *    its OWN `batch_v{id}` directory with overwrite, so a foreachBatch
  *    replay after a crash heals torn files instead of duplicating rows
  *    (same idempotence contract as ScdStream, minus the pointer —
  *    facts are append-only, so the batch directory IS the commit).
  *  - [[gold]] / [[mart]]: derived reads joining the accumulated
  *    silver fact with the CURRENT dimension state — computed at read
  *    time, so they are always consistent with whatever has committed,
  *    which is how lakehouse gold views behave between refreshes.
  *
  * Ordering contract (the Airflow DAG edge, now explicit in code):
  * within an ingest cycle run the DIMENSION sink before the FACT
  * sink — [[runCycle]] encodes it — so facts never enrich against a
  * dimension snapshot older than their own cycle. Gold reads inner-join
  * facts to the current dimension; a fact arriving before its dim row
  * simply surfaces in the next read, it is never lost (the silver
  * directory keeps it).
  *
  * Scale shape: every per-batch transform is narrow (bronze split +
  * silver map) except the within-batch dedup (map-side `max_by`) and
  * the SCD2 merge (keyed joins on the dimension, never fact-sized);
  * gold is a broadcast star join over a parquet scan pruned to the
  * projected columns. Nothing accumulates in executor state — all
  * cross-batch state lives in the layout's parquet, exactly where a
  * 1000-executor deployment wants it.
  */
object MedallionStream {

  /** One root directory per pipeline instance: checkpoints, SCD state,
    * silver fact, rejects all live under it (retire together — the
    * ScdStream operational contract). */
  final case class Layout(root: String) {
    val rejectedDir: String = s"$root/bronze_rejected"
    val silverDir: String = s"$root/silver_fact"
    val scdDir: String = s"$root/scd_dim"
    def factCheckpoint: String = s"$root/_chk_fact"
    def dimCheckpoint: String = s"$root/_chk_dim"
  }

  /** Dimension sink: silver `prepare` (standardize/dedup, per batch)
    * then SCD2 merge into versioned state. */
  def dimWriter(
      dimUpdates: DataFrame,
      layout: Layout,
      key: Seq[String],
      tracked: Seq[String],
      asOfForBatch: Long => Column,
      prepare: DataFrame => DataFrame = identity
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    ScdStream.writer(dimUpdates, layout.scdDir, key, tracked, asOfForBatch, prepare)
      .option("checkpointLocation", layout.dimCheckpoint)

  /** Fact sink: bronze split (valid → silver transform → silver dir;
    * rejected + first-match-wins reason → rejects dir), one
    * overwrite-committed directory per micro-batch. */
  def factWriter(
      rawFacts: DataFrame,
      layout: Layout,
      rules: Seq[Bronze.Rule],
      toSilver: DataFrame => DataFrame,
      ingestDate: Column
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    rawFacts.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val stamped = Bronze.stampIngestion(batch, ingestDate)
      Bronze.rejected(stamped, rules)
        .write.mode("overwrite").parquet(s"${layout.rejectedDir}/batch_v$batchId")
      toSilver(Bronze.valid(stamped, rules))
        .write.mode("overwrite").parquet(s"${layout.silverDir}/batch_v$batchId")
      ()
    }.option("checkpointLocation", layout.factCheckpoint)

  /** Accumulated silver fact across all committed micro-batches. */
  def silverFact(spark: SparkSession, layout: Layout): DataFrame =
    spark.read.parquet(s"${layout.silverDir}/batch_v*")

  /** Accumulated bronze rejects (audit surface). */
  def rejectedFact(spark: SparkSession, layout: Layout): DataFrame =
    spark.read.parquet(s"${layout.rejectedDir}/batch_v*")

  /** CURRENT rows of the SCD2 dimension (None before the first dim
    * batch commits). */
  def dimCurrent(spark: SparkSession, layout: Layout): Option[DataFrame] =
    ScdStream.currentState(spark, layout.scdDir)
      .map(_.filter(col(Scd2.IsCurrent)))

  /** Gold view: accumulated silver fact ⋈ current dimension (broadcast
    * — the dimension is the bounded side). SCD columns are dropped:
    * gold is the denormalized business view, not the history. */
  def gold(spark: SparkSession, layout: Layout, joinCond: Column): DataFrame = {
    val dim = dimCurrent(spark, layout).getOrElse(
      throw new IllegalStateException(
        s"MedallionStream.gold: no committed dimension state under ${layout.scdDir} — " +
          "run the dim sink first (the DAG edge runCycle encodes)"))
      .drop(Scd2.ValidFrom, Scd2.ValidTo, Scd2.IsCurrent)
    Gold.starJoin(silverFact(spark, layout), Seq((dim, joinCond)))
  }

  /** Monthly mart over [[gold]] (reference
    * customer_mart_sql_tranform_write.py). */
  def mart(spark: SparkSession, layout: Layout, joinCond: Column,
           key: String, dateCol: Column, amount: Column): DataFrame =
    Gold.monthlyMart(gold(spark, layout, joinCond), key, dateCol, amount)

  /** One ingest cycle with the dependency edge enforced: dimension
    * stream drains BEFORE the fact stream starts. Pass queries built
    * with `Trigger.AvailableNow` (file sources) or drive MemoryStream
    * tests through the same two-phase order. */
  def runCycle(startDim: () => org.apache.spark.sql.streaming.StreamingQuery,
               startFact: () => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val d = startDim(); d.awaitTermination()
    val f = startFact(); f.awaitTermination()
  }
}
