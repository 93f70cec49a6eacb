package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import java.nio.file.{Files, Paths, StandardOpenOption}
import graft.operators.Scd2

/** Streaming SCD Type 2: merge each micro-batch of dimension updates
  * into a versioned parquet state with [[Scd2.merge]] via
  * `foreachBatch`.
  *
  * The reference re-runs its whole pipeline to fold new customer
  * snapshots into the SCD table (`main.py` silver-customer step);
  * here the same merge runs per micro-batch. State is written to
  * `state_v{batch}` and a pointer file is updated afterwards —
  * readers never observe a half-written table, and parquet's
  * can't-overwrite-while-reading constraint is sidestepped. On a
  * cluster this pattern is what table formats (Delta/Iceberg)
  * productize; with plain parquet the version-swap keeps it atomic
  * enough for a single writer.
  *
  * OPERATIONAL CONTRACT: the checkpoint directory and `stateDir` are
  * one unit — retire or restore them TOGETHER. The replay guard below
  * identifies a committed merge by its version path, which is derived
  * from the batch id; resetting the checkpoint (batch ids restart at
  * 0) while keeping an old stateDir would make a fresh batch look
  * already-committed and silently skip its merge. Table formats pin
  * this with a stored (checkpointId, version) pair; with plain
  * parquet it is a deployment rule.
  */
object ScdStream {
  private def pointerFile(dir: String) = Paths.get(dir, "_CURRENT")

  /** Path of the current state version, if any. */
  def currentStatePath(dir: String): Option[String] = {
    val p = pointerFile(dir)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim).filter(_.nonEmpty)
    else None
  }

  /** Read the current SCD state (empty option on first run). */
  def currentState(spark: SparkSession, dir: String): Option[DataFrame] =
    currentStatePath(dir).map(spark.read.parquet(_))

  /** Wire a streaming updates source into an SCD2-merging sink.
    * Call `.trigger(...).start()` on the result. `prepare` runs on
    * each micro-batch BEFORE the merge (within-batch silver cleaning /
    * latest-wins dedup — aggregations that a streaming frame can't
    * carry but a foreachBatch frame can). */
  def writer(
      updates: DataFrame,
      stateDir: String,
      key: Seq[String],
      tracked: Seq[String],
      asOfForBatch: Long => org.apache.spark.sql.Column,
      prepare: DataFrame => DataFrame = identity
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream.foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
      val batch = prepare(rawBatch)
      val spark = batch.sparkSession
      val versionPath = s"$stateDir/state_v$batchId"
      // Crash-recovery idempotence. foreachBatch replays a batch if a
      // crash landed anywhere before the checkpoint's epoch commit.
      // Two windows:
      //  - crash BEFORE the pointer swap: the pointer still names the
      //    previous version, so the replay re-merges from it and the
      //    overwrite below heals any torn state_v{b} files;
      //  - crash AFTER the pointer swap: the pointer already names
      //    THIS batch's output — re-merging would read state_v{b} and
      //    overwrite the same path mid-read (parquet self-overwrite
      //    corruption). The pointer is written only after the state
      //    commit, so pointer==versionPath proves the merge finished:
      //    skip the replay entirely.
      if (!currentStatePath(stateDir).contains(versionPath)) {
        val existing = currentState(spark, stateDir)
          .getOrElse(Scd2.initialize(batch.limit(0), asOfForBatch(batchId)))
        val merged = Scd2.merge(existing, batch, key, tracked, asOfForBatch(batchId))
        merged.write.mode("overwrite").parquet(versionPath)
        Files.createDirectories(Paths.get(stateDir))
        // the pointer swap must itself be atomic: an in-place
        // truncate-then-write crashed mid-flush would leave an EMPTY
        // pointer, which reads as "no state" and silently reinitializes
        // the dimension from scratch on replay. Write-temp + ATOMIC_MOVE
        // means readers see either the old pointer or the new one.
        val tmp = Paths.get(stateDir, "_CURRENT.tmp")
        Files.write(tmp, versionPath.getBytes,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
        Files.move(tmp, pointerFile(stateDir),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }
}
