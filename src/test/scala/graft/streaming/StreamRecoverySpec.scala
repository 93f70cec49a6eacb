package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Checkpoint-restart durability for the stateful streams: the state
  * (band-bucket index, per-key sketches) must survive a query
  * stop/restart — a crashed ingestion job that resumes from its
  * checkpoint must keep gating against everything it already saw. */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("DedupStream's bucket index survives a restart: old docs still gate new ones") {
    val root = Files.createTempDirectory("graft_dedup_restart").toString
    val src = s"$root/in"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def stage(id: Long): Unit = {
      val df = Seq((id, text, Timestamp.valueOf("2026-01-01 10:00:00")))
        .toDF("doc_id", "text", "ts")
      df.write.mode("overwrite").parquet(s"$root/staging")
      new java.io.File(s"$root/staging").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          Files.copy(f.toPath, java.nio.file.Paths.get(src, s"${System.nanoTime()}_$i.parquet"))
        }
    }
    def drain(): Unit = {
      val schema = Seq((0L, "", Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("doc_id", "text", "ts").schema
      val q = DedupStream.candidates(
          spark.readStream.schema(schema).parquet(src))
        .toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: doc 1 seeds the index; no candidates possible
    stage(1L)
    drain()
    assert(spark.read.parquet(out).where(col("doc_id").isNotNull).count() == 0)

    // "crash" = the query object is gone; run 2 resumes from the
    // checkpoint with an identical doc 2 — a pair against doc 1 can
    // only appear if the bucket state was restored
    stage(2L)
    drain()
    val pairs = spark.read.parquet(out)
      .select($"doc_id", $"prior_doc_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 1L)), s"restart lost the standing index: $pairs")
  }

  test("TopKStream's sketch counts accumulate across a restart") {
    val root = Files.createTempDirectory("graft_topk_restart").toString
    val src = s"$root/in"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def stage(word: String, n: Int): Unit = {
      val df = (1 to n).map(_ => ("k", word, Timestamp.valueOf("2026-01-01 10:00:00")))
        .toDF("key", "item", "ts")
      df.write.mode("overwrite").parquet(s"$root/staging")
      new java.io.File(s"$root/staging").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          Files.copy(f.toPath, java.nio.file.Paths.get(src, s"${System.nanoTime()}_$i.parquet"))
        }
    }
    def drain(outDir: String): Unit = {
      val schema = Seq(("", "", Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("key", "item", "ts").schema
      val q = TopKStream.topKFrame(
          spark.readStream.schema(schema).parquet(src), capacity = 8, k = 3)
        .toDF()
        // memory sink refuses checkpoint recovery; foreachBatch is the
        // recoverable route for Update-mode emissions
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir); ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    stage("x", 30)
    drain(s"$root/out1")
    stage("x", 20)
    drain(s"$root/out2") // fresh dir: only run-2 emissions
    val counts = spark.read.parquet(s"$root/out2")
      .where($"item" === "x").select($"count").as[Long].collect()
    assert(counts.nonEmpty, "restart must re-emit the key's leaderboard")
    // 30 from the restored sketch + 20 new: a fresh sketch would say 20
    assert(counts.max >= 50L, s"restart lost sketch state: ${counts.toSeq}")
  }
}
