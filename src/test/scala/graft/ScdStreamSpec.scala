package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.ScdStream
import java.nio.file.Files

class ScdStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming SCD2 folds successive update batches into versioned state") {
    val root = Files.createTempDirectory("graft_scdstream").toString
    val src = s"$root/in"
    val state = s"$root/state"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def runBatch(rows: Seq[(Long, String)], asOfDate: String): Unit = {
      // stage one batch of updates, then drain with AvailableNow
      val staged = rows.toDF("k", "attr")
      staged.write.mode("overwrite").parquet(s"$root/staging")
      val files = new java.io.File(s"$root/staging").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.zipWithIndex.foreach { case (f, i) =>
        Files.copy(f.toPath, java.nio.file.Paths.get(src, s"${System.nanoTime()}_$i.parquet"))
      }
      val stream = spark.readStream.schema(staged.schema).parquet(src)
      val q = ScdStream.writer(stream, state, Seq("k"), Seq("attr"),
          _ => lit(asOfDate).cast("date"))
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    runBatch(Seq((1L, "a"), (2L, "b")), "2026-01-01")
    val s1 = ScdStream.currentState(spark, state).get
    assert(s1.count() == 2 && s1.filter($"is_current").count() == 2)

    // k=2 changes, k=3 arrives; k=1 absent (history kept)
    runBatch(Seq((2L, "B2"), (3L, "c")), "2026-02-01")
    val s2 = ScdStream.currentState(spark, state).get
      .select($"k", $"attr", $"is_current", $"valid_to".cast("string"))
      .as[(Long, String, Boolean, Option[String])].collect().toSet
    assert(s2 == Set(
      (1L, "a", true, None),
      (2L, "b", false, Some("2026-02-01")),
      (2L, "B2", true, None),
      (3L, "c", true, None)
    ))
    // both state versions exist; pointer names the latest
    assert(ScdStream.currentStatePath(state).get.endsWith("state_v1"))
  }

  test("streaming SCD2 recovers from a crash in either commit window") {
    val root = Files.createTempDirectory("graft_scdcrash").toString
    val src = s"$root/in"
    val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def stage(rows: Seq[(Long, String)]): Unit = {
      val staged = rows.toDF("k", "attr")
      staged.write.mode("overwrite").parquet(s"$root/staging")
      new java.io.File(s"$root/staging").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          Files.copy(f.toPath, java.nio.file.Paths.get(src, s"${System.nanoTime()}_$i.parquet"))
        }
    }
    def drain(asOfDate: String): Unit = {
      val schema = Seq((0L, "")).toDF("k", "attr").schema
      val q = ScdStream.writer(
          spark.readStream.schema(schema).parquet(src),
          state, Seq("k"), Seq("attr"), _ => lit(asOfDate).cast("date"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      // block until the AvailableNow run fully terminates and
      // deregisters — a timed wait can return while the query still
      // holds the checkpoint, failing the next drain with a
      // concurrent-use error
      q.awaitTermination()
    }
    def snapshot(): Set[(Long, String, Boolean)] =
      ScdStream.currentState(spark, state).get
        .select($"k", $"attr", $"is_current").as[(Long, String, Boolean)].collect().toSet

    stage(Seq((1L, "a"), (2L, "b")))
    drain("2026-01-01")
    assert(ScdStream.currentStatePath(state).get.endsWith("state_v0"))

    // window 1 — crash AFTER the state write started, BEFORE the
    // pointer swap: the next version dir holds torn files, the pointer
    // still names v0, the checkpoint never saw the batch. Restart must
    // re-deliver the batch, heal the torn dir, and swap the pointer.
    val torn = java.nio.file.Paths.get(state, "state_v1")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    stage(Seq((2L, "B2"), (3L, "c")))
    drain("2026-02-01")
    assert(ScdStream.currentStatePath(state).get.endsWith("state_v1"))
    val healed = snapshot()
    assert(healed == Set((1L, "a", true), (2L, "b", false), (2L, "B2", true), (3L, "c", true)), healed)

    // window 2 — crash AFTER the pointer swap, BEFORE the checkpoint's
    // epoch commit: erase the commit marker so restart re-delivers the
    // same batch while the pointer already names its output. The
    // replay must detect the committed merge and no-op — re-merging
    // would overwrite state_v1 while reading it.
    val commitMarker = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(Files.exists(commitMarker), "expected checkpoint commit marker for batch 1")
    Files.delete(commitMarker)
    // the local Hadoop FS shadows every file with a checksum; a stale
    // .crc makes the replayed commit's rename fail
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    drain("2026-02-01")
    assert(ScdStream.currentStatePath(state).get.endsWith("state_v1"))
    assert(snapshot() == healed, "replay of a committed batch must be a no-op")
  }
}
