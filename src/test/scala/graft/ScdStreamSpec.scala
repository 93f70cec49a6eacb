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
}
