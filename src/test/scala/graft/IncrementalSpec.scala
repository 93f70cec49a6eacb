package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, IncrementalRunner, WatermarkStore}
import java.nio.file.Files

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  // filters in the stored ts domain so the predicate pushes into the
  // scan, whatever schema generation the testdata carries
  private def readEventsAfter(bound: String): DataFrame =
    Tables.eventsAfter(spark, sf, bound)

  test("incremental tick processes only new data and advances the mark") {
    val dir = Files.createTempDirectory("graft_inc").toString
    val store = new WatermarkStore(dir, defaultMark = "2024-01-10 00:00:00")
    val runner = new IncrementalRunner(store, "events", bufferSeconds = 0L)
    var sunk = 0L

    val (n1, mark1) = runner.tick(
      readEventsAfter,
      df => df.select($"event_id", $"ts", $"value"),
      df => sunk += df.count(),
      date_format($"ts", "yyyy-MM-dd HH:mm:ss")
    )
    assert(n1 > 0 && mark1.isDefined && sunk == n1)
    assert(store.get("events") == mark1.get)

    // second tick from the new mark: only events in the final second
    // (if any) — strictly fewer than the first
    val (n2, _) = runner.tick(
      readEventsAfter,
      identity, _ => (), date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
    assert(n2 < n1)

    // empty increment: mark unchanged
    val before = store.get("events")
    val (n3, mark3) = runner.tick(
      _ => readEventsAfter("2099-01-01 00:00:00"),
      identity, _ => fail("sink must not run for empty increment"),
      date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
    assert(n3 == 0 && mark3.isEmpty && store.get("events") == before)
  }

  test("buffer re-reads overlap for late arrivals") {
    val dir = Files.createTempDirectory("graft_inc2").toString
    val store = new WatermarkStore(dir, defaultMark = "2024-01-10 00:00:00")
    store.update("events", "2024-01-20 00:00:00")
    val noBuf = new IncrementalRunner(store, "events", bufferSeconds = 0L)
    val buf = new IncrementalRunner(store, "events", bufferSeconds = 86400L)
    assert(noBuf.lowerBound() == "2024-01-20 00:00:00")
    assert(buf.lowerBound() == "2024-01-19 00:00:00")
    assert(readEventsAfter(buf.lowerBound()).count() > readEventsAfter(noBuf.lowerBound()).count())
  }

  test("data-quality suite: clean table passes, seeded violations are counted") {

    val clean = DataQuality.run(Tables.orders(spark, sf), Seq(DataQuality.NotNull("o_custkey"), DataQuality.Unique("o_orderkey")))
    assert(DataQuality.passed(clean))

    val dirty = Seq((1L, Some("a")), (1L, Some("b")), (2L, None)).toDF("k", "v")
    val res = DataQuality.run(dirty, Seq(DataQuality.NotNull("v"), DataQuality.Unique("k"), DataQuality.Satisfies("k_positive", $"k" > 0)))
      .as[(String, Long)].collect().toMap
    assert(res("row_count") == 3 && res("not_null_v_violations") == 1 &&
      res("unique_k_violations") == 1 && res("k_positive_violations") == 0)
    assert(!DataQuality.passed(DataQuality.run(dirty, Seq(DataQuality.NotNull("v")))))

    // an EMPTY frame has zero violations by definition (an
    // all-filtered incremental batch is a legitimate state — the
    // sum-based aggregates must not surface NULL to the gate)
    val empty = DataQuality.run(dirty.where($"k" < 0),
      Seq(DataQuality.NotNull("v"), DataQuality.Unique("k"),
        DataQuality.Between("k", 0, 10), DataQuality.MatchesRegex("v", "a"),
        DataQuality.Satisfies("k_positive", $"k" > 0)))
    assert(DataQuality.passed(empty))
    assert(graft.operators.JobGraph.gate(empty) == 0L,
      "the job-graph gate must pass an empty layer, not crash on NULL")
  }

  test("normalizeEventTs refuses a non-UTC session for NTZ inputs, accepts UTC aliases") {
    val ntz = spark.range(1).select(expr("timestamp_ntz'2024-01-01 00:00:00'").as("ts"))
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ex = intercept[IllegalStateException](Tables.normalizeEventTs(ntz))
      assert(ex.getMessage.contains("UTC"))
      // normalized aliases of UTC must all pass
      Seq("UTC", "Etc/UTC", "GMT", "Z").foreach { alias =>
        spark.conf.set(tzKey, alias)
        assert(Tables.normalizeEventTs(ntz).schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType)
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("eventsAfter fails loudly on an unsupported stored ts type") {
    val dir = Files.createTempDirectory("graft_badts").toString
    spark.range(3).selectExpr("cast(id as string) as ts", "id as event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException](
      Tables.eventsAfter(spark, dir, "2024-01-01 00:00:00"))
    assert(ex.getMessage.contains("StringType"))
  }

  test("schema expectation reports missing and unexpected columns without a scan") {
    val df = Seq((1L, "a")).toDF("k", "v")
    assert(DataQuality.columnsMatchSet(df, Set("k", "v")).isEmpty)
    assert(DataQuality.columnsMatchSet(df, Set("k", "w")) == Set("missing:w", "unexpected:v"))
  }
}
