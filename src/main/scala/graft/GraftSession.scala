package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the role of the reference's session helper
  * (`src/main/utility/spark_session.py`) but configured for Spark's
  * cost-based + adaptive execution from the start:
  *
  *  - AQE on (runtime partition coalescing, skew-join splitting) —
  *    at 100 TB the static shuffle-partition count is always wrong,
  *    so we let AQE re-plan to the advisory target size.
  *  - `spark.sql.shuffle.partitions` defaults to the local core
  *    count; on a real cluster set it to 2–3× total cores and let
  *    AQE coalesce down.
  *  - UTC session timezone so date/timestamp semantics are stable
  *    across driver and oracle.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      // the engine runs WITH its own extension (SQL function surface +
      // the ExpandFreeDistinct optimizer rule) — the correctness gate
      // and every spec therefore continuously prove the injected
      // rule's non-interference with the whole query surface
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the loaders round-robin-spread unsplittable single-row-group
      // inputs; the pre-repartition binary row sort only exists for
      // retry determinism, and every verified query is
      // partition-independent by contract (exact decimal/integer
      // math), so skip the sort
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      // older testdata generations carry TIMESTAMP(NANOS) in
      // events.parquet, which Spark rejects; read those as epoch-nanos
      // long — Tables.normalizeEventTs converts either generation to a
      // session-zone timestamp. No-op on TIMESTAMP_MICROS data.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see tune(): object aggregates shouldn't sort-fall-back at
      // 128 groups
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Recommended conf for a real multi-executor deployment — the
    * cluster-side counterpart of [[local]]'s laptop settings. Values
    * follow the scale design in SURVEY §4 / BENCH_NOTES:
    *
    *  - shuffle partitions ≈ 2–3 × total cores as the STATIC upper
    *    bound; AQE coalesces down to the advisory size at runtime, so
    *    oversizing is cheap and undersizing is not.
    *  - 64–128 MB post-shuffle partitions keep reducers in cache and
    *    spill-free at typical 4–8 GB/core executor memory.
    *  - 128 MB input splits match the parquet row-group layout a
    *    100 TB table should be written with.
    *  - skew-join splitting stays on: at 1000 executors one hot key
    *    is otherwise the whole job's critical path.
    */
  def clusterConf(totalCores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (totalCores * 3).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (96L * 1024 * 1024).toString,
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC"
  )

  /** Apply graft defaults to an externally-built session (used by the
    * driver's Verify/Bench mains which own the builder). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the engine leans on object aggregates (collect_set baskets,
    // sketch TypedImperativeAggregates); the default 128-group
    // in-memory threshold makes ObjectHashAggregate fall back to a
    // sort-based pass on any real group count. 64k groups × small
    // buffers is well inside executor memory at our partition sizing.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    spark
  }
}
