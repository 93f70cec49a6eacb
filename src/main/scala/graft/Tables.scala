package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish parquet testdata.
  *
  * Every loader is a bare parquet scan: no caching, no collect —
  * Catalyst prunes columns and pushes filters into the scan, which is
  * the property that matters at 100 TB (a 2-column projection must
  * read 2 columns).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  /** Fact tables get the same single-row-group spread treatment as
    * [[documents]] (see below): the testdata ships one unsplittable
    * row group per table, so without an explicit repartition every
    * scan+filter+partial-agg pipeline runs in ONE task. Spread is
    * ROUND-ROBIN, not keyed: a keyed repartition would force the key
    * column into every scan's ReadSchema and break column pruning
    * (asserted in PlanSpec).
    *
    * GATED on actual scan parallelism: on a splittable layout (many
    * files / row groups — any real cluster table) the scan already
    * yields ≥ cores partitions and the repartition would be a pure
    * full-fact shuffle per query, so it is skipped (spec-asserted in
    * BucketingSpec). */
  /** Scan partition count, memoized per (path, session): `df.rdd`
    * forces full physical planning + file listing, and the answer is
    * constant for a given path — paying it once per session instead
    * of several times per query keeps the gate off the driver's
    * critical path. */
  private val scanParts = new scala.collection.concurrent.TrieMap[(String, String, String), Int]
  private def scanPartitions(s: SparkSession, df: DataFrame, path: String): Int = {
    // maxPartitionBytes is part of the key: it decides file splitting,
    // and a count computed under a mutated conf (tests do this) must
    // not poison later lookups under the default conf
    val split = s.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    scanParts.getOrElseUpdate((s.sparkContext.applicationId, path, split), df.rdd.getNumPartitions)
  }

  /** Probe-only kill switch for the parallelism gate
    * (`spark.graft.spread.enabled=false` skips every spread): exists
    * so the per-query A/B instrument can measure each query with and
    * without the spread in one session. Engine default is true —
    * queries that want an unspread scan opt in per subtree (see the
    * raw-scan call sites), they don't flip this globally. */
  private def spreadEnabled(s: SparkSession): Boolean =
    s.conf.get("spark.graft.spread.enabled", "true").toBoolean

  private[graft] def spread(s: SparkSession, df: DataFrame, path: String): DataFrame = {
    val target = s.conf.get("spark.sql.shuffle.partitions").toInt
    if (!spreadEnabled(s) || scanPartitions(s, df, path) >= target) df
    else df.repartition(target)
  }

  /** Keyed variant for tables consumed by per-key compute (documents,
    * embeddings): same parallelism gate, hash-spread on the key. */
  private[graft] def spreadKeyed(s: SparkSession, df: DataFrame, key: org.apache.spark.sql.Column, path: String): DataFrame = {
    val target = s.conf.get("spark.sql.shuffle.partitions").toInt
    if (!spreadEnabled(s) || scanPartitions(s, df, path) >= target) df
    else df.repartition(key)
  }
  def orders(s: SparkSession, d: String): DataFrame    = spread(s, table(s, d, "orders"), s"$d/orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = spread(s, table(s, d, "lineitem"), s"$d/lineitem")

  /** UNSPREAD fact loaders — for subtrees whose FIRST operator
    * reduces the fact map-side (a narrow distinct, a partial
    * aggregation to a bounded grain, or a keyed exchange that
    * re-partitions every row anyway) and whose per-row map work is
    * trivial (column picks, date math). For that shape the spread is
    * a pure extra full-row exchange: the map side collapses the rows
    * before (or inside) the first real exchange, so parallelizing the
    * map buys nothing the exchange doesn't already pay for. Measured
    * per query with the interleaved A/B (OPTIMIZATION_r18.md §2):
    * 0.30–0.78× on 40+ reduce-first queries, while per-row-HEAVY maps
    * (tokenize, gram hashing, regex rules) keep the spread loaders —
    * there the spread is exactly what parallelizes the map at any SF.
    * On splittable layouts (any real cluster table) the spread gate is
    * an identity, so both loaders are THE SAME 100 TB plan; this
    * choice only exists on unsplittable single-row-group inputs. */
  def ordersUnspread(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitemUnspread(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def eventsUnspread(s: SparkSession, d: String): DataFrame   =
    normalizeEventTs(table(s, d, "events"))
  /** `ts` normalization across testdata generations: older generators
    * wrote TIMESTAMP(NANOS) — which Spark's reader rejects, so
    * [[GraftSession]] sets `nanosAsLong` and the column arrives as an
    * epoch-nanos long; current generators write TIMESTAMP_MICROS,
    * which Spark reads as TIMESTAMP_NTZ. Both normalize to a
    * session-zone TIMESTAMP (sessions run UTC, so the NTZ cast is a
    * value identity) so every downstream consumer sees one type.
    * Integer `div` on the nanos path — double division would lose
    * precision on 1.7e18-scale nanos. */
  /** The NTZ→TIMESTAMP cast and the TIMESTAMP literal in
    * [[eventsAfter]] are value-identities ONLY under a UTC session
    * zone (the long/nanos path is zone-independent). Enforce rather
    * than document: an externally built session used before
    * GraftSession.tune would otherwise silently shift every event
    * timestamp by the zone offset. */
  private[graft] def requireUtcSession(s: SparkSession, where: String): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone")
    val normalized = java.time.ZoneId.of(tz).normalized()
    if (normalized != java.time.ZoneOffset.UTC)
      throw new IllegalStateException(
        s"$where requires spark.sql.session.timeZone=UTC (got '$tz'): " +
          "the TIMESTAMP_NTZ->TIMESTAMP conversion of the events `ts` column is " +
          "zone-dependent and would silently shift values. Build the session via " +
          "GraftSession, or set the conf before reading events.")
  }

  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        requireUtcSession(df.sparkSession, "Tables.normalizeEventTs")
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    spread(s, normalizeEventTs(table(s, d, "events")), s"$d/events")

  /** Raw events scan, `ts` in its STORED type (epoch-nanos long or
    * TIMESTAMP_NTZ depending on testdata generation). Watermark
    * predicates must compare in the stored domain to reach the
    * parquet scan — use [[eventsAfter]], which picks the right
    * literal domain for whichever schema is on disk. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** Watermark-filtered incremental events read: applies `ts > bound`
    * in the stored column's own domain so the predicate pushes into
    * the parquet scan (`PushedFilters: GreaterThan(ts, …)`) for
    * either testdata generation, then normalizes `ts`. A filter on
    * the CONVERTED column would wrap it in an expression and scan
    * everything — at 100 TB that's reading a decade to get a day.
    * @param bound "yyyy-MM-dd HH:mm:ss", interpreted as UTC. */
  def eventsAfter(s: SparkSession, d: String, bound: String): DataFrame = {
    val raw = table(s, d, "events")
    val ldt = java.time.LocalDateTime.parse(bound,
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val pred = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") > lit(ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts") > lit(ldt)
      case org.apache.spark.sql.types.TimestampType =>
        requireUtcSession(s, "Tables.eventsAfter")
        col("ts") > lit(java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC)))
      case other =>
        throw new IllegalStateException(
          s"Tables.eventsAfter: unsupported stored type for events.ts: $other " +
            "(expected LongType nanos, TIMESTAMP_NTZ, or TIMESTAMP). A new testdata " +
            "generation needs an explicit literal-domain branch here so the watermark " +
            "predicate still pushes into the parquet scan.")
    }
    normalizeEventTs(raw.filter(pred))
  }

  /** documents/embeddings ship as SINGLE-row-group parquet files:
    * the scan is unsplittable, so every pre-shuffle map (tokenize,
    * gram-hash, per-bit SimHash vectors, cosine math) would run in ONE
    * task no matter how many cores exist. A hash repartition on the
    * primary key — a shuffle of well under a megabyte here — buys full
    * parallelism for all downstream per-row compute. On a real
    * multi-split cluster layout the scan parallelizes itself and this
    * repartition is skippable; for unsplittable inputs (single row
    * group, gzip text) it is exactly what you'd do at 100 TB too:
    * spread once, then compute. Filters/pruning still push through
    * the repartition into the scan. */
  def documents(s: SparkSession, d: String): DataFrame =
    spreadKeyed(s, table(s, d, "documents"), col("doc_id"), s"$d/documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spreadKeyed(s, table(s, d, "embeddings"), col("vec_id"), s"$d/embeddings")
}
