package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source readers (reference `src/main/read/read_csv.py`).
  *
  * Schema-explicit, PERMISSIVE reads: malformed rows are captured in
  * `_corrupt_record` instead of failing the job, matching the
  * reference's quarantine-not-crash posture. An explicit schema also
  * means no sampling pass — at 100 TB inference would read the data
  * twice.
  */
object CsvSource {
  val CorruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Split a permissive read into (clean, corrupt) frames.
    *
    * The parse is materialized first (Spark disallows plans whose
    * scan references only `_corrupt_record`); in a pipeline this is
    * the bronze write itself — parse once, persist both outputs. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    (
      parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull)
    )
  }
}

/** JSONL (one JSON object per line) reader — the interchange format
  * of text/training-data corpora. Same schema-explicit PERMISSIVE
  * posture as [[CsvSource]]: no inference pass (at 100 TB sampling
  * reads the data twice), malformed lines quarantined in
  * `_corrupt_record`, never a crashed job. JSONL splits by line, so
  * a large file still fans out across tasks. */
object JsonlSource {
  val CorruptCol: String = CsvSource.CorruptCol

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (clean, corrupt) split; same contract as [[CsvSource.split]]. */
  def split(df: DataFrame): (DataFrame, DataFrame) = CsvSource.split(df)
}

/** Partitioned parquet sink (reference `write/write_parquet.py`,
  * `write/write_bronze.py`).
  *
  * Partition columns come from the caller (e.g. ingestion_date for
  * bronze, sales_year/month for silver); at scale the partition count
  * per write should stay in the thousands, so partition by coarse
  * time + low-cardinality dimensions only.
  */
object ParquetSink {
  /** `clusterBy`: sort rows within each output task before writing,
    * so parquet row-group min/max statistics become TIGHT ranges on
    * the cluster columns — the layout that lets a later
    * `WHERE key BETWEEN …` scan skip whole row groups. At 100 TB the
    * write-once sort is the cheapest pushdown you will ever buy; it
    * changes no row content, only co-location (and the verified
    * queries are partition-order-independent by contract). */
  def write(df: DataFrame, path: String, mode: String = "overwrite",
            partitionCols: Seq[String] = Nil, clusterBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val clustered =
      if (clusterBy.nonEmpty) df.sortWithinPartitions(clusterBy.map(col): _*) else df
    val w = clustered.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Same write contract over Spark's native ORC datasource — for
    * lakes whose standard is ORC (Hive heritage). The machinery is
    * format-symmetric: hive-style partition dirs, predicate pushdown
    * to the scan (`PushedFilters`, spec-asserted), and the clusterBy
    * layout trick lands in ORC stripe statistics exactly as it lands
    * in parquet row-group min/max. */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite",
               partitionCols: Seq[String] = Nil, clusterBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val clustered =
      if (clusterBy.nonEmpty) df.sortWithinPartitions(clusterBy.map(col): _*) else df
    val w = clustered.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** Schema-explicit ORC read (no inference pass; ORC is typed, so
    * the schema acts as a projection/compat contract, not a parser). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Retention pruning for a hive-partitioned table (the data-plane
    * form of the reference's file delete/move shells): drop every
    * `col=value` partition directory whose VALUE sorts strictly below
    * `keepFrom`. Comparison is lexicographic on the directory value —
    * correct for ISO dates (`ingestion_date=2026-08-01`) and
    * zero-padded numbers, the layouts the sink writes. Returns the
    * dropped values.
    *
    * Same exclusivity contract as [[compact]]: partition removal is
    * not atomic across directories, so run it in the table's
    * maintenance slot, never against a live-read path. */
  def pruneRetention(
      spark: SparkSession, path: String, partitionCol: String, keepFrom: String): Seq[String] = {
    // Hadoop FileSystem, not java.io.File: a retention job must work
    // against whatever filesystem the lake lives on (hdfs://, s3a://) —
    // java.io listing silently returns nothing for non-local schemes,
    // which would read as "nothing to drop" forever
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val dirs =
      if (fs.exists(hPath))
        fs.listStatus(hPath).filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val dropped = dirs.filter(_.getPath.getName.stripPrefix(prefix) < keepFrom)
    dropped.foreach(d => fs.delete(d.getPath, true))
    dropped.map(_.getPath.getName.stripPrefix(prefix)).toSeq.sorted
  }

  /** Compact a parquet directory to ≈`targetBytes` files: streaming
    * micro-batches and per-partition writes accrete small files, and
    * at 100 TB the file count (driver listing, task scheduling, open
    * cost) becomes its own bottleneck. Sizing from the actual on-disk
    * bytes, then one `repartition(n)` rewrite to a temp dir and an
    * atomic-ish swap. Returns the new file count.
    *
    * Requires EXCLUSIVE access to `path`: the two-move swap leaves a
    * brief window where the directory does not exist, so a concurrent
    * reader mid-swap fails — run compaction in the maintenance slot
    * of the table's write lock, never against a live-read path. */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    // Files.walk holds directory handles until closed — leak-free via Using
    val bytes = scala.util.Using.resource(Files.walk(dir)) { stream =>
      stream.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(Files.size).sum
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(tmp)
    val bak = path.stripSuffix("/") + "__compact_bak"
    Files.move(dir, Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bak))
    n
  }
}
