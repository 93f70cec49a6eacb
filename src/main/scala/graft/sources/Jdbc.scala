package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC read/write surface (reference `src/main/write/database_write
  * .py:15-26`, `read/database_read.py`, `utility/my_sql_session.py`):
  * the mart-egress and dimension-ingest path of the pipeline.
  *
  * Scale posture:
  *  - [[JdbcSource.read]] without partitioning pulls the whole table
  *    through ONE connection — fine for small dims, fatal for facts.
  *    [[JdbcSource.readPartitioned]] splits the read into
  *    `numPartitions` range predicates on a numeric column, one
  *    connection per task — the only way a JDBC scan parallelizes.
  *  - [[JdbcSink.write]] caps `numPartitions` so a wide Spark job
  *    doesn't open thousands of simultaneous connections against one
  *    database, and batches inserts (`batchsize`) to amortize
  *    round-trips. The database, not Spark, is the bottleneck: a
  *    100 TB result does NOT go through JDBC — write parquet and
  *    bulk-load instead; this path is for marts and dims.
  */
object JdbcSource {
  /** Whole-table (or subquery) read over one connection: small
    * dimension tables only. `table` may be a table name or a
    * parenthesized subquery with an alias. */
  def read(spark: SparkSession, url: String, table: String, props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` tasks each scan
    * `[lower, upper]` slices of `partitionCol` (rows outside the
    * bounds still load, into the edge partitions). */
  def readPartitioned(
      spark: SparkSession, url: String, table: String, partitionCol: String,
      lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties
  ): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
}

object JdbcSink {
  /** Write `df` to a JDBC table. `maxConnections` bounds the write
    * parallelism (each task holds one connection; a 1000-executor job
    * must not open 1000 sessions against one mart database). */
  def write(
      df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append, maxConnections: Int = 8,
      batchSize: Int = 1000, props: Properties = new Properties
  ): Unit = {
    // repartition, NOT coalesce: coalesce propagates its low task
    // count up through every narrow stage, so the whole upstream
    // computation would run at write parallelism; the bounded shuffle
    // confines the fan-in to the write stage alone
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.repartition(maxConnections) else df
    val p = new Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    bounded.write.mode(mode).jdbc(url, table, p)
  }
}
