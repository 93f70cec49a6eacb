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

/** Partitioned parquet sink (reference `write/write_parquet.py`,
  * `write/write_bronze.py`).
  *
  * Partition columns come from the caller (e.g. ingestion_date for
  * bronze, sales_year/month for silver); at scale the partition count
  * per write should stay in the thousands, so partition by coarse
  * time + low-cardinality dimensions only.
  */
object ParquetSink {
  def write(df: DataFrame, path: String, mode: String = "overwrite",
            partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
