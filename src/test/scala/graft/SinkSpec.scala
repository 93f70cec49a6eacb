package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.ParquetSink

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes partitions at read time (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft_prune").toString + "/orders_part"
    val o = Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
    ParquetSink.write(o, dir, partitionCols = Seq("order_year"))

    val read = spark.read.parquet(dir).where(col("order_year") === 1995)
    val scan = read.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("order_year"), scan)
    // the pruned read returns exactly the partition's rows
    val expect = o.where(col("order_year") === 1995).count()
    assert(read.count() == expect && expect > 0)
  }

  test("ORC sink: partition pruning and predicate pushdown reach the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/orders_orc"
    val o = Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
    ParquetSink.writeOrc(o, dir, partitionCols = Seq("order_year"))

    val schema = spark.read.orc(dir).schema
    val read = graft.sources.ParquetSink.readOrc(spark, dir, schema)
      .where(col("order_year") === 1995 && col("o_totalprice") > 1000.0)
    val scan = read.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan orc")).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("order_year"), scan)
    assert(scan.contains("PushedFilters") && scan.contains("o_totalprice"), scan)
    val expect = o.where(col("order_year") === 1995 && col("o_totalprice") > 1000.0).count()
    assert(read.count() == expect && expect > 0)
  }

  test("ORC round-trips the same frame parquet writes (format symmetry)") {
    val root = Files.createTempDirectory("graft_fmt").toString
    val df = Tables.customer(spark, sf).limit(200)
    ParquetSink.write(df, s"$root/p")
    ParquetSink.writeOrc(df, s"$root/o")
    val p = spark.read.parquet(s"$root/p")
    val orc = spark.read.orc(s"$root/o")
    assert(p.schema == orc.schema, s"${p.schema} vs ${orc.schema}")
    assert(p.exceptAll(orc).isEmpty && orc.exceptAll(p).isEmpty)
  }

  test("retention pruning drops partitions below the cutoff, keeps the rest readable") {
    val dir = Files.createTempDirectory("graft_retain").toString + "/events_daily"
    val df = Seq(
      ("2026-07-30", 1L), ("2026-07-31", 2L), ("2026-08-01", 3L), ("2026-08-02", 4L))
      .toDF("ingestion_date", "v")
    ParquetSink.write(df, dir, partitionCols = Seq("ingestion_date"))

    val dropped = ParquetSink.pruneRetention(spark, dir, "ingestion_date", keepFrom = "2026-08-01")
    assert(dropped == Seq("2026-07-30", "2026-07-31"), dropped)
    val left = spark.read.parquet(dir)
    assert(left.select("ingestion_date").distinct().as[String].collect().sorted.toSeq ==
      Seq("2026-08-01", "2026-08-02"))
    assert(left.count() == 2)
    // idempotent: nothing below the cutoff remains
    assert(ParquetSink.pruneRetention(spark, dir, "ingestion_date", "2026-08-01").isEmpty)
  }

  test("compact rewrites a fragmented directory to the sized file count") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/frag"
    // simulate micro-batch accretion: 64 tiny files
    Tables.orders(spark, sf).repartition(64).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 64)
    val before = spark.read.parquet(dir).count()

    val n = ParquetSink.compact(spark, dir, targetBytes = 512L * 1024)
    assert(files() == n && n < 64, s"expected <64 sized files, got ${files()}")
    assert(spark.read.parquet(dir).count() == before)
  }
}
