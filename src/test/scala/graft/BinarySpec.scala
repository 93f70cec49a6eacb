package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryOps
import graft.sources.{CsvSource, ParquetSink}
import org.apache.spark.sql.types._
import java.nio.file.Files

class BinarySpec extends SparkSpec {
  import spark.implicits._

  test("binary decode appends typed metadata partition-wise") {
    val df = Seq((1L, "abcd"), (2L, "")).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("payload"))
    val out = BinaryOps.decode(df, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "width", "height", "channels", "format"))
    val rows = out.select("id", "width", "height", "format").as[(Long, Int, Int, String)].collect().toMap3
    assert(rows(1L) == ((64 + 4 * 7, 64 + 4 * 13, "rgba"))) // 'a'=97 odd
    assert(rows(2L) == ((64, 64, "empty")))
  }

  test("decode result is stable across partition counts") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val a = BinaryOps.decode(docs.repartition(1), "payload").orderBy("doc_id").collect()
    val b = BinaryOps.decode(docs.repartition(13), "payload").orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("resize emits bounded derivative payloads with target dims") {
    val df = Tables.documents(spark, sf).limit(20)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val out = BinaryOps.resize(df, "payload", 256, 256)
    assert(out.filter(length($"resized_payload") > 256 * 256 / 64).count() == 0)
    assert(out.select("resized_width").distinct().as[Int].collect().toSeq == Seq(256))
  }

  test("frame sampling explodes one row per frame, slices cover the head of the payload") {
    val df = Seq((1L, "0123456789abcdef")).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("payload"))
    val frames = BinaryOps.sampleFrames(df, "payload", 4)
      .select($"frame_idx", $"frame_bytes".cast("string"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(frames == Seq((0, "0123"), (1, "4567"), (2, "89ab"), (3, "cdef")))
  }

  test("csv source quarantines malformed rows instead of failing") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val (clean, corrupt) = CsvSource.split(CsvSource.read(spark, dir, schema))
    assert(clean.count() == 2 && corrupt.count() == 1)
  }

  test("jsonl source quarantines malformed lines, round-trips clean docs") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.write(java.nio.file.Paths.get(dir, "d.jsonl"),
      ("""{"doc_id": 1, "text": "hello world"}""" + "\n" +
        """{"doc_id": "NOT A NUMBER", "text": "bad"}""" + "\n" +
        """this is not json at all""" + "\n" +
        """{"doc_id": 3, "text": "third"}""" + "\n").getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, corrupt) = graft.sources.JsonlSource.split(
      graft.sources.JsonlSource.read(spark, dir, schema))
    assert(corrupt.count() == 2)
    assert(clean.select($"doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("parquet sink writes hive-style partitions") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/out"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("v", "p")
    ParquetSink.write(df, dir, partitionCols = Seq("p"))
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("p="))
    assert(sub.toSet == Set("p=a", "p=b"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("parquet sink clusterBy sorts rows within every output file") {
    val dir = Files.createTempDirectory("graft_cluster").toString + "/out"
    val df = spark.range(0, 10000).selectExpr("pmod(id * 2654435761, 10000) as v")
      .repartition(4)
    ParquetSink.write(df, dir, clusterBy = Seq("v"))
    // pin the split confs so each file maps to exactly ONE input
    // partition (and verify it per-partition below) — then in-file row
    // order IS iterator order inside mapPartitions, with no reliance
    // on collect_list's order surviving a shuffle or on files being
    // small enough not to split
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${1024L * 1024 * 1024}")
    spark.conf.set("spark.sql.files.openCostInBytes", s"${512L * 1024 * 1024}")
    try {
      val parts = spark.read.parquet(dir)
        .select($"v", input_file_name().as("f")).as[(Long, String)]
        .mapPartitions { it =>
          val rows = it.toVector
          if (rows.isEmpty) Iterator.empty
          else Iterator.single(
            (rows.map(_._2).distinct.size, rows.map(_._1) == rows.map(_._1).sorted, rows.size))
        }.collect()
      assert(parts.nonEmpty)
      parts.foreach { case (filesInPart, sorted, _) =>
        assert(filesInPart == 1, "split confs must map each file to exactly one partition")
        assert(sorted, "rows must be sorted within each file")
      }
      assert(parts.map(_._3).sum == 10000) // content unchanged
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }

  implicit class MapOps3[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap3: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
