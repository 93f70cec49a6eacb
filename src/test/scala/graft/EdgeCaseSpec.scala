package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin, Upsert}

/** Degenerate-input behavior: empty sides, single rows, all-null
  * payloads — the shapes that appear at 100 TB as empty partitions,
  * cold-start snapshots, and late-bootstrapping streams. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyKV = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "rv")

  test("as-of left join with an empty right keeps all left rows unmatched") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("lk", "lt", "tag")
    val out = AsOfJoin(left, emptyKV, "lk", "rk", "lt", "rt", Seq("rv"), "left")
    assert(out.count() == 2)
    assert(out.where(col("rv").isNotNull).count() == 0)
    // inner join on empty right: nothing
    assert(AsOfJoin(left, emptyKV, "lk", "rk", "lt", "rt", Seq("rv"), "inner").count() == 0)
  }

  test("upsert with an empty change batch is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String, String)].toDF("k", "v", "__op")
    val out = Upsert(base, none, Seq("k"), "__op")
    assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
  }

  test("upsert into an empty base is just the upsert rows") {
    val base = Seq.empty[(Long, String)].toDF("k", "v")
    val changes = Seq((1L, "a", "U"), (2L, null: String, "D")).toDF("k", "v", "__op")
    val out = Upsert(base, changes, Seq("k"), "__op").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a")))
  }

  test("range join with empty intervals emits nothing; inverted intervals are dropped") {
    val points = Seq((1L, 50L)).toDF("pk", "p")
    val none = Seq.empty[(Long, Long, Long)].toDF("ik", "s", "e")
    assert(RangeJoin.pointInInterval(points, none, "p", "s", "e", Seq(("pk", "ik")), 10L).count() == 0)
    val inverted = Seq((1L, 100L, 10L)).toDF("ik", "s", "e") // end < start
    assert(RangeJoin.pointInInterval(points, inverted, "p", "s", "e", Seq(("pk", "ik")), 10L).count() == 0)
  }

  test("negative range axis buckets correctly (div floors toward zero — spans still cover)") {
    // points/intervals on a negative axis (e.g. pre-epoch timestamps)
    val points = Seq((1L, -95L), (1L, -5L), (1L, 5L)).toDF("pk", "p")
    val intervals = Seq((1L, -100L, 10L, "span")).toDF("ik", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      Seq(("pk", "ik")), 30L)
    assert(out.count() == 3)
  }

  test("simhash64/minhash_sig on empty and single-token docs") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "a b c d e")).toDF("doc_id", "text")
    val sh = graft.text.DedupOps.simhash(df, "doc_id", col("text"))
    assert(sh.count() == 3) // total function: every doc gets a hash
    val mh = graft.text.DedupOps.minhashSignaturesNative(df, "doc_id", col("text"), n = 3, k = 4)
    // docs 1 and 2 have < 3 tokens -> no signature row
    assert(mh.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("knnJoinExact on degenerate corpora: single vector, k > corpus") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    def emb(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    // one vector: no self-match, empty result
    val one = emb((1L, Seq(1f, 0f)))
    assert(graft.vector.VectorOps.knnJoinExact(one, "vec_id", "embedding", k = 3).count() == 0)
    // k exceeds corpus-1: every other vector returned, ranks contiguous
    val three = emb((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
    val out = graft.vector.VectorOps.knnJoinExact(three, "vec_id", "embedding", k = 10)
      .select("query_id", "rank").as[(Long, Int)].collect()
    assert(out.length == 6) // 3 queries × 2 neighbors
    assert(out.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2)))
  }

  test("streaming dedup gate skips docs too short to sign") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[graft.streaming.DedupStream.Doc]
    val q = graft.streaming.DedupStream.candidates(in.toDF())
      .writeStream.format("memory").queryName("gate_short").outputMode("append").start()
    try {
      in.addData(
        graft.streaming.DedupStream.Doc(1, "", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
        graft.streaming.DedupStream.Doc(2, "one two", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
      q.processAllAvailable()
      // sub-n-token docs produce no signature -> no state, no crash
      assert(spark.table("gate_short").count() == 0)
    } finally q.stop()
  }
}
