package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.text.DedupOps

class ParagraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    ParagraphStream.Doc(id, text, Timestamp.valueOf("2026-01-01 10:00:00"))

  // paraTokens = 2 keeps the hand corpus readable (same as the batch
  // ParagraphDedupSpec)
  private val corpus = Seq(
    doc(1L, "a b c d"), // blocks [a b][c d], owns both
    doc(2L, "a b x"),   // [a b] dup, [x] first
    doc(3L, "a b a b")) // both blocks dup

  test("single-batch replay in doc order reproduces the batch profile") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ParagraphStream.Doc]
    val q = ParagraphStream.claims(in.toDF(), paraTokens = 2)
      .writeStream.format("memory").queryName("para_replay").outputMode("append").start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
      val streamed = ParagraphStream.profile(spark.table("para_replay"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val batch = DedupOps.paragraphDedup(
        corpus.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", col("text"), paraTokens = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(streamed == batch, s"stream replay $streamed != batch $batch")
    } finally q.stop()
  }

  test("ownership is first-arrival ACROSS batches, not doc-id order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ParagraphStream.Doc]
    val q = ParagraphStream.claims(in.toDF(), paraTokens = 2)
      .writeStream.format("memory").queryName("para_arrival").outputMode("append").start()
    try {
      // doc 9 arrives FIRST and claims [a b] even though doc 1 has the
      // smaller id; when doc 1 arrives later its copy is a dup
      in.addData(doc(9L, "a b"))
      q.processAllAvailable()
      in.addData(doc(1L, "a b"))
      q.processAllAvailable()
      val claims = spark.table("para_arrival")
        .as[ParagraphStream.Claim].collect().map(c => c.doc_id -> c.owned).toMap
      assert(claims(9L), "first arrival owns the block")
      assert(!claims(1L), "smaller doc_id arriving later is a dup")
    } finally q.stop()
  }

  test("state is one owner per DISTINCT block: a viral block re-arrival adds no state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ParagraphStream.Doc]
    val q = ParagraphStream.claims(in.toDF(), paraTokens = 2)
      .writeStream.format("memory").queryName("para_state").outputMode("append").start()
    try {
      in.addData((1L to 50L).map(i => doc(i, "a b")): _*)
      q.processAllAvailable()
      val prog = q.lastProgress
      val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"50 arrivals of one block must hold 1 state row, got $stateRows")
      val claims = spark.table("para_state").as[ParagraphStream.Claim].collect()
      assert(claims.count(_.owned) == 1 && claims.length == 50)
    } finally q.stop()
  }

  test("ntok rides the claim: partial tail blocks carry their real token count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ParagraphStream.Doc]
    val q = ParagraphStream.claims(in.toDF(), paraTokens = 2)
      .writeStream.format("memory").queryName("para_ntok").outputMode("append").start()
    try {
      in.addData(doc(1L, "a b c"))
      q.processAllAvailable()
      val byIdx = spark.table("para_ntok").as[ParagraphStream.Claim]
        .collect().map(c => c.para_idx -> c.ntok).toMap
      assert(byIdx == Map(0 -> 2L, 1 -> 1L))
    } finally q.stop()
  }
}
