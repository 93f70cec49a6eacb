package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.{QueriesText, SparkSpec}

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, lang: String, text: String) =
    FunnelStream.Doc(id, lang, text, Timestamp.valueOf("2026-01-01 10:00:00"))

  // the CorpusFunnelSpec hand corpus: one casualty per stage
  private val b1 = "the quick brown fox jumps over a lazy dog while " +
    "the sun rises on a calm and bright morning sky"
  private val b2 = "every village beside this river keeps its old stone " +
    "bridge and paints it white before winter comes back to town"
  private val corpus = Seq(
    doc(1L, "en", s"$b1 $b2"),
    doc(2L, "en", s"$b1 $b2"),
    doc(3L, "de", s"$b1 $b2"),
    doc(4L, "en", "the cat sat on it"),
    doc(5L, "en", s"$b2 $b1"),
    doc(6L, "en", null))

  test("single-batch replay + ParagraphStream stage 4 reproduce the batch funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunnelStream.Doc]
    val q = FunnelStream.admissions(in.toDF())
      .writeStream.format("memory").queryName("funnel_adm").outputMode("append").start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
    } finally q.stop()
    val adm = spark.table("funnel_adm")

    // stage 4: the admitted sub-stream through the block ownership twin
    val admitted = adm.where(col("r3")).select(col("doc_id")).as[Long].collect().toSet
    val in2 = MemoryStream[ParagraphStream.Doc]
    val q2 = ParagraphStream.claims(in2.toDF(), paraTokens = 20)
      .writeStream.format("memory").queryName("funnel_claims").outputMode("append").start()
    try {
      in2.addData(corpus.filter(d => admitted(d.doc_id))
        .map(d => ParagraphStream.Doc(d.doc_id, d.text, d.ts)): _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = FunnelStream.profile(adm, spark.table("funnel_claims"))
      .collect().map(_.toSeq).toSeq
    val batch = QueriesText.corpusFunnelOn(
      corpus.map(d => (d.doc_id, d.lang, d.text)).toDF("doc_id", "lang", "text"))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"stream replay $streamed != batch $batch")
  }

  test("ownership is first-arrival across batches; gate failures never claim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunnelStream.Doc]
    val q = FunnelStream.admissions(in.toDF())
      .writeStream.format("memory").queryName("funnel_arrival").outputMode("append").start()
    try {
      // doc 3 fails the lang gate with the SAME text — it must not
      // poison the index for doc 9; doc 9 then owns; doc 1 is a dup
      in.addData(doc(3L, "de", s"$b1 $b2"))
      q.processAllAvailable()
      in.addData(doc(9L, "en", s"$b1 $b2"))
      q.processAllAvailable()
      in.addData(doc(1L, "en", s"$b1 $b2"))
      q.processAllAvailable()
      val r3 = spark.table("funnel_arrival")
        .as[FunnelStream.Admission].collect().map(a => a.doc_id -> a.r3).toMap
      assert(r3 == Map(3L -> false, 9L -> true, 1L -> false))
    } finally q.stop()
  }

  test("state is one owner per DISTINCT text: 50 dups hold 1 state row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunnelStream.Doc]
    val q = FunnelStream.admissions(in.toDF())
      .writeStream.format("memory").queryName("funnel_state").outputMode("append").start()
    try {
      in.addData((1L to 50L).map(i => doc(i, "en", s"$b1 $b2")): _*)
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"50 arrivals of one text must hold 1 state row, got $stateRows")
      val adm = spark.table("funnel_state").as[FunnelStream.Admission].collect()
      assert(adm.count(_.r3) == 1 && adm.length == 50)
      assert(adm.filter(_.r3).map(_.doc_id).toSeq == Seq(1L), "in-batch tiebreak is doc_id")
    } finally q.stop()
  }
}
