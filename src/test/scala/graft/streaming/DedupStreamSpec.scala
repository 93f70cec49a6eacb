package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    DedupStream.Doc(id, text, Timestamp.valueOf("2026-01-01 10:00:00"))

  private val base =
    "the quick brown fox jumps over the lazy dog while seven wizards brew strong potions at midnight"
  private val unrelated =
    "completely different subject matter entirely numerical tables accounting ledgers quarterly audits fiscal reports balance sheets"

  test("streaming near-dup gate flags a cross-batch near-duplicate, skips unrelated docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DedupStream.Doc]
    val q = DedupStream.candidates(in.toDF())
      .writeStream.format("memory").queryName("dedup_gate").outputMode("append").start()
    try {
      in.addData(doc(1, base), doc(2, unrelated))
      q.processAllAvailable()
      // batch 2: doc 11 is a near-edit of doc 1 (one word changed);
      // the shared 3-gram minhash bands must collide ACROSS batches
      in.addData(doc(11, base.replace("midnight", "dawn")), doc(12, unrelated.toUpperCase))
      q.processAllAvailable()
      // no .distinct(): within a micro-batch the gate emits each pair
      // once (cross-band collisions are collapsed to the lowest band)
      val rows = spark.table("dedup_gate")
        .select($"doc_id", $"prior_doc_id").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.distinct.size,
        s"pairs must be unique within a batch: $rows")
      val pairs = rows.toSet
      assert(pairs.contains((11L, 1L)), s"near-dup must be flagged, got $pairs")
      assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 2L) },
        s"unrelated docs must not collide: $pairs")
    } finally q.stop()
  }

  test("bucket state is bounded: a saturated bucket stops accumulating ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DedupStream.Doc]
    // identical text → identical signature → same buckets every time
    val q = DedupStream.candidates(in.toDF(), maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_gate_cap").outputMode("append").start()
    try {
      in.addData((1L to 5L).map(i => doc(i, base)): _*)
      q.processAllAvailable()
      in.addData(doc(6, base))
      q.processAllAvailable()
      val capRows = spark.table("dedup_gate_cap")
        .select($"doc_id", $"prior_doc_id").as[(Long, Long)].collect().toSeq
      assert(capRows.size == capRows.distinct.size,
        s"pairs must be unique within a batch: $capRows")
      val pairs = capRows.toSet
      // doc 6 sees only the 2 retained ids (1, 2), not all 5 priors
      assert(pairs.contains((6L, 1L)) && pairs.contains((6L, 2L)), pairs.toString)
      assert(!pairs.exists { case (a, b) => a == 6L && b > 2L },
        s"state must cap at maxPerBucket ids: $pairs")
    } finally q.stop()
  }

  test("saturated-bucket re-arrival across batches emits each pair exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DedupStream.Doc]
    val q = DedupStream.candidates(in.toDF(), maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_gate_replay").outputMode("append").start()
    try {
      // batch 1: bucket saturates at ids 1,2; doc 3 emits (3,1),(3,2)
      // but is NOT recorded in bucket state
      in.addData(doc(1, base), doc(2, base), doc(3, base))
      q.processAllAvailable()
      // batch 2: doc 3 RE-ARRIVES (the replay case) plus a genuinely
      // new doc 4
      in.addData(doc(3, base), doc(4, base))
      q.processAllAvailable()
      val rows = spark.table("dedup_gate_replay")
        .select($"doc_id", $"prior_doc_id").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.distinct.size,
        s"each pair must be emitted exactly once across batches: $rows")
      val pairs = rows.toSet
      assert(pairs == Set((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L)),
        s"replayed doc must not re-emit, new doc must still gate: $pairs")
    } finally q.stop()
  }
}
