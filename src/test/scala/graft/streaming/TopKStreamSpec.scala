package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def it(key: String, word: String) =
    TopKStream.Item(key, word, Timestamp.valueOf("2026-01-01 10:00:00"))

  test("streaming top-k keeps Space-Saving bounds across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[TopKStream.Item]
    val q = TopKStream.topK(in.toDS(), capacity = 8, k = 3)
      .writeStream.format("memory").queryName("topk_stream").outputMode("update").start()
    try {
      // batch 1: heavy hitter "x" ×30 against 15 distinct noise words
      in.addData(Seq.fill(30)(it("a", "x")) ++ (1 to 15).map(i => it("a", s"n$i")): _*)
      q.processAllAvailable()
      // batch 2: 20 more "x", fresh noise — state carries across batches
      in.addData(Seq.fill(20)(it("a", "x")) ++ (16 to 30).map(i => it("a", s"n$i")): _*)
      q.processAllAvailable()
      val rows = spark.table("topk_stream")
        .select($"item", $"count", $"err").as[(String, Long, Long)].collect()
      val xs = rows.filter(_._1 == "x")
      assert(xs.nonEmpty, "heavy hitter must appear in every emission")
      // count never under-estimates; count - err never over-estimates
      assert(xs.map(_._2).max >= 50, s"final count must cover all 50 occurrences: ${xs.toSeq}")
      xs.foreach { case (_, c, e) => assert(c - e <= 50, s"lower bound $c-$e must not exceed truth") }
      // state is bounded: no emission ranks beyond k
      assert(spark.table("topk_stream").select("rank").as[Int].collect().forall(_ <= 3))
    } finally q.stop()
  }

  test("keys are sketched independently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[TopKStream.Item]
    val q = TopKStream.topK(in.toDS(), capacity = 4, k = 1)
      .writeStream.format("memory").queryName("topk_keys").outputMode("update").start()
    try {
      in.addData(Seq.fill(5)(it("a", "apple")) ++ Seq.fill(7)(it("b", "banana")): _*)
      q.processAllAvailable()
      val top = spark.table("topk_keys")
        .select($"key", $"item", $"count").as[(String, String, Long)].collect().toSet
      assert(top == Set(("a", "apple", 5L), ("b", "banana", 7L)), top.toString)
    } finally q.stop()
  }
}
