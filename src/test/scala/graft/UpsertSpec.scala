package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge applies updates, inserts, and deletes in one pass") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B2", "U"),  // update
      (4L, "d", "U"),   // insert
      (3L, null, "D")   // delete
    ).toDF("k", "v", "__op")
    val out = Upsert(base, changes, Seq("k"), "__op")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "B2"), (4L, "d")))
  }

  test("merge is idempotent when re-applying the same change batch") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((2L, "B2", "U"), (1L, "x", "D")).toDF("k", "v", "__op")
    val once = Upsert(base, changes, Seq("k"), "__op")
    val twice = Upsert(once, changes, Seq("k"), "__op")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("verified query: upsert output contains the marker segment and new keys") {
    val out = QueriesScale.upsert(spark, sf).cache()
    assert(out.where($"c_mktsegment" === "UPSERTED").count() > 0)
    assert(out.where($"c_custkey" > 2000000L).count() > 0)
    // deleted keys are gone
    assert(out.where(pmod($"c_custkey", lit(13)) === 6 &&
      pmod($"c_custkey", lit(7)) =!= 0 && $"c_custkey" < 2000000L).count() == 0)
    out.unpersist()
  }
}
