package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bronze, Silver}

class MedallionSpec extends SparkSpec {
  import spark.implicits._

  test("bronze split partitions rows and names the first failing rule") {
    val df = Seq(
      (Some(1L), 5.0),   // valid
      (None, 5.0),       // fails rule 1
      (Some(2L), -1.0),  // fails rule 2
      (None, -1.0)       // fails both -> first-match reason
    ).toDF("k", "v")
    val rules = Seq(
      Bronze.Rule("NULL_K", col("k").isNotNull),
      Bronze.Rule("BAD_V", col("v") > 0)
    )
    val valid = Bronze.valid(df, rules).collect()
    val rejected = Bronze.rejected(df, rules)
      .select("k", "rejection_reason").as[(Option[Long], String)].collect().toSet
    assert(valid.length == 1 && valid.head.getLong(0) == 1L)
    assert(rejected == Set((None, "NULL_K"), (Some(2L), "BAD_V"), (None, "NULL_K")))
  }

  test("bronze valid + rejected partition the input exactly") {
    val li = Tables.lineitem(spark, sf)
    val v = QueriesEtl.bronzeValid(spark, sf).count()
    val r = QueriesEtl.bronzeRejected(spark, sf).count()
    assert(v + r == li.count())
  }

  test("digitsOnly keeps long digit runs, nulls short ones") {
    val df = Seq("a1b2c3d4e5", "x42y", "nope").toDF("s")
      .select(Silver.digitsOnly(col("s"), 3).as("d"))
    assert(df.as[Option[String]].collect().toSeq == Seq(Some("12345"), None, None))
  }

  test("dedupLatest keeps exactly the max-ordered row per key") {
    val df = Seq(
      (1L, 10L, "old"), (1L, 20L, "new"),
      (2L, 5L, "only")
    ).toDF("k", "ver", "tag")
    val out = Silver.dedupLatest(df, Seq("k"), Seq(col("ver")))
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 20L, "new"), (2L, 5L, "only")))
  }

  test("observed bronze metrics arrive as a side effect of one action") {
    val rules = Seq(
      Bronze.Rule("NULL_KEY", col("k").isNotNull),
      Bronze.Rule("NON_POSITIVE", col("v") > 0))
    val df = Seq((Some(1L), 5.0), (None, 1.0), (Some(2L), -1.0)).toDF("k", "v")
    val obs = org.apache.spark.sql.Observation("bronze")
    Bronze.observed(df, rules, obs).collect() // the only pass over the data
    val m = obs.get
    assert(m("rows_total") == 3L && m("rows_valid") == 1L)
    assert(m("violations_NULL_KEY") == 1L && m("violations_NON_POSITIVE") == 1L)
  }

  test("dedupLatest plan uses aggregation, not a window") {
    val plan = Silver
      .dedupLatest(Tables.events(spark, sf), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }
}
