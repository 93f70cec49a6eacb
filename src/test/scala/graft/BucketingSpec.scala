package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing: pre-shuffling fact tables on their join key at write
  * time so repeated joins/aggregations skip the exchange entirely —
  * the co-location strategy for 100 TB fact⋈fact joins (SURVEY §4).
  * Plain `spark.read.parquet` has no bucket metadata, so this goes
  * through the session catalog (`bucketBy` + `saveAsTable`).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // external tables via option("path") — warehouse dir is a static
    // conf and can't change at runtime
    val wh = Files.createTempDirectory("graft_buckets").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")

    // force the sort-merge path (at real scale neither side
    // broadcasts; at sf0.001 AQE would happily broadcast orders)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("li_b")
          .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        j.collect()
        (j, j.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)

    // co-located buckets: sort-merge join with ZERO exchanges
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("Exchange"), "bucketed join must not shuffle")

    // and the result matches the shuffled join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }
}
