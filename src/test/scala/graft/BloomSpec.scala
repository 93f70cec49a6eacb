package graft

import org.apache.spark.sql.functions._
import graft.text.BloomDedup

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, from: Long = 0L) =
    spark.range(from, from + n).select(xxhash64($"id").as("k"))

  test("no false negatives: every inserted key probes true") {
    val bits = BloomDedup.buildFilter(keys(5000), $"k", 10000L, 0.01)
    val misses = BloomDedup.flag(keys(5000), $"k", bits, "hit")
      .where(!$"hit").count()
    assert(misses == 0, "a Bloom filter must never miss an inserted key")
  }

  test("false-positive rate stays near the configured fpp") {
    val bits = BloomDedup.buildFilter(keys(5000), $"k", 10000L, 0.01)
    // 20k keys guaranteed disjoint from the inserted range
    val fps = BloomDedup.flag(keys(20000, from = 1000000L), $"k", bits, "hit")
      .where($"hit").count()
    assert(fps <= 20000 * 0.03, s"fp rate ${fps / 20000.0} way above configured 0.01")
  }

  test("built bits are parallelism-invariant (OR-merge is order-free)") {
    val one = BloomDedup.buildFilter(keys(3000).repartition(1), $"k", 10000L, 0.01)
    val many = BloomDedup.buildFilter(keys(3000).repartition(7), $"k", 10000L, 0.01)
    assert(java.util.Arrays.equals(one, many),
      "same key set must yield bit-identical filters at any partitioning")
  }

  test("null keys are skipped, not inserted") {
    val withNulls = spark.range(100)
      .select(when($"id" % 2 === 0, xxhash64($"id")).as("k"))
    val bits = BloomDedup.buildFilter(withNulls, $"k", 1000L, 0.01)
    val even = BloomDedup.flag(
      spark.range(100).where($"id" % 2 === 0).select(xxhash64($"id").as("k")),
      $"k", bits, "hit")
    assert(even.where(!$"hit").isEmpty)
  }

  test("q_bloom_dedup: contract holds and the exact twin finds real sharing") {
    val out = Queries.all("q_bloom_dedup")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(!$"bloom_ok").isEmpty, "no-false-negative contract violated")
    assert(out.where($"n_shared" > 0).count() > 0,
      "testdata has planted near-dups — the batch must share grams with the corpus")
    assert(out.where($"n_shared" > $"n_grams").isEmpty)
    out.unpersist()
  }

  test("q_approx_quantiles: envelope holds and median matches the window formulation") {
    val out = Queries.all("q_approx_quantiles")(spark, sf)
    val rows = out.collect()
    assert(rows.length == 5) // five market segments
    assert(rows.forall(_.getAs[Boolean]("sketch_ok")), "GK rank envelope violated")
    // exact median equals the one-pass window formulation
    val o = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    val ref = o
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_mktsegment")))
      .where($"rn" === call_function("div", $"n" + 1L, lit(2L)))
      .select($"c_mktsegment", $"o_totalprice".as("median_ref"))
    val joined = out.join(ref, "c_mktsegment")
      .where($"median_order_value" =!= $"median_ref")
    assert(joined.isEmpty)
  }
}
