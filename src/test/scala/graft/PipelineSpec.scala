package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the public operator API:
  * corpus → exact dedup → near-dup keeper drop → quality gate →
  * train/val/test split → sequence packing. Asserts the conservation
  * invariants a pipeline owner audits: nothing duplicated, nothing
  * invented, splits disjoint, every surviving token packed exactly
  * once. This is the composition proof — each stage is verified
  * individually by its oracle; here they run CHAINED. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dedup → keeper → quality gate → split → pack conserves documents and tokens") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. exact dedup: keep one doc per normalized text
    val exactKeep = text.DedupOps
      .exactGroups(docs, "doc_id", lower(trim($"text")))
      .select($"keeper_doc_id".as("doc_id"))
    val afterExact = docs.join(exactKeep, "doc_id")
    val nExact = afterExact.count()
    assert(nExact <= total && nExact > 0)

    // 2. near-dup groups → keep the best-quality doc per group
    val groups = QueriesText.dedupResolve(spark, sf)
    val keepers = QueriesText.dedupKeeper(spark, sf).select($"keeper_doc_id")
    val dropped = groups.select($"doc_id")
      .except(keepers.select($"keeper_doc_id".as("doc_id")))
    val afterNear = afterExact.join(dropped, Seq("doc_id"), "left_anti")
    val nNear = afterNear.count()
    // every resolved group keeps >= 1 member, so the drop count is
    // bounded by (group members - group count)
    val nGroups = keepers.count()
    val nMembers = groups.count()
    assert(nMembers > nGroups, "test data must contain real near-dup groups")
    assert(nNear >= nExact - (nMembers - nGroups))

    // 3. quality gate (same integer score the verified query uses)
    val quality = QueriesText.textQuality(spark, sf)
      .select($"doc_id", $"quality_score")
    val gated = afterNear.join(quality, "doc_id").where($"quality_score" >= 40)
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= nNear)

    // 4. deterministic split: buckets are disjoint and exhaustive
    val nibble = substring(md5($"doc_id".cast("string")), 1, 1)
    val split = gated.withColumn("split",
      when(nibble < "d", "train").when(nibble < "f", "val").otherwise("test"))
    assert(split.groupBy("split").count().as[(String, Long)].collect().map(_._2).sum == nGated)

    // 5. pack the train split into 2048-token sequences
    val budget = 2048L
    val train = split.where($"split" === "train")
      .select($"doc_id", $"source", text.TextOps.wordCount($"text").cast("long").as("n_tokens"))
    val packed = operators.ScanOps.exclusivePrefixSum(
        train, Seq("source"), Seq("doc_id"), $"n_tokens", "tok_before")
      .withColumn("pack_id", call_function("div", $"tok_before", lit(budget)))
    // every train doc packed exactly once...
    assert(packed.count() == train.count())
    assert(packed.select("doc_id").distinct().count() == train.count())
    // ...and pack offsets tile the token stream: per source, the
    // total packed tokens equal the source's token sum
    val byOffsets = packed.groupBy("source")
      .agg((max($"tok_before" + $"n_tokens")).as("end"))
    val bySum = train.groupBy("source").agg(sum($"n_tokens").as("tot"))
    val mismatch = byOffsets.join(bySum, "source").where($"end" =!= $"tot").count()
    assert(mismatch == 0, "prefix-sum packing must conserve every token")
  }
}
