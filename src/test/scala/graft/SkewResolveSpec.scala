package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.text.DedupOps

class SkewResolveSpec extends SparkSpec {
  import spark.implicits._

  test("resolveGroups finds connected components with min-id labels") {
    // components: {1,2,3,4} (chain), {10,11}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc1", "doc2")
    val groups = DedupOps.resolveGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("resolveGroups handles a long chain within maxIter") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val groups = DedupOps.resolveGroups(chain, maxIter = 50).as[(Long, Long)].collect().toMap
    assert(groups.values.toSet == Set(0L) && groups.size == 41)
  }

  test("salted join equals plain join, with the big side spread over salts") {
    val big = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_linenumber")
    val small = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val plain = big.join(small, "l_orderkey")
    val salted = Skew.saltedJoin(big, small, "l_orderkey", 8,
      bigEntropy = Seq(col("l_linenumber"), col("l_quantity")))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt actually spreads a hot key
    val spread = big.select(Skew.salt(8, col("l_linenumber"), col("l_quantity")).as("s"))
      .distinct().count()
    assert(spread == 8)
  }

  test("salted LEFT join keeps unmatched big rows exactly once") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "orphan")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, "k", 4,
      bigEntropy = Seq(col("v")), joinType = "left")
    val plain = big.join(small, Seq("k"), "left")
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
    assert(out.where(col("v") === "orphan").count() == 1)
  }

  test("salted join rejects join types where small-side replication duplicates output") {
    val big = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((2L, "unmatched")).toDF("k", "w")
    for (jt <- Seq("right", "full", "right_outer", "full_outer"))
      assertThrows[IllegalArgumentException] {
        Skew.saltedJoin(big, small, "k", 4, bigEntropy = Seq(col("v")), joinType = jt)
      }
  }
}
