package graft

import org.apache.spark.sql.functions._

/** Rows #105-#107: RFM segmentation, CDC snapshot diff, per-doc
  * lexical diversity. Oracle hashes verify values end-to-end; these
  * assert the invariants and branches the oracle can't reach (the
  * `delete` branch needs a shrinking snapshot, the diversity algebra
  * needs a handcrafted doc). */
class RfmDiffDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("rfm: scores are quartile-bounded, labels consistent, monetary exact") {
    val out = QueriesAnalytics.rfmSegments(spark, sf).cache()
    val n = out.count()
    assert(n == Tables.orders(spark, sf).select("o_custkey").distinct().count())
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(out.where(col(c) < 1 || col(c) > 4).isEmpty, s"$c outside 1..4")
    }
    // labels must match their defining rule
    assert(out.where($"segment" === "champion" && !($"r_score" >= 4 && $"f_score" >= 4)).isEmpty)
    assert(out.where($"segment" === "lost" && $"r_score" > 1).isEmpty)
    // every quartile of every dimension is inhabited (real breakpoints)
    assert(out.select("r_score").distinct().count() >= 3)
    assert(out.select("m_score").distinct().count() == 4)
    // monetary is the exact decimal customer sum
    val one = out.orderBy("custkey").limit(1).collect()(0)
    val expect = Tables.orders(spark, sf)
      .where($"o_custkey" === one.getAs[Long]("custkey"))
      .agg(graft.functions.Money.sumExact($"o_totalprice")).collect()(0).getDouble(0)
    assert(one.getAs[Double]("monetary") == expect)
    out.unpersist()
  }

  test("snapshot diff: branch partition, and delete fires on a shrinking snapshot") {
    val out = QueriesEtl.snapshotDiff(spark, sf).cache()
    assert(out.select("custkey").distinct().count() == out.count(), "one row per key")
    assert(out.where($"change_type" === "delete").isEmpty, "append-only fact can't delete")
    // unchanged rows carry equal values; updates differ; inserts have null old
    assert(out.where($"change_type" === "unchanged" &&
      ($"old_n_orders" =!= $"new_n_orders" || $"old_total" =!= $"new_total")).isEmpty)
    assert(out.where($"change_type" === "insert" && $"old_n_orders".isNotNull).isEmpty)
    assert(out.where($"change_type" === "update").count() > 0, "cutoff must split real data")
    out.unpersist()

    // the delete branch, via an explicitly shrinking current snapshot
    val o = Tables.orders(spark, sf)
    val gone = o.select($"o_custkey").distinct().orderBy("o_custkey").limit(1)
      .collect()(0).getLong(0)
    val diff = QueriesEtl.snapshotDiffOn(o, o.where($"o_custkey" =!= gone))
    val del = diff.where($"change_type" === "delete").collect()
    assert(del.length == 1 && del(0).getAs[Long]("custkey") == gone)
    assert(del(0).isNullAt(del(0).fieldIndex("new_n_orders")))
  }

  test("fk audit: clean testdata scores zero, planted orphans are counted") {
    val audit = QueriesEtl.fkOrphans(spark, sf).cache()
    assert(audit.count() == 8)
    assert(audit.where($"n_orphans" =!= 0L || $"n_null_fk" =!= 0L).isEmpty,
      "driver testdata is referentially consistent")
    audit.unpersist()

    // plant: two orphan children + one NULL FK
    val child = Seq(Some(1L), Some(1L), Some(99L), Some(98L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val row = QueriesEtl.edgeAudit(child, "fk", parent, "pk", "t.fk->p.pk").collect()(0)
    assert(row.getAs[Long]("n_child") == 5L)
    assert(row.getAs[Long]("n_null_fk") == 1L)
    assert(row.getAs[Long]("n_orphans") == 2L)
    assert(row.getAs[Long]("orphan_permille") == 400L)
  }

  test("lexical diversity: handcrafted algebra and corpus invariants") {
    val hand = Seq((1L, "a a b"), (2L, "x"), (3L, "t t t t")).toDF("doc_id", "text")
    val rows = QueriesText.lexicalDiversityOn(hand).orderBy("doc_id").collect()
    // "a a b": n=3 nd=2 ssq=5 → ttr=2/3, simpson=(5-3)/6, eff=9/5
    assert(rows(0).getAs[Long]("n_tokens") == 3L && rows(0).getAs[Long]("n_distinct") == 2L)
    assert(rows(0).getAs[Double]("ttr") == 2.0 / 3.0)
    assert(rows(0).getAs[Double]("simpson") == 2.0 / 6.0)
    assert(rows(0).getAs[Double]("eff_vocab") == 9.0 / 5.0)
    // single token: simpson pinned to 0, eff_vocab 1
    assert(rows(1).getAs[Double]("simpson") == 0.0 && rows(1).getAs[Double]("eff_vocab") == 1.0)
    // pure repetition: ttr→small, simpson = 1 exactly, eff_vocab = 1
    assert(rows(2).getAs[Double]("simpson") == 1.0 && rows(2).getAs[Double]("eff_vocab") == 1.0)

    // corpus-wide: Cauchy-Schwarz chain eff_vocab <= n_distinct <= n_tokens
    val corp = QueriesText.lexicalDiversity(spark, sf)
    assert(corp.where($"eff_vocab" > $"n_distinct".cast("double") + lit(1e-9)).isEmpty)
    assert(corp.where($"n_distinct" > $"n_tokens").isEmpty)
    assert(corp.where($"simpson" < 0.0 || $"simpson" > 1.0).isEmpty)
    assert(corp.count() == Tables.documents(spark, sf).count())
  }
}
