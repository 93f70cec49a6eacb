package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.vector.VectorOps

/** The embedding-QA gate (#86) on a corpus with INJECTED anomalies —
  * the testdata corpus is clean (every counter verifies as zero
  * against the oracle), so the counters' firing behavior is proven
  * here on hand-built rows where every anomaly class appears. */
class EmbeddingQaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def corpus = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, Seq(3.0f, 4.0f), 0),                 // norm 5
      Row(2L, Seq(0.0f, 0.0f), 0),                 // zero norm
      Row(3L, null, 0),                            // null vector
      Row(4L, Seq(1.0f, 2.0f, 2.0f), 0),           // wrong dim (3 != 2)
      Row(5L, Seq(1.0f, null), 0),                 // null element
      Row(6L, Seq(0.0f, 1.0f), 1)                  // clean second label
    ).map(r => Row(r.get(0), Option(r.get(1)).map(_.asInstanceOf[Seq[Any]]).orNull, r.get(2)))),
    schema)

  test("anomaly counters fire per class and norms cover only valid rows") {
    val out = VectorOps.embeddingQa(corpus, "embedding", "label", dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap

    val l0 = out(0)
    assert(l0.getLong(1) == 5L, "n_vecs")
    assert(l0.getLong(2) == 1L, "n_null_vec")
    assert(l0.getLong(3) == 1L, "n_bad_dim")
    assert(l0.getLong(4) == 1L, "n_null_elem")
    assert(l0.getLong(5) == 1L, "n_zero_norm")
    // valid rows for label 0: norms {5.0, 0.0} — wrong-dim/null rows excluded
    assert(l0.getDouble(6) == 0.0, "min_norm")
    assert(l0.getDouble(7) == 5.0, "max_norm")
    assert(l0.getDouble(8) == 5.0, "sum_norm")

    val l1 = out(1)
    assert(l1.getLong(1) == 1L && l1.getLong(2) == 0L && l1.getLong(5) == 0L)
    assert(l1.getDouble(6) == 1.0 && l1.getDouble(7) == 1.0 && l1.getDouble(8) == 1.0)
  }

  test("an all-anomalous label reports null norm stats, not a crash") {
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null, 7))), schema)
    val r = VectorOps.embeddingQa(bad, "embedding", "label", dim = 2).collect().head
    assert(r.getLong(2) == 1L)
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("the QA aggregate plans one scan with partial aggregation") {
    val p = VectorOps.embeddingQa(corpus, "embedding", "label", dim = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "single conditional-agg pass, no Expand")
  }
}
