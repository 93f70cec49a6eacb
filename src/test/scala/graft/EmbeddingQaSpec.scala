package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.vector.VectorOps

/** The embedding-QA gate (#86) on a corpus with INJECTED anomalies —
  * the testdata corpus is clean (every counter verifies as zero
  * against the oracle), so the counters' firing behavior is proven
  * here on hand-built rows where every anomaly class appears. The
  * gate must be TOTAL: dirty vectors are counted, never summed (a
  * NaN reaching the ANSI decimal cast would abort the whole report). */
class EmbeddingQaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def frame(rows: Row*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows), schema)

  private def qa(rows: Row*) =
    VectorOps.embeddingQa(frame(rows: _*), "embedding", "label", dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap

  private def corpus = Seq(
    Row(1L, Seq(3.0f, 4.0f), 0),                 // norm 5
    Row(2L, Seq(0.0f, 0.0f), 0),                 // zero norm
    Row(3L, null, 0),                            // null vector
    Row(4L, Seq(1.0f, 2.0f, 2.0f), 0),           // wrong dim (3 != 2)
    Row(5L, Seq(1.0f, null), 0),                 // null element
    Row(6L, Seq(0.0f, 1.0f), 1)                  // clean second label
  )

  test("anomaly counters fire per class and norms cover only valid rows") {
    val out = qa(corpus: _*)

    val l0 = out(0)
    assert(l0.getLong(1) == 5L, "n_vecs")
    assert(l0.getLong(2) == 1L, "n_null_vec")
    assert(l0.getLong(3) == 1L, "n_bad_dim")
    assert(l0.getLong(4) == 1L, "n_null_elem")
    assert(l0.getLong(5) == 0L, "n_nonfinite")
    assert(l0.getLong(6) == 0L, "n_huge_norm")
    assert(l0.getLong(7) == 1L, "n_zero_norm")
    // valid rows for label 0: norms {5.0, 0.0} — anomalous rows excluded
    assert(l0.getDouble(8) == 0.0, "min_norm")
    assert(l0.getDouble(9) == 5.0, "max_norm")
    assert(l0.getDouble(10) == 5.0, "sum_norm")

    val l1 = out(1)
    assert(l1.getLong(1) == 1L && l1.getLong(2) == 0L && l1.getLong(7) == 0L)
    assert(l1.getDouble(8) == 1.0 && l1.getDouble(9) == 1.0 && l1.getDouble(10) == 1.0)
  }

  test("NaN, infinity, and absurd-norm vectors are counted, not summed") {
    val out = qa(
      Row(1L, Seq(Float.NaN, 1.0f), 0),               // NaN element
      Row(2L, Seq(Float.PositiveInfinity, 0.0f), 0),  // +Inf element
      Row(3L, Seq(Float.NegativeInfinity, 0.0f), 0),  // -Inf element
      Row(4L, Seq(3.0e37f, 0.0f), 0),                 // finite but absurd (3e37 >= 1e12)
      Row(5L, Seq(3.0f, 4.0f), 0))                    // the one sane vector
    val l0 = out(0)
    assert(l0.getLong(5) == 3L, "n_nonfinite: NaN, +Inf, -Inf")
    assert(l0.getLong(6) == 1L, "n_huge_norm")
    // the report completed (no ANSI abort) and stats cover row 5 only
    assert(l0.getDouble(8) == 5.0 && l0.getDouble(9) == 5.0 && l0.getDouble(10) == 5.0)
  }

  test("an all-anomalous label reports null norm stats, not a crash") {
    val r = qa(Row(1L, null, 7))(7)
    assert(r.getLong(2) == 1L)
    assert(r.isNullAt(8) && r.isNullAt(9) && r.isNullAt(10))
  }

  test("the QA aggregate plans one scan with partial aggregation") {
    val p = VectorOps.embeddingQa(frame(corpus: _*), "embedding", "label", dim = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "single conditional-agg pass, no Expand")
  }
}
