package graft

/** Leave-one-out centroid outlier screen (#149) on hand vectors with
  * exactly computable cosines: the anti-aligned vector scores −1, the
  * aligned ones +1, and the self-term removal is what makes both
  * exact (with the vector left in, neither would be ±1). */
class EmbeddingOutlierSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = {
    val a = new Array[Float](8)
    xs.zipWithIndex.foreach { case (x, i) => a(i) = x.toFloat }
    a
  }

  // label 0: three aligned + one anti-aligned on e1 → S = (2e6, 0);
  // every leave-one-out residual stays on +e1, so cosines are ±1
  // label 1: singleton → zero residual, counted but unscored
  // label 2: a zero vector (unscored) + two aligned on e2
  private val emb = Seq(
    (1L, vec(1.0), 0), (2L, vec(1.0), 0), (3L, vec(1.0), 0), (4L, vec(-1.0), 0),
    (5L, vec(0.0, 1.0), 1),
    (6L, vec(), 2), (7L, vec(0.0, 2.0), 2), (8L, vec(0.0, 2.0), 2))

  private def run() =
    QueriesVector.embeddingOutliersOn(emb.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))))
      .toMap

  test("aligned vectors score +1e6, the anti-aligned one -1e6") {
    val out = run()
    assert(out(0) == ((4L, 4L, 1L, Some(-1000000L), Some(1000000L), Some(2000000L))))
  }

  test("singleton label: counted, zero residual never scored") {
    assert(run()(1) == ((1L, 0L, 0L, None, None, None)))
  }

  test("zero vectors are unscored; their label's real vectors still score") {
    // v7's residual is v8 (aligned) and vice versa → both +1e6
    assert(run()(2) == ((3L, 2L, 0L, Some(1000000L), Some(1000000L), Some(2000000L))))
  }
}
