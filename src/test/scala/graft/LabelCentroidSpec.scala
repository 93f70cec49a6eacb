package graft

/** Label-centroid confusion (#148) on hand vectors whose centroid
  * cosines are exactly computable: the spec replays the quantized
  * integer dots in Scala and demands bit-equal doubles — the same
  * determinism the oracle's hash comparison relies on. */
class LabelCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = {
    val a = new Array[Float](8)
    xs.zipWithIndex.foreach { case (x, i) => a(i) = x.toFloat }
    a
  }

  // label 0: two copies of e1 → centroid e1
  // label 1: e2 → orthogonal to label 0
  // label 2: (0.5, 0.5, 0, …) → cos to label 0 = 1/√2
  private val emb = Seq(
    (1L, vec(1.0), 0), (2L, vec(1.0), 0),
    (3L, vec(0.0, 1.0), 1),
    (4L, vec(0.5, 0.5), 2),
    (5L, null.asInstanceOf[Array[Float]], 2))

  private def run() =
    QueriesVector.labelCentroidsOn(emb.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("pairwise centroid cosines replay the integer-dot formula bit-for-bit") {
    val out = run()
    // integer sums per label (round(x*1e6)): S0=(2e6,0), S1=(0,1e6), S2=(5e5,5e5)
    def cos(sa: Array[Long], sb: Array[Long]): Double = {
      def dot(u: Array[Long], v: Array[Long]) =
        u.zip(v).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      dot(sa, sb).toDouble / (math.sqrt(dot(sa, sa).toDouble) * math.sqrt(dot(sb, sb).toDouble))
    }
    val s0 = Array(2000000L, 0L); val s1 = Array(0L, 1000000L); val s2 = Array(500000L, 500000L)
    assert(out((0, 1)) == ((2L, 1L, cos(s0, s1))))
    assert(out((0, 2)) == ((2L, 1L, cos(s0, s2))))
    assert(out((1, 2)) == ((1L, 1L, cos(s1, s2))))
    assert(out((0, 1))._3 == 0.0)
    // 1 ulp from 1/√2 is the dot/(√·√) evaluation order, not noise
    assert(math.abs(out((0, 2))._3 - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("null vectors are excluded: label 2's count sees only its real vector") {
    val out = run()
    assert(out((0, 2))._2 == 1L, "label 2 has one real vector + one null; n counts non-null")
  }

  test("the 1/n scaling cancels: duplicating every label-0 vector changes nothing") {
    val doubled = emb ++ Seq((6L, vec(1.0), 0), (7L, vec(1.0), 0))
    val out = QueriesVector.labelCentroidsOn(doubled.toDF("vec_id", "embedding", "label"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    val base = run().map { case (k, v) => k -> v._3 }
    assert(out == base)
  }
}
