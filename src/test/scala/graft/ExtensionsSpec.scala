package graft

import org.apache.spark.sql.SparkSession

/** The extension-installed SQL surface: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` can use every graft
  * function from pure SQL — no Scala-side register calls. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  // the shared session is built `withExtensions(new GraftExtensions)`
  // (GraftSession.local), so every injected function already resolves;
  // install() exercises the SAME table's live-session registration
  // route on top (idempotent by construction).
  private lazy val spark: SparkSession = {
    val s = SparkSpec.session
    GraftFunctions.install(s)
    s
  }

  test("the extension wraps the full function table") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; table is shared
    assert(GraftFunctions.all.map(_._1).toSet == Set(
      "cosine_sim", "cosine_sim_i8", "simhash64", "minhash_sig", "winnow_fps",
      "nfc_norm", "strip_accents", "vec_sum", "vec_min", "vec_sum_d", "topk_sketch"))
  }

  test("SQL-only session resolves every injected function") {
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |  simhash64(array('a', 'b', 'a')) AS sh,
        |  minhash_sig(array('a', 'b', 'c', 'd'), 3, 4) AS mh,
        |  nfc_norm('é') AS nfc,
        |  strip_accents('café') AS flat
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getAs[collection.Seq[Long]]("mh").length == 4)
    assert(row.getString(3) == "é")
    assert(row.getString(4) == "cafe")
  }

  test("injected aggregates work from SQL") {
    val out = spark.sql(
      """SELECT vec_sum(v) AS s, vec_min(v) AS m,
        |       topk_sketch(w, 8) AS top
        |FROM VALUES (array(1L, 10L), 'x'), (array(2L, 20L), 'x'), (array(3L, 30L), 'y') t(v, w)
        |""".stripMargin).collect().head
    assert(out.getAs[collection.Seq[Long]]("s") == collection.Seq(6L, 60L))
    assert(out.getAs[collection.Seq[Long]]("m") == collection.Seq(1L, 10L))
    val top = out.getSeq[org.apache.spark.sql.Row](2)
    assert(top.head.getString(0) == "x" && top.head.getLong(1) == 2L)
  }
}
