package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property equivalence of the distributed two-level/two-pass
  * operators against their naive single-window formulations, over
  * randomized group layouts (skewed group sizes, duplicate values,
  * negative and zero measures — shapes the fixed testdata may miss).
  * Seeded generators, deterministic run (same pattern as
  * SketchPropertySpec). */
class ScanQuantilePropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed0: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed0)).get

  private val layout: Gen[Seq[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 120)
    groups <- Gen.choose(1, 4)
    data <- Gen.listOfN(n, for {
      g <- Gen.choose(0, groups - 1)
      v <- Gen.choose(-50L, 50L)
    } yield (g.toString, v))
  } yield data.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }

  test("exclusivePrefixSum equals the window formulation on random layouts") {
    for (seed <- 1L to 8L) {
      val df = sample(layout, seed).toDF("id", "grp", "v").repartition(5)
      val got = graft.operators.ScanOps
        .exclusivePrefixSum(df, Seq("grp"), Seq("id"), $"v", "pfx")
      val w = Window.partitionBy("grp").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val exp = df.withColumn("pfx", coalesce(sum($"v").over(w), lit(0L)))
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty, s"seed $seed")
    }
  }

  test("exclusivePrefixSum keeps NULL leading keys, ordered first like the window") {
    val df = Seq(
      (Option(10L), 1L, "a", 3L), (Option.empty[Long], 2L, "a", 5L),
      (Option(20L), 3L, "a", 7L), (Option.empty[Long], 4L, "a", 11L),
      (Option(10L), 5L, "b", 13L)
    ).toDF("k", "tie", "grp", "v")
    val got = graft.operators.ScanOps
      .exclusivePrefixSum(df, Seq("grp"), Seq("k", "tie"), $"v", "pfx")
    val w = Window.partitionBy("grp").orderBy("k", "tie")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = df.withColumn("pfx", coalesce(sum($"v").over(w), lit(0L)))
    assert(got.count() == 5, "no row may vanish on a NULL key")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("exclusivePrefixSum survives a full-Long key span (no ANSI overflow)") {
    val df = Seq(
      (Long.MinValue, "a", 1L), (-7L, "a", 2L), (0L, "a", 3L),
      (42L, "a", 4L), (Long.MaxValue, "a", 5L)
    ).toDF("k", "grp", "v")
    val got = graft.operators.ScanOps
      .exclusivePrefixSum(df, Seq("grp"), Seq("k"), $"v", "pfx")
    val w = Window.partitionBy("grp").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = df.withColumn("pfx", coalesce(sum($"v").over(w), lit(0L)))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("exclusivePrefixSum rejects fractional leading keys loudly") {
    val df = Seq((0.5, "a", 1L)).toDF("score", "grp", "v")
    assertThrows[IllegalArgumentException] {
      graft.operators.ScanOps.exclusivePrefixSum(df, Seq("grp"), Seq("score"), $"v", "pfx")
    }
  }

  test("selectAtRanks serves ranks that land among NULL values (NULLS FIRST)") {
    // 4 of 5 values NULL: p25 and p50 fall inside the null run
    val df = Seq(
      (1L, "a", Option.empty[Long]), (2L, "a", Option.empty[Long]),
      (3L, "a", Option.empty[Long]), (4L, "a", Option.empty[Long]),
      (5L, "a", Option(42L))
    ).toDF("id", "grp", "v")
    val got = graft.operators.Quantiles.selectAtRanks(
      df, "grp", $"v", $"id", floor($"v" / 7.0).cast("long"), Seq(25L, 50L, 100L), "value")
      .orderBy("pctl")
      .select($"pctl", $"value").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((25L, None), (50L, None), (100L, Some(42L))), got.toString)
  }

  test("selectAtRanks equals the window rank selection on random layouts") {
    for (seed <- 11L to 18L) {
      val df = sample(layout, seed).toDF("id", "grp", "v").repartition(3)
      val pctls = Seq(25L, 50L, 75L, 90L)
      val got = graft.operators.Quantiles.selectAtRanks(
        df, "grp", $"v", $"id", floor($"v" / 7.0).cast("long"), pctls, "value")
      val w = Window.partitionBy("grp").orderBy($"v", $"id")
      val exp = df
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
        .withColumn("pctl", explode(array(pctls.map(lit): _*)))
        .where($"rn" === call_function("div", $"pctl" * $"n" + 99L, lit(100L)))
        .select($"grp", $"pctl", $"v".as("value"))
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty, s"seed $seed")
    }
  }
}
