package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Money
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Property tests for the exact-money contract: the Spark formulas
  * must agree with BigDecimal reference arithmetic on arbitrary
  * 2-decimal inputs — this is what guarantees oracle hash-matches
  * beyond the two scale factors we test empirically. (Seeded
  * scalacheck generators, deterministic run.) */
class MoneyPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // cents in [0, 10^8) -> values up to a million units, 2 decimals
  private val groupGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000000L)).map(_.take(200))

  test("sumExact equals BigDecimal sum for arbitrary 2-decimal groups") {
    val groups = samples(groupGen, 40, 1L)
    val rows = groups.zipWithIndex.flatMap { case (g, i) => g.map(c => (i, c / 100.0)) }
    val got = rows.toDF("g", "v").groupBy("g").agg(Money.sumExact($"v").as("s"))
      .as[(Int, Double)].collect().toMap
    groups.zipWithIndex.foreach { case (g, i) =>
      val expected = new JBigDecimal(g.sum).movePointLeft(2).doubleValue()
      assert(got(i) == expected, s"group $i: ${got(i)} != $expected")
    }
  }

  test("avgFromScaled equals BigDecimal HALF_UP average at 2 and 4 digits") {
    val groups = samples(groupGen, 40, 2L)
    val rows = groups.zipWithIndex.flatMap { case (g, i) => g.map(c => (i, c / 100.0)) }
    val df = rows.toDF("g", "v")
    for (digits <- Seq(2, 4)) {
      val got = df.groupBy("g")
        .agg(Money.scaledSum($"v", digits).as("u"), count(lit(1)).as("n"))
        .withColumn("a", Money.avgFromScaled($"u", $"n", digits))
        .select("g", "a").as[(Int, Double)].collect().toMap
      groups.zipWithIndex.foreach { case (g, i) =>
        val expected = new JBigDecimal(g.sum).movePointLeft(2)
          .divide(new JBigDecimal(g.size), digits, RoundingMode.HALF_UP)
          .doubleValue()
        assert(got(i) == expected, s"digits=$digits group $i: ${got(i)} != $expected")
      }
    }
  }

  test("dedupLatest picks the same winner as a reference in-memory sort") {
    val rowGen = for {
      k <- Gen.chooseNum(0L, 20L)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v)
    val rows = samples(Gen.listOfN(300, rowGen), 1, 3L).head
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) } // unique tiebreaker
    val got = graft.operators.Silver
      .dedupLatest(rows.toDF("k", "v", "id"), Seq("k"), Seq(col("v"), col("id")))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.map(r => (r._2, r._3)).max
    }
    assert(got == expected)
  }
}
