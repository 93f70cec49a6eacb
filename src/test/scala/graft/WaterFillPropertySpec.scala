package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the sorted-prefix closed-form water level behind
  * #147/#150 equals brute force (largest integer L with
  * sum(min(cap, L)) ≤ budget) on arbitrary cap multisets — heavy cap
  * ties, singleton cells, flat and skewed spreads, and both budget
  * regimes (B = total/2 raw caps for #147, B = 2·total via 4×-scaled
  * caps for #150) all funnel through the same three-branch anchor
  * (no feasible row / interior / all-feasible). Cell token caps are
  * realized as word counts so the whole pipeline (tokenize → cell
  * aggregate → level → ledger) is under test, not just the formula. */
class WaterFillPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // up to 9 cells; caps 1..40 words with a bias toward ties (small range)
  private val cellsGen: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 9)
    caps <- Gen.listOfN(n, Gen.chooseNum(1, 40).map(_.toLong))
  } yield caps

  private def docsFor(caps: Seq[Long]): Seq[(Long, String, String, String)] =
    caps.zipWithIndex.map { case (c, i) =>
      (i.toLong, s"l${i % 3}", s"s$i", (1L to c).map(k => s"w$k").mkString(" "))
    }

  private def bruteLevel(caps: Seq[Long], budget: Long): Long = {
    def used(l: Long) = caps.map(math.min(_, l)).sum
    (0L to caps.max).reverse.find(used(_) <= budget).get
  }

  test("mixAllocate level and ledger equal brute force on random cap multisets") {
    samples(cellsGen, 60, seed0 = 1201L).foreach { caps =>
      val out = QueriesText.mixAllocateOn(
        docsFor(caps).toDF("doc_id", "lang", "source", "text"))
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(5)))
      val b = caps.sum / 2
      val l = bruteLevel(caps, b)
      assert(out.map(_._3).toSet == Set(l), s"caps=$caps B=$b: level ${out.map(_._3).toSet} != $l")
      out.foreach { case (cap, alloc, _) =>
        assert(alloc == math.min(cap, l), s"caps=$caps B=$b cap=$cap")
      }
      // maximality: one more level unit would break the budget (or
      // everything is already fully allocated)
      val spent = out.map(_._2).sum
      val oneMore = caps.map(c => math.min(c, l + 1)).sum
      assert(spent <= b && (oneMore > b || spent == caps.sum),
        s"caps=$caps B=$b L=$l spent=$spent")
    }
  }

  test("mixEpochs equals brute force on 4x-scaled caps with the epoch ceiling") {
    samples(cellsGen, 40, seed0 = 1202L).foreach { caps =>
      val out = QueriesText.mixEpochsOn(
        docsFor(caps).toDF("doc_id", "lang", "source", "text"))
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      val scaled = caps.map(_ * 4L)
      val b = scaled.sum / 2
      val l = bruteLevel(scaled, b)
      assert(out.map(_._4).toSet == Set(l), s"caps=$caps: level ${out.map(_._4).toSet} != $l")
      out.foreach { case (cap, alloc, permille, _) =>
        assert(alloc == math.min(4 * cap, l), s"caps=$caps cap=$cap")
        assert(permille == alloc * 1000L / cap && permille <= 4000L)
      }
    }
  }
}
