package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** Property test: the union+window as-of join equals an in-memory
  * reference on arbitrary inputs — backward and forward, inner and
  * left, tie timestamps matching, unmatched rows dropped or
  * null-padded. Rights are unique per (key, time) per the operator's
  * contract (callers dedup-latest first). */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // tiny key/time domains → dense ties and unmatched edges
  private val caseGen: Gen[(List[(Long, Long, String)], List[(Long, Long, Long)])] = for {
    nl <- Gen.chooseNum(0, 20)
    nr <- Gen.chooseNum(0, 15)
    lefts <- Gen.listOfN(nl, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 12L)
    } yield (k, t, s"L$k-$t"))
    rights <- Gen.listOfN(nr, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 12L); v <- Gen.chooseNum(0L, 99L)
    } yield (k, t, v))
  } yield (lefts, rights.groupBy(r => (r._1, r._2)).values.map(_.head).toList)

  private def reference(
      lefts: Seq[(Long, Long, String)], rights: Seq[(Long, Long, Long)],
      direction: String, inner: Boolean
  ): Set[(Long, Long, String, Option[Long], Option[Long])] =
    lefts.map { case (k, t, tag) =>
      val cands =
        if (direction == "backward") rights.filter(r => r._1 == k && r._2 <= t)
        else rights.filter(r => r._1 == k && r._2 >= t)
      val pick =
        if (cands.isEmpty) None
        else if (direction == "backward") Some(cands.maxBy(_._2))
        else Some(cands.minBy(_._2))
      (k, t, tag, pick.map(_._2), pick.map(_._3))
    }.filter(r => !inner || r._4.nonEmpty).toSet

  test("as-of join equals the in-memory reference in all four modes") {
    for (((lefts, rights), i) <- samples(caseGen, 12, 0xA50F).zipWithIndex) {
      val l = lefts.toDF("lk", "lt", "tag").repartition(1 + i % 3)
      val r = rights.toDF("rk", "rt", "rv")
      for {
        direction <- Seq("backward", "forward")
        joinType <- Seq("inner", "left")
      } {
        val got = AsOfJoin(l, r, "lk", "rk", "lt", "rt", Seq("rt", "rv"), joinType, direction)
          .select($"lk", $"lt", $"tag", $"rt", $"rv")
          .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
        val want = reference(lefts, rights, direction, joinType == "inner")
        assert(got == want,
          s"case $i $direction/$joinType: got ${got.toSeq.sorted}, want ${want.toSeq.sorted}")
      }
    }
  }
}
