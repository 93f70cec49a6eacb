package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

import graft.text.DedupOps

/** Property tests for the 128-bit SimHash path on arbitrary corpora:
  *
  *  1. the native [[graft.functions.SimHash128]] pipeline equals an
  *     independent in-memory reimplementation of the ±counter
  *     algebra (same xxhash64 seeds — the hash function is the
  *     contract, the sign-vector logic is what's re-derived);
  *  2. banding completeness: EVERY pair within the pigeonhole budget
  *     (d128 < bands) is emitted by `simhashPairs128`, and
  *  3. gate soundness: no emitted pair exceeds maxDist, hamming
  *     values are exact, and doc1 < doc2.
  *
  * Small alphabets + mutated clones make near-pairs dense around the
  * band boundaries, where an off-by-one in the slicing (band width,
  * shift arithmetic, half selection) would surface. */
class Simhash128PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // base docs plus mutated clones: clones differ in one token, so
  // their fingerprints sit close — the band-boundary-dense region
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(3, 8)
    bases <- Gen.listOfN(nDocs,
      Gen.chooseNum(3, 20).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(0, 9).map(i => s"w$i"))))
    nClones <- Gen.chooseNum(1, 4)
    clones <- Gen.listOfN(nClones, for {
      src <- Gen.chooseNum(0, bases.size - 1)
      pos <- Gen.chooseNum(0, bases(src).size - 1)
      tok <- Gen.chooseNum(0, 9).map(i => s"w$i")
    } yield bases(src).updated(pos, tok))
  } yield (bases ++ clones).zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }

  private val Seed1 = 0x9E3779B97F4A7C15L

  private def xx(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  /** Independent reference: gram the doc, hash each gram with both
    * seeds, accumulate ±1 per bit, emit sign vectors. */
  private def refSimhash128(text: String): (Long, Long) = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = if (toks.size < 3) Seq.empty else toks.sliding(3).map(_.mkString(" ")).toSeq
    val counts = new Array[Int](128)
    grams.foreach { g =>
      val ha = xx(g, 42L)
      val hb = xx(g, Seed1)
      (0 until 64).foreach { j =>
        if (((ha >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        if (((hb >>> j) & 1L) == 1L) counts(64 + j) += 1 else counts(64 + j) -= 1
      }
    }
    var h0 = 0L; var h1 = 0L
    (0 until 64).foreach { j =>
      if (counts(j) > 0) h0 |= (1L << j)
      if (counts(64 + j) > 0) h1 |= (1L << j)
    }
    (h0, h1)
  }

  test("native simhash128 equals the in-memory reference on arbitrary corpora") {
    samples(corpusGen, 12, 4242L).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val got = DedupOps.simhashGrams128(df, "doc_id", $"text", 3)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      corpus.foreach { case (id, text) =>
        assert(got(id) == refSimhash128(text), s"doc $id: '$text'")
      }
    }
  }

  test("banding is complete within the pigeonhole budget and the gate is sound") {
    samples(corpusGen, 12, 777L).foreach { corpus =>
      val hashes = corpus.map { case (id, t) => (id, refSimhash128(t)) }
      def d128(a: (Long, Long), b: (Long, Long)): Int =
        java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      val expected = (for {
        Seq((i1, h1), (i2, h2)) <- hashes.combinations(2).map(_.sortBy(_._1)).toSeq
        d = d128(h1, h2)
        if d <= 15
      } yield (i1, i2, d)).toSet

      val df = corpus.toDF("doc_id", "text")
      val h = DedupOps.simhashGrams128(df, "doc_id", $"text", 3)
      val got15 = DedupOps.simhashPairs128(h, "doc_id", maxDist = 15)
        .as[(Long, Long, Int)].collect().toSet
      // completeness at the pigeonhole budget: d <= 15 < 16 bands
      // guarantees a band hit, so the pair set must be EXACTLY the
      // d<=15 pairs (soundness gives the other inclusion)
      assert(got15 == expected,
        s"missing=${(expected -- got15).take(3)} extra=${(got15 -- expected).take(3)}")

      // wider gate: all emitted pairs obey it, hamming exact, ordered
      val got31 = DedupOps.simhashPairs128(h, "doc_id", maxDist = 31)
        .as[(Long, Long, Int)].collect()
      val byId = hashes.toMap
      got31.foreach { case (a, b, ham) =>
        assert(a < b && ham <= 31 && ham == d128(byId(a), byId(b)))
      }
      assert(got31.length == got31.map(p => (p._1, p._2)).distinct.length, "no duplicate pair rows")
    }
  }
}
