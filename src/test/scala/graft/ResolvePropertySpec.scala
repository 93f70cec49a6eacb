package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: iterative min-label propagation
  * ([[graft.text.DedupOps.resolveGroups]]) equals an in-memory
  * union-find on arbitrary pair graphs — every doc appearing in a
  * pair labeled with its component's minimum id. Long chains need
  * several propagation rounds, so path-shaped generators exercise
  * the convergence loop, not just the first round. */
class ResolvePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  // mix of random edges (dense components) and chain edges (deep
  // propagation): ids up to 30, a path i→i+1 over a random interval
  private val graphGen: Gen[List[(Long, Long)]] = for {
    nRandom <- Gen.chooseNum(0, 12)
    rand <- Gen.listOfN(nRandom, for {
      a <- Gen.chooseNum(0L, 29L); b <- Gen.chooseNum(0L, 29L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    chainStart <- Gen.chooseNum(0L, 20L)
    chainLen <- Gen.chooseNum(0, 9)
  } yield (rand ++ (0 until chainLen).map(i => (chainStart + i, chainStart + i + 1))).distinct

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("resolveGroups (single-task union-find path) equals union-find") {
    for ((edges, i) <- samples(graphGen, 12, 0x600D).zipWithIndex) {
      if (edges.nonEmpty) {
        val pairs = edges.toDF("doc1", "doc2").repartition(1 + i % 3)
        val got = graft.text.DedupOps.resolveGroups(pairs, maxIter = 30)
          .select($"doc_id", $"group_id").as[(Long, Long)].collect().toMap
        val want = unionFind(edges)
        assert(got == want, s"graph $i (${edges.size} edges): got $got, want $want")
      }
    }
  }

  test("a capped non-converged resolve fails loudly instead of emitting wrong groups") {
    // a 12-node chain cannot converge in 1 round; the old behavior
    // silently returned almost-resolved labels (caught by the
    // q_semantic_resolve oracle at sf0.1) — now it must throw
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val e = intercept[IllegalArgumentException] {
      graft.text.DedupOps.resolveGroups(chain, maxIter = 1, localEdgeBudget = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("resolveGroups (distributed iterative path) equals union-find") {
    // localEdgeBudget = 0 forces the label-propagation + pointer-jump
    // path every small graph would otherwise bypass
    for ((edges, i) <- samples(graphGen, 12, 0xD157).zipWithIndex) {
      if (edges.nonEmpty) {
        val pairs = edges.toDF("doc1", "doc2").repartition(1 + i % 3)
        val got = graft.text.DedupOps
          .resolveGroups(pairs, maxIter = 30, localEdgeBudget = 0L)
          .select($"doc_id", $"group_id").as[(Long, Long)].collect().toMap
        val want = unionFind(edges)
        assert(got == want, s"graph $i (${edges.size} edges): got $got, want $want")
      }
    }
  }
}
