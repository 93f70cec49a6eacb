package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JobGraph
import graft.operators.JobGraph.{Failed, Skipped, Succeeded}

/** Property harness for the DAG runner: random DAGs (edges only to
  * earlier jobs, so always acyclic), random failing subsets, random
  * concurrency — the scheduler invariants must hold on every draw:
  * exactly one report per job in declaration order, failures confined
  * to their transitive descendants, success everywhere else, skipped
  * bodies never executed, dependency order respected, and the
  * concurrent schedule equal to the sequential one. No Spark: jobs
  * are pure counters, so hundreds of graphs run in milliseconds. */
class JobGraphPropertySpec extends AnyFunSuite {

  private case class Shape(n: Int, deps: Vector[Seq[Int]], failing: Set[Int], par: Int)

  private def shape(seed: Long): Shape = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(18)
    val deps = Vector.tabulate(n)(i => (0 until i).filter(_ => rnd.nextInt(100) < 30))
    val failing = (0 until n).filter(_ => rnd.nextInt(100) < 20).toSet
    Shape(n, deps, failing, 1 + rnd.nextInt(4))
  }

  private def run(sh: Shape, maxParallel: Int): (Seq[JobGraph.JobReport], Seq[Int]) = {
    val ran = java.util.Collections.synchronizedList(new java.util.ArrayList[Int]())
    val g = new JobGraph()
    (0 until sh.n).foreach { i =>
      g.add(s"j$i", deps = sh.deps(i).map(d => s"j$d")) {
        ran.add(i)
        if (sh.failing(i)) throw new RuntimeException(s"fail j$i") else i.toLong
      }
    }
    (g.runConcurrent(maxParallel),
      scala.jdk.CollectionConverters.ListHasAsScala(ran).asScala.toSeq)
  }

  /** Jobs with a failed (or transitively doomed) ancestor. */
  private def doomed(sh: Shape): Set[Int] = {
    val bad = collection.mutable.Set.empty[Int]
    (0 until sh.n).foreach { i => // deps have smaller index: one pass suffices
      if (sh.deps(i).exists(d => sh.failing(d) || bad(d))) bad += i
    }
    bad.toSet
  }

  test("200 random DAGs: reports complete, ordered, failure-confined; concurrency invisible") {
    for (seed <- 1L to 200L) {
      val sh = shape(seed * 0x9E3779B97F4A7C15L)
      val (seqR, seqRan) = run(sh, 1)
      assert(seqR.map(_.id) == (0 until sh.n).map(i => s"j$i"), s"seed $seed: report order")
      val byId = seqR.map(r => r.id -> r).toMap
      val dead = doomed(sh)
      (0 until sh.n).foreach { i =>
        val st = byId(s"j$i").status
        if (dead(i)) assert(st.isInstanceOf[Skipped], s"seed $seed: j$i should be skipped: $st")
        else if (sh.failing(i)) assert(st.isInstanceOf[Failed], s"seed $seed: j$i should fail: $st")
        else assert(st == Succeeded, s"seed $seed: j$i should succeed: $st")
      }
      // skipped bodies never executed; every other body exactly once
      assert(seqRan.sorted == (0 until sh.n).filterNot(dead).sorted, s"seed $seed: bodies run")
      // dependency order respected among executed jobs
      val pos = seqRan.zipWithIndex.toMap
      seqRan.foreach { i =>
        sh.deps(i).filter(pos.contains).foreach(d =>
          assert(pos(d) < pos(i), s"seed $seed: j$d ran after dependent j$i"))
      }
      // the concurrent schedule is observationally identical
      val (parR, parRan) = run(sh, sh.par)
      assert(parR.map(r => (r.id, r.status.ok, r.metric)) ==
        seqR.map(r => (r.id, r.status.ok, r.metric)), s"seed $seed: par != seq")
      assert(parRan.sorted == seqRan.sorted, s"seed $seed: par bodies")
    }
  }
}
