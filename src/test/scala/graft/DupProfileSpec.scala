package graft

import org.apache.spark.sql.functions._
import graft.text.DedupOps

/** The per-source duplication profile (#87) on a hand-built corpus —
  * the testdata corpus has no exact duplicates (that counter verifies
  * as ZERO against the oracle), so the exact-dup accounting is proven
  * here where duplicates exist, including the cross-source case. */
class DupProfileSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // "same" appears 3× — twice in a, once in b: ALL THREE are
    // exact-dup members (multiplicity is corpus-wide, not per-source)
    (1L, "same text here", "a"),
    (2L, "same text here", "a"),
    (3L, "same text here", "b"),
    (4L, "unique one", "a"),
    (5L, "unique two", "b"),
    (6L, "  Same Text HERE ", "c") // normalization: trim+lower joins the group
  ).toDF("doc_id", "text", "source")

  private def profile(near: Seq[Long]) = DedupOps.dupProfile(
    corpus, "doc_id", lower(trim(col("text"))), col("source"),
    near.toDF("doc_id"))
    .collect().map(r => r.getString(0) -> r).toMap

  test("exact-dup membership is corpus-wide and normalization-aware") {
    val out = profile(near = Seq(4L, 5L))
    val a = out("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L, "a: 3 docs, 2 exact-dup members")
    assert(a.getLong(3) == 1L, "a: doc 4 in a near group")
    assert(a.getLong(4) == 666L && a.getLong(5) == 333L, "integer permille")
    val b = out("b")
    assert(b.getLong(2) == 1L, "b: doc 3 duplicates across sources")
    val c = out("c")
    assert(c.getLong(2) == 1L, "c: trim+lower folds doc 6 into the group")
  }

  test("a source with no near-dup members reports zero, not a dropped row") {
    val out = profile(near = Seq.empty[Long])
    assert(out.keySet == Set("a", "b", "c"))
    assert(out.values.forall(r => r.getLong(3) == 0L && r.getLong(5) == 0L))
  }

  test("near membership frames with duplicate ids count each doc once") {
    val out = profile(near = Seq(4L, 4L, 4L))
    assert(out("a").getLong(3) == 1L)
  }

  test("null text is absent content: counted in n_docs, never an exact dup") {
    // two null-text docs in one source share a NULL hash — without the
    // null gate the corpus-wide multiplicity window would read them as
    // a duplicate group (and the oracle's USING(h) join would instead
    // DROP them, a silent engine/oracle divergence)
    val withNulls = Seq(
      (1L, Option("real text"), "a"),
      (2L, None, "a"),
      (3L, None, "a")
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.dupProfile(
      withNulls, "doc_id", lower(trim(col("text"))), col("source"),
      Seq.empty[Long].toDF("doc_id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3L, "n_docs counts null-text docs")
    assert(out("a").getLong(2) == 0L, "null text never exact-dups")
  }
}
