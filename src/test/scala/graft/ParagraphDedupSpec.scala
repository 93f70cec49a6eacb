package graft

import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._
import graft.text.DedupOps

/** Paragraph-grain dedup profile (#141) on hand-built corpora — the
  * testdata corpus has few short docs, so block-grain edge cases
  * (empty text, all-duplicate docs, cross-doc first-occurrence ties,
  * viral corpus-wide blocks) are proven here, plus the scale contract:
  * the plan must contain NO Window node (first-occurrence is a
  * map-side-combinable min aggregate — a window over the block hash
  * would sort a viral block's whole occurrence set in one task). */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], paraTokens: Int = 2) =
    DedupOps.paragraphDedup(
      rows.toDF("doc_id", "text"), "doc_id", col("text"), paraTokens)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("first occurrence is kept, later docs' copies are dups") {
    val out = run(Seq(
      (1L, "a b c d"),   // blocks [a b][c d] — both firsts
      (2L, "a b x"),     // [a b] dup of doc 1, [x] first
      (3L, "a b a b")))  // both blocks dup of doc 1
    assert(out(1L) == ((2L, 0L, 0L)))
    assert(out(2L) == ((2L, 1L, 500L)))
    assert(out(3L) == ((2L, 2L, 1000L)), "all-duplicate doc → 1000 permille")
  }

  test("within-doc repeat keeps only the first occurrence") {
    val out = run(Seq((6L, "z z z z")))
    assert(out(6L) == ((2L, 1L, 500L)))
  }

  test("cross-doc tie at the same para_idx breaks by doc_id") {
    val out = run(Seq((9L, "p q"), (7L, "p q"), (8L, "p q")))
    assert(out(7L) == ((1L, 0L, 0L)), "smallest doc_id owns the block")
    assert(out(8L) == ((1L, 1L, 1000L)))
    assert(out(9L) == ((1L, 1L, 1000L)))
  }

  test("empty and whitespace-only text are one empty-string block") {
    // trim+split("", \s+) = [""] — both docs produce the SAME block,
    // so the second is a duplicate of the first (oracle-identical:
    // DuckDB's string_split_regex(trim(s)) has the same edge).
    val out = run(Seq((1L, ""), (2L, "   ")))
    assert(out(1L) == ((1L, 0L, 0L)))
    assert(out(2L) == ((1L, 1L, 1000L)))
  }

  test("null text docs are excluded, not zero rows") {
    val out = DedupOps.paragraphDedup(
      Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("doc_id", "text"),
      "doc_id", col("text"), paraTokens = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("viral corpus-wide block: every doc after the first counts it once") {
    val corpus = (1L to 40L).map(i => (i, "the same banner " + s"tail$i"))
    val out = run(corpus, paraTokens = 3)
    // blocks: [the same banner][tail_i] — banner first in doc 1 only
    assert(out(1L) == ((2L, 0L, 0L)))
    (2L to 40L).foreach(i => assert(out(i) == ((2L, 1L, 500L))))
  }

  test("plan contains no Window node (viral-block skew contract)") {
    val df = DedupOps.paragraphDedup(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", col("text"), 2)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.isEmpty, "first-occurrence must be a combinable aggregate, not a window")
  }

  // ---- paragraphStrip (#142): the emit the profile describes ----

  private def strip(rows: Seq[(Long, String)], paraTokens: Int = 2) =
    DedupOps.paragraphStrip(
      rows.toDF("doc_id", "text"), "doc_id", col("text"), paraTokens)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("strip keeps exactly the first-occurrence blocks, in para order") {
    val out = strip(Seq(
      (1L, "a b c d"),
      (2L, "a b x"),     // loses [a b], keeps [x]
      (3L, "a b a b")))  // loses both
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "x")))
    assert(out(3L) == ((2L, 0L, "")), "fully-stripped doc stays present with empty text")
  }

  test("within-doc repeat keeps only the first copy in the rebuilt text") {
    val out = strip(Seq((6L, "z w z w")))
    assert(out(6L) == ((2L, 1L, "z w")))
  }

  test("rebuilt text is the whitespace-normalized token rejoin") {
    val out = strip(Seq((1L, "  a   b\tc ")))
    assert(out(1L) == ((2L, 2L, "a b c")))
  }

  test("strip and profile agree: n_paras - n_kept == n_dup_paras on every doc") {
    val corpus = Seq(
      (1L, "a b c d"), (2L, "a b x"), (3L, "a b a b"),
      (4L, ""), (5L, "   "), (6L, "z w z w"), (7L, "p q r s t"))
    val prof = run(corpus)
    val st = strip(corpus)
    assert(prof.keySet == st.keySet)
    prof.foreach { case (d, (nParas, nDup, _)) =>
      val (sParas, nKept, _) = st(d)
      assert(sParas == nParas, s"doc $d block totals agree")
      assert(nParas - nKept == nDup, s"doc $d kept+dup partitions the blocks")
    }
  }

  test("strip plan contains no Window node either") {
    val df = DedupOps.paragraphStrip(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", col("text"), 2)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.isEmpty)
  }
}
