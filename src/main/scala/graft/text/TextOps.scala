package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-training-data pipelines: token
  * counting, quality scoring, language identification.
  *
  * Everything is a codegen'd Catalyst expression over `functions._`
  * (split / higher-order array functions / regexp) — no UDFs, so the
  * whole family stays inside WholeStageCodegen and scales linearly
  * with a narrow, shuffle-free plan.
  *
  * Scores are computed with integer arithmetic only (counts, integer
  * div): exact, engine-independent, oracle-verifiable (SURVEY §3).
  */
object TextOps {
  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def wordCount(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenization count: letter runs, digit runs, and
    * single non-alphanumeric marks each count as one token. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Multiset count of tokens that appear in `words`. */
  def stopwordCount(c: Column, words: Seq[String]): Column = {
    val lits = array(words.map(lit).toIndexedSeq: _*)
    size(filter(tokens(c), t => array_contains(lits, t)))
  }

  def distinctWordCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** English stopwords used by quality scoring (fixed, part of the
    * operator contract). */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  /** Per-language stopword lists for [[langHits]]. */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> StopwordsEn,
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "por", "con", "para")
  )

  def langHits(c: Column, lang: String): Column =
    stopwordCount(c, LangStopwords(lang))

  /** CJK character count (language id for zh). */
  def cjkCount(c: Column): Column = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))

  /** Integer-math quality score in [0,100]:
    * length (≤25) + word count (≤25) + stopword ratio (≤25) +
    * lexical diversity (≤25). `div` is integer division, so the score
    * is exact and portable. */
  def qualityScore(nChars: Column, nWords: Column, stopHits: Column, distinctWords: Column): Column = {
    val lenScore = least(lit(25L), call_function("div", nChars.cast("long"), lit(20L)))
    val wordScore = least(lit(25L), call_function("div", nWords.cast("long"), lit(4L)))
    val stopPct = call_function("div", stopHits.cast("long") * 100L, greatest(nWords.cast("long"), lit(1L)))
    val stopScore = least(lit(25L), stopPct)
    val divPct = call_function("div", distinctWords.cast("long") * 100L, greatest(nWords.cast("long"), lit(1L)))
    val divScore = least(lit(25L), call_function("div", divPct, lit(2L)))
    lenScore + wordScore + stopScore + divScore
  }

  /** Total word n-grams WITH multiplicity (`wordCount - n + 1`,
    * floored at 0). */
  def totalGrams(c: Column, n: Int): Column =
    greatest(wordCount(c) - (n - 1), lit(0)).cast("long")

  /** Distinct word n-grams per doc. */
  def distinctGrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))
      ))
    size(array_distinct(grams)).cast("long")
  }

  /** Gopher-style repetition signal: percentage of n-gram slots
    * occupied by repeats of an earlier gram (integer half-up). */
  def dupGramPct(c: Column, n: Int): Column = {
    val t = totalGrams(c, n)
    val d = distinctGrams(c, n)
    when(t === 0, lit(0L)) // ANSI mode: guard the zero divisor
      .otherwise(call_function("div", (t - d) * 200L + t, t * 2L))
  }

  /** Stage gram statistics onto `df` as columns `n_words`,
    * `grams_total`, `grams_distinct`, `dup_gram_pct` (all long),
    * computing the token array and the gram set ONCE.
    *
    * The expression-composition route ([[distinctGrams]] /
    * [[dupGramPct]]) re-evaluates the whole gram construction per
    * reference once CollapseProject inlines it, and builds gram
    * STRINGS (slice + concat_ws per gram). Here the token array and
    * the hashed-gram array are materialized in their own projections
    * (the multi-reference-non-cheap guard keeps them), and grams are
    * 64-bit hashes of `n` consecutive token hashes — no string
    * building. Token→hash is injective on whitespace-split tokens up
    * to xxhash64 collisions (~2⁻⁶⁴), so the distinct count matches
    * the string-gram oracle.
    */
  def withGramStats(df: org.apache.spark.sql.DataFrame, text: Column, n: Int): org.apache.spark.sql.DataFrame = {
    val others = df.columns.map(col).toIndexedSeq
    val th = col("__th")
    val gramHashes = when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(0), size(th) - n),
        i => xxhash64((0 until n).map(j => element_at(th, i + j + 1)): _*)))
    val t = col("grams_total"); val d = col("grams_distinct")
    df
      .select(others :+ transform(tokens(text), tk => xxhash64(tk)).as("__th"): _*)
      .select(others ++ Seq(
        size(th).cast("long").as("n_words"),
        greatest(size(th) - (n - 1), lit(0)).cast("long").as("grams_total"),
        size(array_distinct(gramHashes)).cast("long").as("grams_distinct")): _*)
      .withColumn("dup_gram_pct",
        when(t === 0, lit(0L))
          .otherwise(call_function("div", (t - d) * 200L + t, t * 2L)))
  }

  def qualityBucket(score: Column): Column =
    when(score >= 60, lit("high")).when(score >= 40, lit("medium")).otherwise(lit("low"))

  /** Heuristic language id: CJK chars dominate, else the language
    * with the most stopword hits (fixed priority en>de>fr>es on
    * ties), else 'unknown'. */
  def langPredict(c: Column): Column =
    langPredictFromHits(
      langHits(c, "en"), langHits(c, "de"), langHits(c, "fr"),
      langHits(c, "es"), cjkCount(c))

  /** Decision rule over ALREADY-COMPUTED hit counts — use this form
    * when the hits are staged as columns (e.g. #29 emits them
    * anyway): each `langHits` is a tokenize+filter pass, and deriving
    * the prediction from the staged columns evaluates it once per
    * language instead of once per reference. */
  def langPredictFromHits(en: Column, de: Column, fr: Column, es: Column, cjk: Column): Column =
    when(cjk > 0, lit("zh"))
      .when(en >= de && en >= fr && en >= es && en > 0, lit("en"))
      .when(de >= fr && de >= es && de > 0, lit("de"))
      .when(fr >= es && fr > 0, lit("fr"))
      .when(es > 0, lit("es"))
      .otherwise(lit("unknown"))
}
