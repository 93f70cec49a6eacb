package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (reference: the four Great
  * Expectations suites under `gx/expectations/` and their runner
  * `utility/data_validator.py`).
  *
  * A suite compiles to ONE conditional-aggregation pass over the
  * frame — every expectation becomes a `sum(when(violated,1))`
  * column, so checking N expectations costs one scan regardless of N
  * (the reference runs GE per-expectation passes). Uniqueness uses
  * `count - countDistinct` in the same pass.
  *
  * Results come back long-form `(check_name, check_value)` so suites
  * across tables union into one report.
  */
object DataQuality {
  sealed trait Expectation { def name: String; def violations: Column }

  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null_${column}_violations"
    val violations: Column = sum(when(col(column).isNull, 1L).otherwise(0L))
  }
  final case class Unique(column: String) extends Expectation {
    val name = s"unique_${column}_violations"
    val violations: Column = count(lit(1)) - countDistinct(col(column))
  }
  final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
    val name = s"range_${column}_violations"
    val violations: Column =
      sum(when(!(col(column).between(lo, hi)) || col(column).isNull, 1L).otherwise(0L))
  }
  final case class MatchesRegex(column: String, regex: String) extends Expectation {
    val name = s"regex_${column}_violations"
    val violations: Column =
      sum(when(!col(column).rlike(regex) || col(column).isNull, 1L).otherwise(0L))
  }
  /** Arbitrary row-level predicate that must hold. */
  final case class Satisfies(name0: String, predicate: Column) extends Expectation {
    val name = s"${name0}_violations"
    val violations: Column = sum(when(!coalesce(predicate, lit(false)), 1L).otherwise(0L))
  }

  /** Run a suite: one scan, long-form results (check_name, check_value),
    * plus a `row_count` check. */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    // coalesce: on an EMPTY frame the sum-based violation aggregates
    // return NULL, which downstream readers (stack, gate getLong)
    // reject — an empty input has zero violations by definition (an
    // all-filtered batch is a legitimate pipeline state, found by the
    // sf1 incremental rehearsal)
    val aggs = count(lit(1)).as("row_count") +:
      suite.map(e => coalesce(e.violations.cast("long"), lit(0L)).as(e.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = "row_count" +: suite.map(_.name)
    val stackArgs = names.map(n => s"'$n', `$n`").mkString(", ")
    one.selectExpr(s"stack(${names.length}, $stackArgs) as (check_name, check_value)")
      .orderBy("check_name")
  }

  /** True iff every expectation has zero violations. */
  def passed(results: DataFrame): Boolean =
    results.filter(col("check_name") =!= "row_count" && col("check_value") > 0).isEmpty

  /** Schema expectation (`expect_table_columns_to_match_set`):
    * metadata-only — no scan — so it runs before any data is read and
    * fails fast on drifted upstream schemas. Returns the violation
    * set (missing ++ unexpected), empty = pass. */
  def columnsMatchSet(df: DataFrame, expected: Set[String]): Set[String] = {
    val actual = df.columns.toSet
    (expected -- actual).map(c => s"missing:$c") ++ (actual -- expected).map(c => s"unexpected:$c")
  }
}
