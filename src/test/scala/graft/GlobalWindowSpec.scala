package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, LocalLimit, LogicalPlan, Window}

/** Global plan invariant: no UNBOUNDED global window anywhere in the
  * registry. A Window with an empty partition spec serializes its
  * whole input through one task — fatal at 100 TB unless the input is
  * already collapsed to a bounded grain. PlanSpec pins per-query
  * shapes; this spec walks EVERY registered query's optimized plan and
  * forbids an empty-partition Window whose subtree does not contain an
  * Aggregate / Limit / Deduplicate (the grain-collapsing operators).
  *
  * The queries that do carry empty-partition windows today all sit on
  * collapsed grains by construction: q_benford's 9-digit ladder,
  * q_vocab_coverage's 31-row vocab head, q_key_skew / q_length_outliers'
  * ≤20-cell histograms, q_revenue_gini's per-customer aggregate — each
  * has an Aggregate below the window, which is exactly what this
  * invariant checks.
  */
class GlobalWindowSpec extends SparkSpec {

  private def grainCollapsedBelow(p: LogicalPlan): Boolean =
    p.collectFirst {
      case _: Aggregate    => ()
      case _: GlobalLimit  => ()
      case _: LocalLimit   => ()
      case _: Deduplicate  => ()
    }.isDefined

  test("every registered query: empty-partition windows only above a collapsed grain") {
    val violations = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.collect {
        case w: Window if w.partitionSpec.isEmpty && !grainCollapsedBelow(w.child) =>
          s"$name: unbounded global window over unaggregated input:\n  ${w.simpleString(3)}"
      }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  test("the invariant itself trips on a genuinely unbounded global window") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    // row-grain input, no partition key: the shape the invariant exists
    // to catch — prove the walk actually flags it (no vacuous pass)
    val bad = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(W.orderBy("l_orderkey")))
    val hits = bad.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty && !grainCollapsedBelow(w.child) => w
    }
    assert(hits.nonEmpty, "detector failed to flag a row-grain global window")
  }
}
