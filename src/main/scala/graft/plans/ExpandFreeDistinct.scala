package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: rewrite a GLOBAL aggregate containing two or more
  * `count(DISTINCT col)`s into a cross join of single-distinct
  * pre-aggregates — the Expand-free shape `QueriesAnalytics.kpiSummary`
  * builds by hand, generalized to any pure-SQL query through
  * [[graft.GraftExtensions]].
  *
  * Why: Spark plans multi-distinct (`RewriteDistinctAggregates`) via
  * an Expand that replicates EVERY input row once per distinct column
  * before the exchange — N distincts shuffle (N+1)× the fact. This
  * shape instead runs each distinct as its own column-pruned
  * pre-aggregate (shuffle volume = that column's key set) and
  * recombines the 1-row results with cross joins. The bet is
  * shuffle-bound clusters (see the kpiSummary scaladoc for when it
  * flips); disable with `spark.graft.expandFreeDistinct.enabled=false`.
  *
  * Scope (deliberately tight — eligibility is correctness):
  *  - global aggregates only (no grouping keys): the grouped variant
  *    needs the join keyed on the groups and NULL-safe key equality;
  *  - each distinct is exactly `count(DISTINCT attr)` — single
  *    attribute, no FILTER clause;
  *  - remaining aggregates contain no distinct anywhere;
  *  - the child plan is fully deterministic (it is duplicated per
  *    distinct — a nondeterministic child would diverge between
  *    copies).
  *
  * Injected via `injectOptimizerRule` (the extended operator-
  * optimization batch), which runs BEFORE `RewriteDistinctAggregates`
  * — eligible plans never reach the Expand path. The rewrite is
  * fixed-point-safe: its outputs contain no multi-distinct aggregate.
  */
object ExpandFreeDistinct extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.expandFreeDistinct.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) if groupings.isEmpty =>
        rewriteOrKeep(agg, aggExprs, child)
    }

  private def rewriteOrKeep(
      agg: Aggregate, aggExprs: Seq[NamedExpression], child: LogicalPlan): LogicalPlan = {
    val distincts = aggExprs.collect {
      case a @ Alias(AggregateExpression(Count(Seq(att: Attribute)), _, true, None, _), _) =>
        (a, att)
    }
    val distinctIds = distincts.map(_._1.exprId).toSet
    val others = aggExprs.filterNot(e => distinctIds.contains(e.exprId))
    val othersClean = others.forall(e => !e.exists {
      case ae: AggregateExpression => ae.isDistinct
      case _ => false
    })
    val childDeterministic = child.collectFirst {
      case p if p.expressions.exists(!_.deterministic) => p
    }.isEmpty
    if (distincts.size < 2 || !othersClean || !childDeterministic) agg
    else {
      // count(att) over the groupBy(att) distinct: the NULL group row
      // survives the inner aggregate but count(attr) skips it — the
      // same NULL exclusion count(DISTINCT attr) defines
      val perDistinct = distincts.map { case (alias, att) =>
        Aggregate(
          Nil,
          Seq(Alias(Count(Seq[Expression](att)).toAggregateExpression(), alias.name)(alias.exprId)),
          Aggregate(Seq(att), Seq(att), child))
      }
      val parts: Seq[LogicalPlan] =
        (if (others.nonEmpty) Seq(Aggregate(Nil, others, child)) else Nil) ++ perDistinct
      val joined = parts.reduce((l, r) => Join(l, r, Cross, None, JoinHint.NONE))
      // every part carries the ORIGINAL exprIds, so parents resolve
      // unchanged; the Project restores the original column order
      Project(aggExprs.map(_.toAttribute), joined)
    }
  }
}
