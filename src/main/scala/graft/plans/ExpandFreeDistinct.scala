package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
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
  * Grouped aggregates rewrite too: each distinct becomes a
  * (groups :+ col) pre-aggregate re-counted per group, and the parts
  * recombine with a NULL-SAFE inner equi-join on the group keys —
  * lossless because every part derives from the same child with the
  * same grouping, so all parts expose exactly the same group-key set.
  *
  * Scope (deliberately tight — eligibility is correctness):
  *  - grouping keys are plain attributes (no grouping expressions);
  *  - each distinct is exactly `count(DISTINCT attr)` — single
  *    attribute, no FILTER clause, and not itself a grouping key;
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
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.forall(_.isInstanceOf[Attribute]) =>
        rewriteOrKeep(agg, groupings.map(_.asInstanceOf[Attribute]), aggExprs, child)
    }

  private def rewriteOrKeep(
      agg: Aggregate, groupKeys: Seq[Attribute],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): LogicalPlan = {
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
    // count(DISTINCT g) for a grouping key g is degenerate (0 or 1 per
    // group) and would put a duplicate attribute in the inner
    // aggregate — leave it to Spark
    val distinctKeysDisjoint =
      distincts.forall { case (_, att) => !groupKeys.exists(_.exprId == att.exprId) }
    if (distincts.size < 2 || !othersClean || !childDeterministic || !distinctKeysDisjoint) agg
    else {
      // the BASE part carries the ORIGINAL grouping attr ids (plus the
      // non-distinct aggregates); grouping outputs already in `others`
      // are not duplicated
      val otherIds = others.map(_.exprId).toSet
      val baseOut = others ++ groupKeys.filterNot(g => otherIds.contains(g.exprId))
      val base: LogicalPlan =
        if (baseOut.nonEmpty) Aggregate(groupKeys, baseOut, child)
        else OneRowRelation() // global, distincts only: join seeds from a single row
      // count(att) over the groupBy(groups :+ att) distinct: a NULL
      // att survives the inner aggregate as its own group but
      // count(attr) skips it — the same NULL exclusion that
      // count(DISTINCT attr) defines. Group keys re-alias to FRESH
      // exprIds so the join's two sides never share attribute ids.
      val perDistinct = distincts.map { case (alias, att) =>
        val inner = Aggregate(groupKeys :+ att, groupKeys :+ att, child)
        val freshKeys = groupKeys.map(g => Alias(g, g.name)())
        val outer = Aggregate(
          groupKeys,
          freshKeys :+ Alias(Count(Seq[Expression](att)).toAggregateExpression(), alias.name)(alias.exprId),
          inner)
        (outer, freshKeys.map(_.toAttribute))
      }
      // every part derives from the SAME child with the SAME grouping,
      // so all parts contain exactly the same group key set — the
      // null-safe inner equi-join is lossless (groups can be NULL)
      val joined = perDistinct.foldLeft(base) { case (acc, (part, partKeys)) =>
        val cond = groupKeys.zip(partKeys)
          .map { case (g, p) => EqualNullSafe(g, p) }
          .reduceOption[Expression](And)
        Join(acc, part, if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
      }
      // every aggregate output carries its ORIGINAL exprId, so parents
      // resolve unchanged; the Project restores the original column
      // order and drops the per-part fresh join keys
      Project(aggExprs.map(_.toAttribute), joined)
    }
  }
}
