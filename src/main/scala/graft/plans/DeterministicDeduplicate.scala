package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CreateStruct, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: make `dropDuplicates(keys)` deterministic.
  *
  * Spark's `Deduplicate` keeps an ARBITRARY survivor per key — whichever
  * row an aggregate-based rewrite encounters first, which varies with
  * partitioning, task order, and retries. This engine's contract is
  * bit-stable results under any cluster layout (SURVEY.md §2.3), so the
  * catalog never calls `dropDuplicates`; this rule extends the same
  * guarantee to ad-hoc user queries written against the session.
  *
  * Rewrite: `Deduplicate(keys, child)` becomes
  *
  * {{{
  *   Project(keys ++ minStruct.col_i)
  *     Aggregate(keys, keys :+ min(struct(nonKeys)))
  * }}}
  *
  * i.e. the survivor is the row whose non-key column tuple is MINIMAL
  * (struct ordering = lexicographic by field) — one of the valid
  * outcomes of the original operator, now always the same one. Still
  * one partial+final aggregation around a single exchange on the dedup
  * key (struct-min plans as SortAggregate), same shuffle shape and
  * scale behavior as the original.
  *
  * Installed via [[GraftExtensions]] (`injectPostHocResolutionRule` —
  * analysis time, before the optimizer's
  * ReplaceDeduplicateWithAggregate consumes the node). Batch
  * only: streaming dedup keeps Spark's state-store implementation.
  * Skipped when a non-key column is unorderable (e.g. map<>), where
  * min(struct) is undefined.
  */
object DeterministicDeduplicate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case d @ Deduplicate(keys, child)
        if !child.isStreaming && keys.nonEmpty &&
          child.output.exists(a => !keys.exists(_.semanticEquals(a))) &&
          child.output.forall(a => org.apache.spark.sql.catalyst.expressions
            .RowOrdering.isOrderable(a.dataType)) =>
      val keyAttrs: Seq[Attribute] =
        child.output.filter(a => keys.exists(_.semanticEquals(a)))
      val nonKeys: Seq[Attribute] =
        child.output.filterNot(a => keys.exists(_.semanticEquals(a)))
      val minStruct = Alias(
        AggregateExpression(Min(CreateStruct(nonKeys)), Complete, isDistinct = false),
        "__min_row")()
      val agg = Aggregate(
        keyAttrs, (keyAttrs: Seq[NamedExpression]) :+ minStruct, child)
      // restore the original column order and names/exprIds
      val fields: Seq[NamedExpression] = d.output.map { out =>
        if (keys.exists(_.semanticEquals(out))) out
        else {
          val idx = nonKeys.indexWhere(_.semanticEquals(out))
          Alias(GetStructField(minStruct.toAttribute, idx, Some(out.name)),
            out.name)(exprId = out.exprId)
        }
      }
      Project(fields, agg)
  }
}
