package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeMap, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate AND projection pushdown through [[AsofJoinNode]] — the
  * optimizer work Catalyst does for built-in joins but cannot do for an
  * opaque custom node. Without this rule a `Filter` above an as-of
  * join evaluates AFTER the merge, so both sides shuffle and sort rows
  * the query is about to drop; at scale the filter belongs at the
  * scans (PushedFilters), which only happens once it sits directly
  * above them. Likewise a `Project` of few columns above the join
  * would still drag every LEFT column through the exchange, sort, and
  * merge (the API prunes only the right side at construction) — the
  * projection case below narrows the left child to the referenced
  * columns plus the join's own keys/ts, and Catalyst's ColumnPruning
  * then carries that Project into the scan's ReadSchema.
  *
  * Soundness: the as-of join emits exactly one output row per left row
  * (left-outer shape), and a left row's match depends only on that
  * row's own (keys, ts) — dropping OTHER left rows never changes it.
  * So any conjunct over left columns commutes with the join. A
  * conjunct over KEY columns alone additionally transfers to the right
  * side (rewritten leftKey→rightKey): right rows whose keys fail the
  * predicate can only match left rows that were just filtered out.
  * Conjuncts touching payload columns stay above (a right-row filter
  * would CHANGE which row is "most recent" — never pushable).
  * Non-deterministic conjuncts stay above (evaluation-count and
  * ordering contracts), matching Catalyst's own pushdown guard.
  *
  * Injected via `injectOptimizerRule` (GraftExtensions), so it runs
  * inside the fixed-point operator-optimization batch: once a conjunct
  * lands above a child scan, Catalyst's own rules carry it into
  * PushedFilters. */
object AsofJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsofJoinNode) =>
      val leftOut = j.left.outputSet
      // key attrs on both sides, positionally aligned, for the rewrite;
      // non-Attribute key expressions (none produced by the public API)
      // disqualify the right-side transfer but not the left push
      val keyPairs = j.leftKeys.zip(j.rightKeys).collect {
        case (l: Attribute, r: Attribute) => l -> r
      }
      val allKeysAreAttrs = keyPairs.size == j.leftKeys.size
      val leftToRightKey = AttributeMap(keyPairs)
      val leftKeySet = AttributeSet(keyPairs.map(_._1))
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftOut))
      if (pushable.isEmpty) f
      else {
        val toRight = pushable
          .filter(c => allKeysAreAttrs && c.references.subsetOf(leftKeySet))
          .map(_.transform { case a: Attribute => leftToRightKey(a) })
        val newLeft = Filter(pushable.reduce(And), j.left)
        val newRight =
          if (toRight.isEmpty) j.right
          else Filter(toRight.reduce(And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // Left-side column pruning: rows out ARE left rows (one per left
    // row), and the merge itself reads only the left keys and ts — so
    // any left column the parent projection does not reference can be
    // dropped BELOW the join. Sound for the same reason the left
    // filter push is: the operator neither reads nor reorders other
    // left columns. The right side needs no case here — the public API
    // already narrows it to keys ++ ts ++ payload ++ tieBreak at
    // construction. Fixed-point safe: fires only while the left child
    // still carries unreferenced columns.
    case p @ Project(fields, j: AsofJoinNode) =>
      val required = AttributeSet(fields.flatMap(_.references)) ++
        AttributeSet(j.leftKeys.flatMap(_.references)) ++
        j.leftTs.references
      val keptLeft = j.left.output.filter(required.contains)
      if (keptLeft.size == j.left.output.size) p
      else p.copy(child = j.copy(left = Project(keptLeft, j.left)))
  }
}
