package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the whole-operator tier of SURVEY §2.12's
  * custom-extension ladder (compose < Expression/Aggregator < LogicalPlan
  * + Strategy + SparkPlan < mapPartitions): a first-class Catalyst
  * operator with the SAME semantics as [[graft.ops.Relational.asofJoin]]
  * (DuckDB `ASOF LEFT JOIN` — attach to each left row the payload of the
  * most recent right row with `right.ts <= left.ts` under equal keys;
  * the q59 oracle).
  *
  * Why a custom operator when the composed form is already
  * single-shuffle: the union-tag shape materializes BOTH sides through
  * one unioned sort + a running last-non-null WindowExec, i.e. every
  * right row is carried through the window frame machinery and a
  * whole-row struct column, and the result's lineage is a union the
  * planner cannot attribute back to the left side. The native operator
  * instead:
  *
  *  - declares `ClusteredDistribution(keys)` per child and
  *    `(keys, ts)` child orderings, so EnsureRequirements plans ONE
  *    hash exchange per side (none when a side is already partitioned
  *    on the keys — e.g. a bucketed table or an upstream aggregate)
  *    and partition-local sorts, exactly like a sort-merge join;
  *  - merges the two sorted streams in one pass per partition with a
  *    single buffered right row and NO window buffer, per-task memory
  *    O(1) beyond the sort — 100M rows per key stream through;
  *  - reports `outputPartitioning = left partitioning` (rows out ARE
  *    left rows), so a downstream groupBy/join on the keys plans
  *    shuffle-free — the union shape cannot make that promise.
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftExtensions) — the deployment path a real cluster uses.
  */
object AsofJoin {

  /** As-of-join `left` to `right` on equal `keys` and the most recent
    * `right.tsCol <= left.tsCol`, returning every left column plus
    * `prefix`-renamed `payload` columns (null when no right row
    * precedes). Ties between right rows at identical (keys, ts) are
    * broken by `rightTieBreak` payload columns ascending, last wins —
    * identical contract to [[graft.ops.Relational.asofJoin]], pinned by
    * AsofJoinNativeSpec parity.
    *
    * Right rows with a null ts never match (SQL `l.ts >= r.ts` is
    * null-false); left rows with a null ts get a null payload. Null
    * KEYS group together (both implementations share the grouped-nulls
    * convention of Window.partitionBy; SQL equi-join semantics would
    * drop them — callers who want that filter keys first).
    *
    * The right side is pruned here to keys ++ ts ++ payload ++
    * tieBreak: the custom node is opaque to ColumnPruning, so the API
    * does the pruning Catalyst otherwise would. The LEFT side is
    * pruned by the injected [[AsofJoinPushdown]] rule's Project case —
    * a downstream select of few columns narrows the left child before
    * the exchange/sort/merge (plan-pinned in AsofJoinNativeSpec). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, payload: Seq[String],
           prefix: String = "asof_",
           rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    val spark = left.sparkSession
    // fresh exprIds on the right via aliases: left and right commonly
    // derive from the same source (q59: two filters of `events`), and a
    // custom binary node is invisible to DeduplicateRelations
    val rCols = (keys ++ Seq(tsCol) ++ payload ++ rightTieBreak).distinct
    val rPrep = right.filter(col(tsCol).isNotNull)
      .select(rCols.map(c => col(c).as(c)): _*)
    val lPlan = GraftBridge.analyzedPlan(left)
    val rPlan = GraftBridge.analyzedPlan(rPrep)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column `$name` (has: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lPlan, _, "left"))
    val rk = keys.map(attr(rPlan, _, "right"))
    lk.zip(rk).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"key `${l.name}` type mismatch: ${l.dataType} vs ${r.dataType}") }
    val lts = attr(lPlan, tsCol, "left")
    val rts = attr(rPlan, tsCol, "right")
    require(lts.dataType == rts.dataType,
      s"ts type mismatch: ${lts.dataType} vs ${rts.dataType}")
    val pay = payload.map(attr(rPlan, _, "right"))
    val tie = rightTieBreak.map(attr(rPlan, _, "right"))
    val payloadOut = pay.zip(payload).map { case (a, n) =>
      AttributeReference(prefix + n, a.dataType, nullable = true)() }
    GraftBridge.ofRows(spark,
      AsofJoinNode(lPlan, rPlan, lk, rk, lts, rts, pay, tie, payloadOut))
  }
}

/** Logical as-of join. `payloadOut` carries the operator's produced
  * attributes (fixed at construction so exprIds stay stable across
  * transformUp copies — the Generate/`generatorOutput` convention). */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute], tieBreak: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]; injected via
  * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, pay, tie, out) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, pay, tie, out) :: Nil
    case _ => Nil
  }
}
