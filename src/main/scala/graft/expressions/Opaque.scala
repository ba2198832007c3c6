package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity passthrough that Catalyst cannot constant-fold
  * (`foldable = false`): the optimization BARRIER for the one place a
  * constant-valued expression must survive into the physical plan —
  * an injected per-call constant used as a Window PARTITION key
  * ([[graft.text.Hybrid.rankCut]]). Without it, FoldablePropagation
  * rewrites the partition attribute to its literal and the planner
  * drops the partition spec entirely, leaving a physically
  * partition-less WindowExec whose `No Partition Defined` warning is
  * indistinguishable from a REAL unpartitioned-window regression —
  * after round 11 that warning noise was masking the channel. The
  * wrapped frame is ≤k rows by construction (the cut runs first), so
  * keeping the one-partition window is the honest plan; this merely
  * keeps its partition spec visible. Codegen'd (a plain assignment),
  * deterministic, null-transparent — zero runtime cost. */
case class Opaque(child: Expression) extends UnaryExpression {

  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_opaque"

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c;")

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object Opaque {
  /** Column API over the barrier expression. */
  def col(c: Column): Column =
    GraftBridge.column(Opaque(GraftBridge.expression(c)))
}
