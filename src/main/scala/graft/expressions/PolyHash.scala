package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the portable polynomial hash
  * H(s) = fold(acc·31 + codeUnit) mod 1e9+7 — the engine's cross-engine-
  * reproducible fingerprint (graft.functions.Hashing).
  *
  * The Column-combinator formulation (`aggregate(split(s,""), …)`) is a
  * higher-order function: interpreted, one boxed step per character. This
  * expression generates a tight Java loop inside whole-stage codegen
  * (`doGenCode`), the preferred extension tier when built-in operators
  * can't express the semantics efficiently (native Expression > UDF).
  * Interpreted eval matches `Hashing.polyHash` exactly (parity-tested).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash needs a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i).toLong) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val acc = ctx.freshName("phAcc")
      val i = ctx.freshName("phI")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column API over the native expression. */
  def col(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}

/** SparkSessionExtensions hook: `--conf spark.sql.extensions=
  * graft.expressions.GraftExtensions` (or builder .withExtensions) makes
  * `graft_polyhash(str)` available from SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_e6"),
      new ExpressionInfo(classOf[DotE6].getName, "graft_dot_e6"),
      (children: Seq[Expression]) => DotE6(children.head, children(1))))
    // SQL surface for the governed-table layer: time travel + history
    // as table-valued functions (resolved at analysis time to the
    // manifest-pinned snapshot plans the Scala API builds)
    ext.injectTableFunction((
      FunctionIdentifier("graft_table"),
      new ExpressionInfo(graft.sources.GovernedSql.getClass.getName,
        "graft_table"),
      (children: Seq[Expression]) =>
        graft.sources.GovernedSql.tablePlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_as_of"),
      new ExpressionInfo(graft.sources.GovernedSql.getClass.getName,
        "graft_as_of"),
      (children: Seq[Expression]) =>
        graft.sources.GovernedSql.asOfPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(graft.sources.GovernedSql.getClass.getName,
        "graft_history"),
      (children: Seq[Expression]) =>
        graft.sources.GovernedSql.historyPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(graft.sources.GovernedSql.getClass.getName,
        "graft_changes"),
      (children: Seq[Expression]) =>
        graft.sources.GovernedSql.changesPlan(children)))
    // whole-operator tier: the native as-of join (§2.12 ladder step c)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // and its optimizer integration: predicate pushdown through the
    // custom node (a custom operator is otherwise opaque to Catalyst)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinPushdown)
  }
}
