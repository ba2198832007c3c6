package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the quantized dot product
  * floor(Σ a(i)·b(i) × 1e6) over two array<double> columns — the exact
  * re-rank kernel of the LSH and IVF ANN paths (vectors pre-normalized,
  * so the dot IS the cosine).
  *
  * Replaces a Scala UDF over Seq[Double]: the UDF pays per-element boxing
  * plus a codegen fence at every call; this expression stays inside
  * whole-stage codegen and reads primitive doubles straight out of the
  * columnar ArrayData. Summation order is left-to-right — identical to
  * the UDF it replaces and to the DuckDB oracle's list_reduce. */
case class DotE6(left: Expression, right: Expression) extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_e6 needs two array<double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_e6"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotE6.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.DotE6.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotE6 =
    copy(left = newLeft, right = newRight)
}

object DotE6 {
  /** Shared kernel for interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    math.floor(s * 1000000.0).toLong
  }

  /** Column API over the native expression. */
  def col(a: Column, b: Column): Column =
    GraftBridge.column(DotE6(GraftBridge.expression(a), GraftBridge.expression(b)))
}
