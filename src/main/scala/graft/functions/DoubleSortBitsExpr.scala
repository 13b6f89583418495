package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** IEEE-754 total-order bits of a double: the 64-bit value whose
  * UNSIGNED ordering equals the numeric ordering of the input
  * (negative doubles flip all bits, non-negative flip the sign bit —
  * the classic sortable-double transform every order-preserving index
  * encoding uses). Rendered as fixed-width hex, its LEXICAL order is
  * the numeric order, which is what lets a range-partitioned property
  * index serve `WHERE n.p > $v` with directory-level pruning:
  * boundary assignment (this expression, distributed) and probe
  * mapping (the driver twin in [[DoubleSortBits.bits]]) agree
  * bit-for-bit by construction.
  *
  * Stays inside whole-stage codegen — a pure two-instruction bit
  * transform on the hot build path.
  */
case class DoubleSortBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "double_sort_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"double_sort_bits needs a DOUBLE child, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    DoubleSortBits.bits(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DoubleSortBits$$.MODULE$$.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortBits =
    copy(child = newChild)
}

object DoubleSortBits {

  /** driver/executor shared kernel: sign-magnitude → unsigned-sortable.
    * NaN canonicalizes through doubleToLongBits (sorts above +Inf). */
  def bits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) | java.lang.Long.MIN_VALUE)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(DoubleSortBits(GraftColumnBridge.expression(c)))
}
