package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for Cypher `normalize(s[, form])` (Neo4j
  * 5.17) — Spark has no built-in, so a native Catalyst expression
  * keeps it inside whole-stage codegen (a static helper call, like
  * [[StripPrefix]]). The fast path: NFC-normalized ASCII/quick-check
  * input short-circuits through java.text.Normalizer.isNormalized
  * without allocating.
  */
case class NormalizeForm(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "cypher_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NormalizeForm.norm(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NormalizeForm$$.MODULE$$.norm($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeForm =
    copy(child = newChild)
}

object NormalizeForm {

  def norm(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String): Column = {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unknown normal form: $form")
    GraftColumnBridge.column(
      NormalizeForm(GraftColumnBridge.expression(c), form))
  }
}
