package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

import graft.zorder.ZOrder

/**
 * `zorder(x, y)`: Morton-interleave two non-negative 32-bit coordinates
 * into one 64-bit key. Native Catalyst expression with whole-stage
 * codegen — the hot-path replacement for a Scala UDF (SURVEY §2.10).
 *
 * Semantics: `graft.zorder.ZOrder.zorder`, the Long re-expression of the
 * reference codec (Tiny-MD-HBase `Utils.java:32-59`, `bitwiseZip`).
 * Codegen emits a direct static call, so the expression stays inside
 * WholeStageCodegen spans.
 */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.zorder(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.zorder.ZOrder.zorder($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

/** `zorder_x(z)`: the x coordinate de-interleaved from a Morton key
  * (reference `Utils.java:61-73`, `bitwiseUnzip`[0]). */
case class ZOrderX(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder_x"
  override protected def nullSafeEval(z: Any): Any =
    ZOrder.elimGap(z.asInstanceOf[Long] >>> 1)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, z => s"graft.zorder.ZOrder.elimGap($z >>> 1)")
  override protected def withNewChildInternal(c: Expression): ZOrderX = copy(c)
}

/** `zorder_y(z)`: the y coordinate de-interleaved from a Morton key. */
case class ZOrderY(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder_y"
  override protected def nullSafeEval(z: Any): Any =
    ZOrder.elimGap(z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, z => s"graft.zorder.ZOrder.elimGap($z)")
  override protected def withNewChildInternal(c: Expression): ZOrderY = copy(c)
}
