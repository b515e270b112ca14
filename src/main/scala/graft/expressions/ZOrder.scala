package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `graft_zorder(x, y)` → bigint: the Morton (Z-order) interleave of the
  * low 16 bits of `x` and `y` — bit `i` of `x` lands at position `2i`, bit
  * `i` of `y` at `2i+1`.
  *
  * Why it exists: at 100 TB the scan cost of a 2-D range predicate (lat
  * AND lon, time AND key, …) is decided by the FILE LAYOUT, not the plan.
  * Sorting a write by one column makes parquet row-group min/max tight on
  * that column only; sorting by the z-value keeps the min/max envelope
  * tight on BOTH interleaved dimensions at once, so a 2-D predicate prunes
  * row groups/files on either axis at scan time (the classic Z-order
  * clustering used by lakehouse OPTIMIZE jobs). The expression is pure
  * shift/mask arithmetic (magic-mask dilation), stays inside whole-stage
  * codegen, and is registered for SQL use via [[GraftExtensions]].
  *
  * Parity: the same dilation is expressible in ANSI SQL as four
  * shift-or-mask stages, which is exactly how the `o2_zorder_layout`
  * oracle computes it in DuckDB.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects integral arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave16(asLong(x), asLong(y))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.ZOrder2$$.MODULE$$.interleave16((long) $x, (long) $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,…,30). */
  @inline final def spread16(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton code of the low 16 bits of each input (called from codegen). */
  final def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column form. */
  def apply(x: Column, y: Column): Column =
    GraftExpressionBridge.column(ZOrder2(
      GraftExpressionBridge.expression(x), GraftExpressionBridge.expression(y)))
}
