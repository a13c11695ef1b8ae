package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Morton (Z-order) interleave of the low `bits` bits of
  * two long columns: bit i of x lands at position 2i, bit i of y at 2i+1.
  *
  * The composable form — a [[graft.queries.Layout.zvalueComposed]] fold of
  * 2×`bits` literal shift/mask terms — is semantically identical and stays
  * in codegen, but materializes a ~64-node expression tree per reference.
  * This expression is ONE tight loop; on a layout pass that Z-orders every
  * row of a 100 TB write, the constant factor is the job. Bit-identical to
  * the composed form by construction (same shifts, same OR).
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression {

  // 2·bits positions must fit a long with none wrapping mod 64 — bits
  // outside [1, 32] would silently interleave onto colliding positions.
  require(bits >= 1 && bits <= 32, s"zorder bits must be in [1, 32]: $bits")

  // Callers guarantee long inputs (plans cast explicitly), as elsewhere in
  // this package: ExpectsInputTypes is private[sql].
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      s"""
         |long $r = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $r |= (($a >> $i) & 1L) << (2 * $i) | (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Column API for [[ZOrder2]]. Inputs are cast to long here — the
    * expression's interpreted path (constant folding, codegen fallback)
    * unboxes Long and would crash on int inputs; the cast is a no-op for
    * already-long columns.
    */
  def zorder(x: Column, y: Column, bits: Int = 16): Column = {
    def asLong(c: Column) =
      org.apache.spark.sql.catalyst.expressions.Cast(
        GraftSqlBridge.expression(c), LongType)
    GraftSqlBridge.column(ZOrder2(asLong(x), asLong(y), bits))
  }
}
