package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is
  * semantically identical but allocates an intermediate array per row and
  * evaluates the lambda interpreter-style, which dominates the runtime of
  * O(n²) similarity joins (12.5M pairs × 64 dims at sf0.1). This expression
  * generates a tight primitive loop inside whole-stage codegen: no
  * allocation, no virtual calls.
  *
  * Summation order is left-to-right, exactly like the composed form, so
  * results are bit-identical to it (and to the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'sum')`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers guarantee array<double> inputs (plans cast explicitly);
  // ExpectsInputTypes is private[sql] so no implicit-cast contract here.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash fingerprint over an `array<long>` of token hashes: bit j of the
  * result is set iff Σ_tokens (bit j of hash ? +1 : -1) > 0, over the low
  * `bits` bits.
  *
  * The composable form is `bits` separate higher-order `aggregate()` folds —
  * interpreted lambdas, each re-walking the token array (56 × n_tokens per
  * row). This expression makes ONE pass with primitive counters inside
  * codegen. Bit-identical to the composed form by construction.
  */
case class SimHash56(child: Expression, bits: Int = 56)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val counters = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < bits) { if (counters(j) > 0) r |= (1L << j); j += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int[] $c = new int[$bits];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $c[$j]++; else $c[$j]--;
         |  }
         |}
         |long $r = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($c[$j] > 0) $r |= (1L << $j);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API for [[SimHash56]]. */
  def simhash56(hashes: Column): Column =
    GraftSqlBridge.column(SimHash56(GraftSqlBridge.expression(hashes)))
}
