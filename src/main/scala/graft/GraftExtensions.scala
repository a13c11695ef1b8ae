package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashSig, ShingleHash56, SimHash56, ZOrder2}
import graft.text.TextOps

/** SparkSessionExtensions entry point: exposes the library's custom
  * codegen expressions to the SQL surface, so `spark.sql` users call
  * them like built-ins:
  *
  *   SparkSession.builder.withExtensions(new GraftExtensions)    // code
  *   --conf spark.sql.extensions=graft.GraftExtensions           // config
  *
  *   SELECT graft_dot(a, b), graft_simhash56(hs),
  *          graft_shingle_hash56(toks), graft_minhash_sig(hs)
  *
  * This is the library-integration story for a shared cluster: the SQL
  * names bind to the SAME Expression classes as the Scala DSL forms, so
  * they participate in whole-stage codegen identically — no UDF registry
  * involved. Plan machinery stays out of this hook: every OPERATOR in
  * this engine is expressible in Catalyst's built-in algebra (the
  * preference ladder's first rung). The one optimizer rule the library
  * ships — [[graft.plans.MvRewrite]], transparent materialized-view
  * routing, a semantic no operator composition can express — installs
  * per-registration via `spark.experimental.extraOptimizations` (see
  * its scaladoc), not globally here: a rewrite that silently applies to
  * every session is exactly what a conservative MV story avoids.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  // 5-arg ExpressionInfo is (className, db, name, usage, examples) — db
  // must be null for a session-global function, not skipped. className is
  // the concrete Expression class so DESCRIBE FUNCTION points at the
  // implementation, not this registration shim.
  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  /** (name, doc, builder) triples — shared by the extensions path and
    * [[registerAll]] for already-built sessions.
    */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes (array, array)")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_simhash56"),
      info(classOf[SimHash56], "graft_simhash56",
        "graft_simhash56(hashes) - 56-bit simhash over an array of int64 hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash56 takes (array<bigint>)")
        SimHash56(args.head)
      }),
    (FunctionIdentifier("graft_shingle_hash56"),
      info(classOf[ShingleHash56], "graft_shingle_hash56",
        "graft_shingle_hash56(tokens[, k]) - distinct 56-bit hashes of word k-shingles (default k=3)"),
      (args: Seq[Expression]) => args match {
        case Seq(toks) => ShingleHash56(toks, 3)
        case Seq(toks, k) =>
          require(k.foldable && k.eval() != null &&
            k.eval().isInstanceOf[Number],
            "graft_shingle_hash56: k must be a non-null integer literal")
          ShingleHash56(toks, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "graft_shingle_hash56 takes (array<string>[, k])")
      }),
    (FunctionIdentifier("graft_zorder"),
      info(classOf[ZOrder2], "graft_zorder",
        "graft_zorder(x, y[, bits]) - Morton interleave of the low bits (default 16) of two longs"),
      (args: Seq[Expression]) => {
        // SQL surface accepts any integral type: ZOrder2's interpreted
        // path unboxes Long, so INT literals/columns must be cast here
        // (ExpectsInputTypes is private[sql]).
        def asLong(e: Expression): Expression =
          org.apache.spark.sql.catalyst.expressions.Cast(e,
            org.apache.spark.sql.types.LongType)
        args match {
          case Seq(x, y) => ZOrder2(asLong(x), asLong(y))
          case Seq(x, y, b) =>
            val bitsVal = if (b.foldable) b.eval() else null
            val bits = bitsVal match {
              // integral literals only — a fractional 8.9 must be
              // rejected, not silently truncated to 8
              case i: java.lang.Integer => i.intValue()
              case l: java.lang.Long    =>
                // toIntExact: a bigint literal outside Int range must be
                // rejected, not truncated into the valid window (2^32+1
                // would otherwise silently become bits=1)
                try java.lang.Math.toIntExact(l.longValue())
                catch { case _: ArithmeticException =>
                  throw new IllegalArgumentException(
                    s"graft_zorder: bits=$l out of integer range")
                }
              case s: java.lang.Short   => s.intValue()
              case y: java.lang.Byte    => y.intValue()
              case _ => throw new IllegalArgumentException(
                "graft_zorder: bits must be a non-null integer literal")
            }
            ZOrder2(asLong(x), asLong(y), bits)
          case _ => throw new IllegalArgumentException(
            "graft_zorder takes (bigint, bigint[, bits])")
        }
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info(classOf[MinHashSig], "graft_minhash_sig",
        "graft_minhash_sig(hashes) - 12-permutation minhash signature (library parameters)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash_sig takes (array<bigint>)")
        MinHashSig(args.head,
          TextOps.MinhashParams.map(_._1), TextOps.MinhashParams.map(_._2),
          TextOps.P)
      }))

  /** Register the functions on an existing session (the extensions hook
    * only runs at session build time).
    */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
