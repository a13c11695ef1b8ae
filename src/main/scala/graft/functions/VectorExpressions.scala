package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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
  // nullable even for non-null children: mismatched lengths yield null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch → null, exactly like the composable
    // aggregate(zip_with(a, b, _*_), 0d, _+_) form (zip_with pads the
    // short side with null → null product → null sum). Truncating to
    // min(n) would instead return a plausible-looking partial score for
    // a corrupt vector — a silent wrong answer in similarity ranking.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, like the composable form (a null
      // product nulls the whole sum); reading the slot as 0.0 would
      // return a plausible-looking partial score instead
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
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

  // bit j is 1L << j: java shifts are mod 64, so bits > 64 would wrap
  // and OR distinct bit positions into the same fingerprint bit (the
  // same bound HyperplaneBits enforces on its plane count)
  require(bits >= 1 && bits <= 64, s"bits=$bits must be in [1, 64]")

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

/** Distinct word-k-shingle hashes straight from a token array: one codegen
  * pass building each k-shingle string, hashing it (md5 56-bit prefix), and
  * set-deduplicating on the hash value. Replaces the interpreted
  * `array_distinct(transform(sequence(...), concat_ws))` +
  * `transform(_, md5 ∘ conv)` stack (per-element lambda dispatch plus ~5
  * intermediate arrays per row).
  *
  * md5_56 = first 14 hex digits of md5 as a big-endian 56-bit int, matching
  * `conv(substr(md5(s),1,14),16,10)` and the DuckDB oracle's
  * `CAST('0x'||substr(md5(s),1,14) AS BIGINT)`. Distinctness is on the hash
  * (the oracle mirrors with `list_distinct` over hashes).
  *
  * `distinct = false` emits every POSITIONAL window hash instead (length
  * max(0, n−k+1), order preserved) — the coverage-counting input of
  * substring-level dedup, where a window repeated within a document must
  * count each occurrence. Cheaper than the distinct path: the output size
  * is known up front, no set.
  */
case class ShingleHash56(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  // k < 1 would hash zero-token windows: every document collapses to
  // md5("") and all dedup candidates collide silently
  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  // interpreted-path digest reused per thread (matching the codegen
  // branch's mutable-state instance; getInstance per row is provider
  // lookup + allocation in the hot path)
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def windowDigest(toks: ArrayData, i: Int,
      md: java.security.MessageDigest): Long = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    var appended = 0
    while (j < k) {
      // skip null tokens like the concat_ws(' ', ...) stack this
      // replaces (getUTF8String returns null there → NPE otherwise)
      if (!toks.isNullAt(i + j)) {
        if (appended > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        appended += 1
      }
      j += 1
    }
    md.reset()
    ShingleHash56.fold56(
      md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val md = mdLocal.get()
    val n = toks.numElements()
    if (!distinct) {
      val arr = new Array[Long](math.max(n - k + 1, 0))
      var i = 0
      while (i <= n - k) { arr(i) = windowDigest(toks, i, md); i += 1 }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - k) {
      out.add(windowDigest(toks, i, md))
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "graftShMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val sb = ctx.freshName("sb")
      val d = ctx.freshName("d")
      val arr = ctx.freshName("arr")
      val it = ctx.freshName("it")
      val x = ctx.freshName("x")
      val app = ctx.freshName("appended")
      val windowHash =
        s"""StringBuilder $sb = new StringBuilder();
           |  int $app = 0;
           |  for (int $j = 0; $j < $k; $j++) {
           |    if (!$a.isNullAt($i + $j)) {
           |      if ($app > 0) $sb.append(' ');
           |      $sb.append($a.getUTF8String($i + $j).toString());
           |      $app++;
           |    }
           |  }
           |  $mdRef.reset();
           |  byte[] $d = $mdRef.digest($sb.toString().getBytes(java.nio.charset.StandardCharsets.UTF_8));""".stripMargin
      if (!distinct)
        s"""
           |int $n = $a.numElements();
           |int $cnt = $n - $k + 1; if ($cnt < 0) $cnt = 0;
           |long[] $arr = new long[$cnt];
           |for (int $i = 0; $i + $k <= $n; $i++) {
           |  $windowHash
           |  $arr[$i] = graft.functions.ShingleHash56.fold56($d);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         """.stripMargin
      else
        // Janino (Spark's codegen compiler) has no generics and unreliable
        // autoboxing: raw collection types + explicit Long.valueOf / cast.
        s"""
           |java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
           |int $n = $a.numElements();
           |for (int $i = 0; $i + $k <= $n; $i++) {
           |  $windowHash
           |  $set.add(Long.valueOf(graft.functions.ShingleHash56.fold56($d)));
           |}
           |long[] $arr = new long[$set.size()];
           |java.util.Iterator $it = $set.iterator();
           |int $x = 0;
           |while ($it.hasNext()) { $arr[$x++] = ((Long) $it.next()).longValue(); }
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash56 {
  /** First 7 md5 bytes as a big-endian 56-bit long (public: called from
    * generated code).
    */
  def fold56(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
}

/** MinHash signature over an `array<long>` of raw 56-bit shingle hashes:
  * slot i = min over hashes of `((h % P) * a_i + b_i) % P`, sentinel P for
  * the empty set. One codegen loop; semantically identical to the
  * composable `array(i -> coalesce(array_min(transform(hs, ...)), P))`.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val k = as.length
    val sig = Array.fill(k)(p)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // skip null slots like the composable array_min(transform(...))
      // (transform maps null→null, array_min ignores nulls); floorMod
      // matches its pmod — java % is sign-preserving, and a negative
      // input hash would otherwise beat every honest slot value
      if (!arr.isNullAt(i)) {
        val h = java.lang.Math.floorMod(arr.getLong(i), p)
        var j = 0
        while (j < k) {
          val v = java.lang.Math.floorMod(h * as(j) + bs(j), p)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val k = as.length
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${p}L);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  long $h = java.lang.Math.floorMod($a.getLong($i), ${p}L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = java.lang.Math.floorMod($h * $aRef[$j] + $bRef[$j], ${p}L);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign sketch against a fixed set of hyperplanes: bit p of the result is
  * set iff dot(v, planes(p)) > 0. One codegen loop over all planes —
  * replaces NumPlanes separate DotProduct expressions whose generated code
  * (one 64-literal array each) dominates janino compile time. Dot order is
  * left-to-right per plane, bit-identical to the per-plane form.
  */
case class HyperplaneBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  // bit p is 1L << p: a 65th plane would wrap (java shifts are mod 64)
  // and silently OR plane p and p-64 into the same sketch bit
  require(planes.nonEmpty && planes.length <= 64,
    s"planes.length=${planes.length} must be in [1, 64]")
  require(planes.map(_.length).distinct.size == 1,
    "all hyperplanes must share one dimensionality")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bits"
  // nullable even for non-null children: a wrong-dimension vector → null
  override def nullable: Boolean = true

  private val dim = planes.head.length

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    // mismatch → null, like DotProduct: a truncated dot would emit a
    // plausible sketch for a corrupt vector and silently degrade recall
    if (v.numElements() != dim) return null
    var bits = 0L
    var p = 0
    while (p < planeArr.length) {
      val w = planeArr(p)
      var s = 0.0
      var i = 0
      while (i < dim) {
        // null element → null sketch, like DotProduct: reading 0.0 would
        // emit a corrupt-but-plausible sketch and silently degrade recall
        if (v.isNullAt(i)) return null
        s += v.getDouble(i) * w(i)
        i += 1
      }
      if (s > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse planeArr — one conversion, one source of truth for the matrix
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bits = 0L;
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; }
         |  }
         |  if (!${ev.isNull}) {
         |    for (int $p = 0; $p < $planesRef.length; $p++) {
         |      double[] $w = $planesRef[$p];
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) { $s += $a.getDouble($i) * $w[$i]; }
         |      if ($s > 0) $bits |= (1L << $p);
         |    }
         |    ${ev.value} = $bits;
         |  }
         |}
       """.stripMargin
    })
  }

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

  /** Column API for [[ShingleHash56]]. */
  def shingleHash56(tokens: Column, k: Int = 3, distinct: Boolean = true): Column =
    GraftSqlBridge.column(
      ShingleHash56(GraftSqlBridge.expression(tokens), k, distinct))

  /** Column API for [[HyperplaneBits]]. */
  def hyperplaneBits(v: Column, planes: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      HyperplaneBits(GraftSqlBridge.expression(v), planes))

  /** Column API for [[MinHashSig]] (input: array of raw 56-bit hashes). */
  def minhashSig(hashes: Column, params: Seq[(Long, Long)], p: Long): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(hashes),
      params.map(_._1), params.map(_._2), p))
}
