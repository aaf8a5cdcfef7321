package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, NullType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Custom Catalyst expressions for the semantics Spark's built-ins
  * cannot express (SURVEY §4 "custom Catalyst work actually needed"):
  *
  *  - `canonical_json(s)` — top-level key-sorted compact serialization,
  *    the reference's id canonicalization contract
  *    (app/utils/JsonUtils.kt:7-14). Spark's `to_json` does not sort
  *    keys, so this is a genuine gap.
  *  - `graft_aes_ctr_decrypt(key, iv, ct)` — AES-CTR + Base64 decrypt
  *    (app/services/impl/AESCipherService.kt:38-44). The built-in
  *    `aes_decrypt` covers GCM/CBC/ECB, not the CTR+Base64 composition
  *    the reference's envelope uses.
  *
  * Both implement `doGenCode` as a static call into [[ExprRuntime]], so
  * they participate in whole-stage codegen (no UDF boxing, no
  * serialization of closures) — the preferred physical form for
  * hot-path scalar functions.
  */
case class CanonicalJson(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_json"

  protected override def nullSafeEval(input: Any): Any =
    ExprRuntime.canonicalJson(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ExprRuntime.canonicalJson($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): CanonicalJson =
    copy(child = newChild)
}

case class AesCtrDecrypt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == StringType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, got ${children.map(_.dataType)}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_aes_ctr_decrypt"

  protected override def nullSafeEval(key: Any, iv: Any, ct: Any): Any =
    ExprRuntime.aesCtrDecrypt(
      key.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      iv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      ct.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, i, c) => s"""
      ${ev.value} = graft.expressions.ExprRuntime.aesCtrDecrypt($k, $i, $c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AesCtrDecrypt =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Float-vector dot product in double, left-to-right — the similarity
  * search hot kernel. The interpreted `aggregate(zip_with(...))` form
  * boxes every element through lambda closures; this expression is a
  * tight primitive loop in BOTH eval and generated code (whole-stage
  * codegen), bitwise-identical to the HOF form and the DuckDB oracle
  * twin. ~10-100x on quadratic similarity joins. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == ArrayType(FloatType) ||
        c.dataType == ArrayType(FloatType, containsNull = false) ||
        c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> arguments, got ${children.map(_.dataType)}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ExprRuntime.vecDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      // Ragged pair -> NULL, matching zip_with's null-padding semantics
      // (and the interpreted path) instead of an out-of-bounds read.
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $sum;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Decimal-quantized squared L2 — `graft_l2sq_q6(x, c)` with `x` an
  * `array<float>` row vector and `c` an `array<double>` (typically a
  * folded centroid literal). One primitive loop accumulating exact
  * 6-dp micro-units ([[ExprRuntime.l2sqQ6]]) — value-identical to the
  * `aggregate(zip_with(...))` decimal fold and to a grouped
  * `SUM(CAST(... AS DECIMAL(25,6)))` under ANY order (exact decimal
  * addition is associative), but codegen-participating instead of a
  * CodegenFallback HOF chain; the k-means assignment's hot kernel. */
case class L2SquaredQuantized(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType, _) | NullType => true
      case _ => false
    }
    val rightOk = right.dataType match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<double>), got " +
        s"${children.map(_.dataType)}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq_q6"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ExprRuntime.l2sqQ6(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
        java.lang.Double $res = graft.expressions.ExprRuntime.l2sqQ6($a, $b);
        if ($res == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $res.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SquaredQuantized =
    copy(left = newLeft, right = newRight)
}

/** SimHash over a hashed-shingle array — `graft_simhash(sh, bits)`.
  * The per-bit majority vote needs `bits` passes over the array when
  * expressed with `aggregate()` HOFs (which are CodegenFallback
  * anyway); this expression is ONE primitive pass in both eval and
  * generated code. `bits` must be a foldable int in [1, 63]; empty
  * arrays yield the -1 no-signal sentinel. */
case class Simhash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == ArrayType(LongType) ||
        left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == NullType) && right.foldable &&
        right.dataType == IntegerType) {
      // bits outside [1, 63] would crash at execution time (negative
      // array size) or collide with the -1 empty-set sentinel (bit 63
      // / zero width) — reject at ANALYSIS time while the foldable
      // value is in hand
      val bits = right.eval()
      if (bits != null && {
        val b = bits.asInstanceOf[Int]; b >= 1 && b <= 63
      }) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits must be in [1, 63], got $bits")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, foldable int), got " +
        s"${children.map(_.dataType)}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  protected override def nullSafeEval(sh: Any, bits: Any): Any =
    ExprRuntime.simhash(
      sh.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bits.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, bits) => s"""
      ${ev.value} = graft.expressions.ExprRuntime.simhash($sh, $bits);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Simhash =
    copy(left = newLeft, right = newRight)
}

/** All-k MinHash signature in one pass —
  * `graft_minhash(sh, aCoeffs, bCoeffs)` → array<bigint>. The HOF form
  * (`array_min(transform(sh, ...))` per k) costs k interpreted passes
  * over the shingle array per row; this is one primitive loop. The
  * coefficient arrays must be foldable (they constant-fold to literal
  * ArrayData, evaluated once per batch by codegen's nullSafeCodeGen).
  * Empty shingle sets yield NULL, matching `array_min(empty)`. */
case class MinhashSignature(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType): Boolean =
      t == ArrayType(LongType) || t == ArrayType(LongType, containsNull = false)
    if (isLongArray(first.dataType) && second.foldable && third.foldable &&
        isLongArray(second.dataType) && isLongArray(third.dataType)) {
      // both coefficient arrays are foldable, so a length mismatch is
      // knowable NOW — reject at analysis instead of letting the
      // kernel index b with a's length at execution time
      val (a, b) = (second.eval(), third.eval())
      val lens = Seq(a, b).map {
        case d: org.apache.spark.sql.catalyst.util.ArrayData => d.numElements()
        case _ => -1
      }
      if (lens(0) >= 0 && lens(1) >= 0 && lens(0) != lens(1))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName coefficient arrays must have equal length, " +
            s"got ${lens(0)} and ${lens(1)}")
      else TypeCheckResult.TypeCheckSuccess
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, foldable array<bigint> x2), " +
        s"got ${children.map(_.dataType)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(sh: Any, a: Any, b: Any): Any =
    ExprRuntime.minhash(
      sh.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, a, b) => s"""
      ${ev.value} = graft.expressions.ExprRuntime.minhash($sh, $a, $b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashSignature =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** All SRP-LSH band keys in one pass —
  * `graft_srp_bands(emb, negIdx, dim, bitsPerBand)` → array<int>.
  * `negIdx` is the foldable per-plane negative-index nested array
  * (1-based), `dim` the expected embedding length, `bitsPerBand` the
  * band grouping; `len(negIdx) / bitsPerBand` bands come back. The
  * rendered-SQL form costs ~(planes × dims) expression nodes PER BAND
  * and every LSH band self-join duplicates the tree — plan analysis +
  * codegen, not execution, dominated q55. Null or `len != dim`
  * embeddings yield NULL (NULL bands never equi-join — the LshBands
  * degenerate-row rule; the DuckDB twin renders the same guard). */
case class SrpBandKeys(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean =
      t == ArrayType(FloatType) || t == ArrayType(FloatType, containsNull = false)
    def isNestedIntArray(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(IntegerType, _), _) => true
      case _ => false
    }
    if ((isFloatArray(first.dataType) || first.dataType == NullType) &&
        second.foldable && isNestedIntArray(second.dataType) &&
        third.foldable && third.dataType == IntegerType &&
        fourth.foldable && fourth.dataType == IntegerType) {
      // the plane table and sizes are foldable — validate NOW so a bad
      // config is an analysis error, not a per-row OOB at execution
      val (negV, dimV, bitsV) = (second.eval(), third.eval(), fourth.eval())
      (negV, dimV, bitsV) match {
        case (neg: org.apache.spark.sql.catalyst.util.ArrayData,
            dim: java.lang.Integer, bits: java.lang.Integer) =>
          val planes = neg.numElements()
          if (bits < 1 || bits > 31)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName bitsPerBand must be in [1, 31], got $bits")
          else if (planes == 0 || planes % bits != 0)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName needs planes (${planes}) to be a positive " +
                s"multiple of bitsPerBand ($bits)")
          else {
            val oob = (0 until planes).exists { p =>
              val a = neg.getArray(p)
              (0 until a.numElements()).exists { k =>
                val i = a.getInt(k); i < 1 || i > dim
              }
            }
            if (oob) TypeCheckResult.TypeCheckFailure(
              s"$prettyName negIdx entries must be 1-based dims within $dimV")
            else TypeCheckResult.TypeCheckSuccess
          }
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName negIdx/dim/bitsPerBand must not be null")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, foldable array<array<int>>, " +
        s"foldable int, foldable int), got ${children.map(_.dataType)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bands"

  protected override def nullSafeEval(emb: Any, neg: Any, dim: Any,
      bits: Any): Any =
    ExprRuntime.srpBands(
      emb.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      neg.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      dim.asInstanceOf[Int], bits.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, neg, dim, bits) => s"""
      ${ev.value} = graft.expressions.ExprRuntime.srpBands($emb, $neg, $dim, $bits);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SrpBandKeys =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Function registration: imperative (works on any live session, used
  * by the pipeline defensively) and declarative (SparkSessionExtensions
  * for `spark.sql.extensions` configs). */
object GraftFunctions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJson].getName, "canonical_json"),
      (args: Seq[Expression]) => CanonicalJson(args.head)),
    (FunctionIdentifier("graft_aes_ctr_decrypt"),
      new ExpressionInfo(classOf[AesCtrDecrypt].getName, "graft_aes_ctr_decrypt"),
      (args: Seq[Expression]) => AesCtrDecrypt(args(0), args(1), args(2))),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
      (args: Seq[Expression]) => Simhash(args(0), args(1))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinhashSignature(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_srp_bands"),
      new ExpressionInfo(classOf[SrpBandKeys].getName, "graft_srp_bands"),
      (args: Seq[Expression]) => SrpBandKeys(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("graft_l2sq_q6"),
      new ExpressionInfo(classOf[L2SquaredQuantized].getName, "graft_l2sq_q6"),
      (args: Seq[Expression]) => L2SquaredQuantized(args(0), args(1))))

  /** Idempotent runtime registration into a session's registry. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJson].getName, "canonical_json"),
      (args: Seq[Expression]) => CanonicalJson(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_aes_ctr_decrypt"),
      new ExpressionInfo(classOf[AesCtrDecrypt].getName, "graft_aes_ctr_decrypt"),
      (args: Seq[Expression]) => AesCtrDecrypt(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
      (args: Seq[Expression]) => Simhash(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinhashSignature(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("graft_srp_bands"),
      new ExpressionInfo(classOf[SrpBandKeys].getName, "graft_srp_bands"),
      (args: Seq[Expression]) => SrpBandKeys(args(0), args(1), args(2), args(3))))
    ext.injectFunction((FunctionIdentifier("graft_l2sq_q6"),
      new ExpressionInfo(classOf[L2SquaredQuantized].getName, "graft_l2sq_q6"),
      (args: Seq[Expression]) => L2SquaredQuantized(args(0), args(1))))
  }
}
