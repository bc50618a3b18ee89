package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Exact decimal dot product, split into its two natural stages so
  * the per-VECTOR work happens once instead of once per pair:
  *
  *   dec_quant(array<float>) → array<long>   unscaled DECIMAL(12,8)
  *   dec_dot(array<long>, array<long>) → double
  *
  * Bit-identical to the relational formulation
  * `aggregate(zip_with(a,b,(x,y)=>dec(x)*dec(y)), 0, (acc,v)=>acc+v)
  * .cast("double")` (VectorMath's original HOF form, which runs
  * INTERPRETED — higher-order functions don't whole-stage-codegen —
  * and re-quantizes both sides for every pair):
  *  - quantization replays Spark's Cast(double→DecimalType(12,8)):
  *    `BigDecimal.valueOf(d).setScale(8, HALF_UP)` — NaN/Infinity
  *    null the dot and precision overflow THROWS, matching the
  *    session's ANSI cast and the oracle's erroring CAST (see
  *    quant());
  *  - scale-16 products and their sum are computed exactly in 128
  *    bits (64 terms of ≤2^80 fit comfortably in 2^127);
  *  - the result is `new BigDecimal(sum, 16).doubleValue()` — the
  *    correctly-rounded conversion `Decimal.toDouble` performs.
  * Null propagation matches too: a null element, length mismatch, or
  * quantization overflow nulls the whole dot, exactly as the null
  * product nulls the HOF aggregate.
  *
  * Magnitude CONTRACT (not checked at runtime — this is the hot
  * per-pair kernel): inputs are dec_quant-scale longs (|unscaled| ≤
  * 2×10^12, products ≤ ~2^82, 64 terms ≪ 2^127). Hand-fed arrays of
  * ~2^61-scale longs would overflow the 128-bit accumulator
  * SILENTLY; keep out-of-scale data out of dec_dot.
  */
case class DecQuant(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dec_quant requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dec_quant"

  override protected def nullSafeEval(input: Any): Any =
    DecDot.quant(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = DecDot.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.quant($arr);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DecQuant =
    copy(child = newChild)
}

case class DecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dec_dot requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = DecDot.getClass.getName.stripSuffix("$")
      val boxed = ctx.freshName("boxed")
      s"""
         |Double $boxed = $cls.dot($a, $b);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecDotProduct =
    copy(left = newLeft, right = newRight)
}

object DecDot {
  private val SCALE = 8
  private val PRECISION = 12
  private val MAX_UNSCALED = 999999999999L // 12 nines

  /** Spark's Cast(double → DECIMAL(12,8)) per element, replayed with
    * the session's ANSI semantics (Engine never disables ANSI, and
    * Spark 4 defaults it ON — verified empirically against the HOF):
    *  - null or NaN/Infinity element → null array (the HOF's cast
    *    yields a null element, whose product nulls the whole dot);
    *  - precision overflow (|x| ≥ 1e4) → ArithmeticException, as the
    *    ANSI cast throws and the DuckDB oracle's CAST errors — a
    *    silent null here would DIVERGE from both. */
  def quant(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = arr.getFloat(i).toDouble
      if (d.isNaN || d.isInfinite) return null
      val bd = java.math.BigDecimal.valueOf(d)
        .setScale(SCALE, java.math.RoundingMode.HALF_UP)
      val u = bd.unscaledValue.longValueExact()
      if (u > MAX_UNSCALED || u < -MAX_UNSCALED)
        throw new ArithmeticException(
          s"dec_quant: $d out of range for DECIMAL($PRECISION,$SCALE) " +
            "(ANSI cast overflow)")
      out(i) = u
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact Σ a_i·b_i over unscaled scale-8 longs, accumulated in
    * signed 128 bits; result = BigDecimal(sum, 16).doubleValue —
    * Decimal.toDouble's correctly-rounded conversion. Null on length
    * mismatch (zip_with pads with null → null aggregate). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      // dec_dot is a session-registered SQL function: a caller can
      // hand it arrays with null slots directly (dec_quant never
      // does) — reading one as 0 would fabricate a value
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getLong(i)
      val y = b.getLong(i)
      val pHi = Math.multiplyHigh(x, y)
      val pLo = x * y
      val newLo = lo + pLo
      // unsigned carry out of the low word
      val carry = ((lo & pLo) | ((lo | pLo) & ~newLo)) >>> 63
      hi = hi + pHi + carry
      lo = newLo
      i += 1
    }
    val sum = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    new java.math.BigDecimal(sum, 16).doubleValue()
  }
}
