package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** k-means assignment kernel: nearest centroid for one vector against
  * a (small, broadcast) centroid array, in one native pass.
  *
  *   km_assign(array<long>, array<struct<cluster,n,s_arr:array<long>>>)
  *     → struct<cluster: long, dist_sq: double>
  *
  * Inputs are unscaled DECIMAL(_,8) longs (dec_quant's output and
  * exact integer sums of it), so the distance-to-mean of centroid
  * (s, n) is computed division-free: for each dimension,
  * x = n·d − s (exact in long: |n·d| ≤ 2^11·10^12 ≪ 2^63), then
  * EXACTLY the relational formulation the DuckDB oracle replays —
  * x → double (correctly rounded: |x| < 2^53 makes (double)x exact
  * and /1e8 the single rounding), squared in double, HALF_UP-rounded
  * to scale 6 (Spark's Cast(double → DECIMAL(24,6))), summed as
  * unscaled scale-6 longs (exact: 64 terms ≪ 2^63), and finally
  * sum → double / n². Strict < keeps the lowest cluster id on ties,
  * matching ORDER BY dist_sq, cluster.
  *
  * Replaces an interpreted nested-HOF fold (transform × zip_with ×
  * aggregate over BigDecimals) that was ~10× slower and dominated
  * sim_kmeans' runtime; semantics are bit-identical, so the oracle
  * is untouched.
  */
case class KmAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  private val centroidType = ArrayType(StructType(Seq(
    StructField("cluster", LongType), StructField("n", LongType),
    StructField("s_arr", ArrayType(LongType, containsNull = false)))))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(StructType(fs), _))
        if fs.length == 3 && fs(0).dataType == LongType &&
          fs(1).dataType == LongType &&
          fs(2).dataType.isInstanceOf[ArrayType] &&
          fs(2).dataType.asInstanceOf[ArrayType].elementType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"km_assign requires (array<bigint>, ${centroidType.catalogString})," +
          s" got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist_sq", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "km_assign"

  override protected def nullSafeEval(dv: Any, cs: Any): Any =
    KmAssign.best(dv.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dv, cs) => {
      val cls = KmAssign.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.best($dv, $cs);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmAssign =
    copy(left = newLeft, right = newRight)
}

object KmAssign {
  private[functions] val Exact53 = 1L << 53

  /** Σ_i round6(((n·d_i − s_i)/1e8)²) as an unscaled scale-6 long —
    * the exact integer the relational DECIMAL(24,6) sum carries. */
  private def distNum6(dv: ArrayData, n: Long, s: ArrayData): Long = {
    val dims = dv.numElements()
    var acc = 0L
    var i = 0
    while (i < dims) {
      // null slots fail LOUDLY (DecDot's rationale: reading one as 0
      // fabricates a coordinate and silently picks a wrong cluster),
      // and n·d − s goes through the Exact intrinsics — past the
      // documented ~9e6-member contract bound a giant cluster throws
      // instead of wrapping into a garbage distance
      if (dv.isNullAt(i) || s.isNullAt(i))
        throw new IllegalArgumentException(
          s"km_assign: null element at dimension $i")
      val x = Math.subtractExact(
        Math.multiplyExact(n, dv.getLong(i)), s.getLong(i))
      // decimal(·,8) → double must be ONE rounding: below 2^53 the
      // long→double step is exact and /1e8 rounds once; above (giant
      // clusters) fall back to the arbitrary-precision conversion
      val xd =
        if (x <= KmAssign.Exact53 && x >= -KmAssign.Exact53) x.toDouble / 1e8
        else new java.math.BigDecimal(java.math.BigInteger.valueOf(x), 8)
          .doubleValue()
      val sq = xd * xd
      // Spark's Cast(double → DECIMAL(24,6)): decimal expansion of the
      // double, HALF_UP at scale 6
      acc += java.math.BigDecimal.valueOf(sq)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue.longValueExact()
      i += 1
    }
    acc
  }

  def best(dv: ArrayData, cs: ArrayData): InternalRow = {
    val k = cs.numElements()
    if (k == 0) return null
    var bestCluster = 0L
    var bestDist = Double.MaxValue
    var first = true
    var j = 0
    while (j < k) {
      if (cs.isNullAt(j))
        throw new IllegalArgumentException(
          s"km_assign: null centroid struct at index $j")
      val c = cs.getStruct(j, 3)
      val cluster = c.getLong(0)
      val n = c.getLong(1)
      val sArr = c.getArray(2)
      if (sArr.numElements() != dv.numElements())
        throw new IllegalArgumentException(
          s"km_assign: dim mismatch ${sArr.numElements()} vs ${dv.numElements()}")
      // sum → double is exact-to-correctly-rounded (< 2^53), /n² the
      // same single division the oracle performs
      // n·n in DOUBLE: a >3e9-member centroid would wrap the long
      // square silently (the quotient itself is fine in double)
      val dist =
        (distNum6(dv, n, sArr).toDouble / 1e6) / (n.toDouble * n.toDouble)
      if (first || dist < bestDist) { bestCluster = cluster; bestDist = dist }
      first = false
      j += 1
    }
    InternalRow(bestCluster, bestDist)
  }
}
