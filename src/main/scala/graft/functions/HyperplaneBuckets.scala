package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-table random-hyperplane LSH bucket keys for an embedding
  * (Charikar 2002 sign-random-projection, multi-table amplification
  * as in Indyk–Motwani 1998): TABLES keys, key t = the `planes` sign
  * bits of the vector against that table's hyperplanes, MSB-first.
  *
  * One codegen'd map pass per row — the signature stage stays inside
  * whole-stage codegen next to the surrounding projections.
  *
  * `planes` is the SCALE KNOB (SQL: `hyperplane_buckets(v, 8)`; the
  * 1-arg form keeps the default 6): the keyspace is 2^planes buckets
  * per (blocking-group, table), and the within-bucket pair stage is
  * quadratic in bucket size, so planes must grow ≈ log2(N / target
  * bucket size) with the corpus — the 10× scale-stress run (SCALE.md
  * r8) measured 21.8× cost at fixed 6-bit keys from saturation
  * alone. `derivePlanes(n)` is that formula as code: the callers
  * count their blocking population once (one cheap aggregate over a
  * narrow column) and key at the derived width, so the keyspace
  * GROWS with the corpus instead of saturating — no manual retune
  * at 10× or 100×.
  *
  * Every width is a PREFIX of one wide seeded table: plane p of
  * table t is row (t·MAXPLANES + p) of a single TABLES×MAXPLANES
  * draw whose first PLANES rows per table reproduce the original
  * width-6 table bit-for-bit (the draw emits the historical
  * TABLES×PLANES sequence first, then extends each table from the
  * continued LCG stream). So the registered width-6 buckets — and
  * every recall measurement pinned against them — are unchanged,
  * the oracle embeds ONE 384-row literal table at any width, and
  * the derived width selects bits, not a different hash family.
  *
  * Cross-engine determinism: plane weights are dyadic rationals
  * k/1024 with k ∈ [−1024, 1024] drawn from `java.util.Random(SEED)`
  * (a specified, platform-stable LCG), so both the weights and every
  * product are exactly representable doubles, and the dot product
  * accumulates left-to-right from 0.0 — the same fold a SQL engine's
  * `list_reduce` performs — making the sign decisions bit-identical
  * in any IEEE-754 engine that replays the same literals and order
  * (DedupOps generates exactly that SQL for the DuckDB oracle).
  *
  * Null elements and missing dims contribute nothing: compute()
  * skips them, and the oracle COALESCEs the term to 0.0 — the only
  * double these paths can disagree on is the sign of zero, which
  * `>= 0` treats identically, so the emitted bit still matches.
  * NaN elements are NOT supported: `NaN >= 0` is false on the JVM
  * but NaN sorts above all doubles in SQL comparison semantics, so
  * the bits would diverge — keep NaNs out of embedding columns.
  */
case class HyperplaneBuckets(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if planes >= 1 && planes <= HyperplaneBuckets.MAXPLANES =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets planes must be in " +
        s"[1, ${HyperplaneBuckets.MAXPLANES}], got $planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = HyperplaneBuckets.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($arr, $planes);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  val TABLES = 24
  val PLANES = 6 // minimum / default width (the registered-width table)
  val MAXPLANES = 16
  val DIMS = 64
  val SEED = 8L

  /** Target expected bucket occupancy the width derivation holds:
    * planes = min p ≥ PLANES with 2^p · TARGET_BUCKET ≥ n (n = the
    * caller's blocking-population size — max label count for
    * label-blocked dedup, total corpus for unblocked ANN/graph
    * builds). Pure integer comparisons, so the DuckDB oracle derives
    * the IDENTICAL width from the same COUNT — no float log2 whose
    * rounding could flip at power-of-two boundaries. */
  val TARGET_BUCKET = 8L

  def derivePlanes(n: Long): Int =
    (PLANES to MAXPLANES)
      .find(p => (1L << p) * TARGET_BUCKET >= n)
      .getOrElse(MAXPLANES)

  /** The SQL twin of [[derivePlanes]] given a scalar COUNT subquery —
    * embedded by every oracle that replays derived-width buckets. */
  def derivePlanesSql(countSubquery: String): String =
    s"""(SELECT COALESCE(MIN(p), $MAXPLANES)
      |  FROM range($PLANES, ${MAXPLANES + 1}) r(p)
      |  WHERE (CAST(1 AS BIGINT) << p) * $TARGET_BUCKET
      |    >= $countSubquery)""".stripMargin

  def apply(child: Expression): HyperplaneBuckets =
    HyperplaneBuckets(child, PLANES)

  /** ONE wide weight table, row (t·MAXPLANES + p), dyadic integers
    * scaled by 1/1024 at use. Layout contract: the first PLANES rows
    * of every table are the ORIGINAL width-6 draw (TABLES×PLANES
    * sequential rows from Random(SEED)), and rows p ≥ PLANES continue
    * the same LCG stream — so the registered width-6 buckets are
    * bit-identical to every prior round, while any width ≤ MAXPLANES
    * is a deterministic prefix the oracle replays from the same
    * 384-row literal table. */
  val wide: Array[Array[Int]] = {
    val rnd = new java.util.Random(SEED)
    val base = Array.fill(TABLES * PLANES)(
      Array.fill(DIMS)(rnd.nextInt(2049) - 1024))
    val ext = Array.fill(TABLES * (MAXPLANES - PLANES))(
      Array.fill(DIMS)(rnd.nextInt(2049) - 1024))
    Array.tabulate(TABLES * MAXPLANES) { i =>
      val t = i / MAXPLANES; val p = i % MAXPLANES
      if (p < PLANES) base(t * PLANES + p)
      else ext(t * (MAXPLANES - PLANES) + (p - PLANES))
    }
  }

  /** Prefix view at a given width, row (t·planes + p) — kept for the
    * specs and oracle generators that address a fixed-width table;
    * `weightsFor(PLANES)` reproduces the original registered table. */
  def weightsFor(planes: Int): Array[Array[Int]] = {
    require(planes >= 1 && planes <= MAXPLANES, s"planes=$planes")
    Array.tabulate(TABLES * planes) { i =>
      wide((i / planes) * MAXPLANES + i % planes)
    }
  }

  /** The default-width table (what the registered queries and their
    * oracle replays use). */
  val weights: Array[Array[Int]] = weightsFor(PLANES)

  /** Called from both the interpreted eval and the generated code.
    * The vector is hoisted into a local double[] ONCE (nulls as 0.0)
    * instead of re-running isNullAt/getFloat accessors per (table,
    * plane) — up to 24×16 = 384 redundant passes per row on the
    * corpus-wide bucketing stage. Bit-identical: a null contributed
    * nothing before and contributes a ±0.0 term now, which can only
    * flip a zero sum's SIGN, and `>= 0` is true for both zeros (the
    * same argument the scaladoc already makes for the oracle's
    * COALESCE-to-0.0 twin). */
  def compute(arr: ArrayData, planes: Int): GenericArrayData = {
    val ws = wide
    val n = math.min(arr.numElements(), DIMS)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (arr.isNullAt(i)) 0.0 else arr.getFloat(i).toDouble
      i += 1
    }
    val keys = new Array[Long](TABLES)
    var t = 0
    while (t < TABLES) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val w = ws(t * MAXPLANES + p)
        var acc = 0.0
        i = 0
        while (i < n) {
          acc += v(i) * (w(i) / 1024.0)
          i += 1
        }
        key = (key << 1) | (if (acc >= 0) 1L else 0L)
        p += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
}
