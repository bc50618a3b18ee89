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
  * alone. Weights for any planes count draw from the SAME seeded LCG
  * (weightsFor), so every width is deterministic and oracle-
  * replayable; `weightsFor(PLANES)` reproduces the original table.
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

  def this(child: Expression) = this(child, HyperplaneBuckets.PLANES)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets planes must be in [1, 62], got $planes")
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
  val PLANES = 6
  val DIMS = 64
  val SEED = 8L

  def apply(child: Expression): HyperplaneBuckets =
    HyperplaneBuckets(child, PLANES)

  /** Integer plane weights for a given key width, row (t·planes + p),
    * scaled by 1/1024 at use. Every width draws its own table from
    * the seeded LCG in one sequential pass, so any (planes) config is
    * deterministic and the oracle can embed the same integers as
    * literals; memoized — the draw runs once per width per JVM. */
  private val weightCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Int]]]

  def weightsFor(planes: Int): Array[Array[Int]] =
    weightCache.getOrElseUpdate(planes, {
      val rnd = new java.util.Random(SEED)
      Array.fill(TABLES * planes)(Array.fill(DIMS)(rnd.nextInt(2049) - 1024))
    })

  /** The default-width table (what the registered queries and their
    * oracle replays use). */
  val weights: Array[Array[Int]] = weightsFor(PLANES)

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData, planes: Int): GenericArrayData = {
    val ws = weightsFor(planes)
    val n = math.min(arr.numElements(), DIMS)
    val keys = new Array[Long](TABLES)
    var t = 0
    while (t < TABLES) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val w = ws(t * planes + p)
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) acc += arr.getFloat(i).toDouble * (w(i) / 1024.0)
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
