package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a set of shingle hashes, using
  * DOUBLE HASHING over the Mersenne prime p = 2^61 − 1 (the
  * Kirsch–Mitzenmacher "less hashing, same performance" construction
  * standard in MinHash implementations; base family is Carter–Wegman
  * universal, Broder 1997 / MMDS ch.3):
  *
  *   h1(u) = (a1·u + b1) mod p,  h2(u) = (a2·u + b2) mod p
  *   sig[k] = min over elements u of (h1(u) + k·h2(u)) mod p
  *
  * with the two (a, b) pairs drawn once from a seeded
  * java.util.Random and shipped as literals. The family is
  * SQL-REPLAYABLE — `(h1 + k * h2) % 2305843009213693951` with
  * HUGEINT intermediates reproduces every signature bit-for-bit
  * (the DuckDB oracle does exactly that), unlike an xxhash64 chain,
  * which no SQL engine can recompute. Inputs come from shingle_poly3
  * and already live in [0, p); a defensive 61-bit mask keeps foreign
  * inputs in range without changing in-contract values. (The
  * measure-zero h2 = 0 case degrades that one element to a constant
  * row — probability 2^-61 per element, ignored.)
  *
  * All 128 signature rows in ONE pass per row — no explode, no
  * 128-buffer aggregation, no shuffle; per element the work is TWO
  * ~8-op modmuls (Math.multiplyHigh digit fold, see Mersenne61) and
  * 127 conditional adds — the k-loop iterates v += h2 mod p, never
  * re-multiplying.
  */
case class MinHash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash128 requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash128"

  override protected def nullSafeEval(input: Any): Any =
    MinHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = MinHash128.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash128 =
    copy(child = newChild)
}

object MinHash128 {
  import Mersenne61.{mulMod, P}

  val K = 128
  val SEED = 42L

  /** The two (a, b) literal pairs — what the DuckDB oracle embeds.
    * Deterministic from the seeded LCG; the GENERATION never needs
    * SQL replay, only these resulting integers do. */
  val seedsA: Array[Long] = new Array[Long](2)
  val seedsB: Array[Long] = new Array[Long](2)
  locally {
    val rnd = new java.util.Random(SEED)
    var s = 0
    while (s < 2) {
      val (a, b) = Mersenne61.drawPair(rnd) // sequence-identical to r10
      seedsA(s) = a
      seedsB(s) = b
      s += 1
    }
  }

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData): GenericArrayData = {
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        seen = true
        val u = arr.getLong(i) & P
        var h1 = mulMod(seedsA(0), u) + seedsB(0) // < 2p < 2^62
        if (h1 >= P) h1 -= P
        var h2 = mulMod(seedsA(1), u) + seedsB(1)
        if (h2 >= P) h2 -= P
        var v = h1
        var k = 0
        while (k < K) {
          if (v < mins(k)) mins(k) = v
          v += h2
          if (v >= P) v -= P
          k += 1
        }
      }
      i += 1
    }
    // an empty (or all-null) shingle set has NO signature: the old
    // Long.MaxValue sentinel rows — outside [0, p) — all band-collided
    // with each other while the SQL replay (MIN over an empty set =
    // NULL) produced no row at all, a silent cross-engine divergence
    // for any caller that forgot the size(s) > 0 pre-filter. Fail the
    // contract loudly instead.
    if (!seen) throw new IllegalArgumentException(
      "minhash128 of an empty shingle set is undefined — filter " +
        "size(shingles) > 0 before signing")
    new GenericArrayData(mins)
  }
}
