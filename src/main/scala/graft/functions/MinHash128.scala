package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a set of shingle hashes, using the
  * classic UNIVERSAL hash family over the Mersenne prime p = 2^61 − 1
  * (Carter–Wegman; the standard MinHash construction in Broder 1997 /
  * MMDS ch.3):
  *
  *   sig[k] = min over elements u of (a_k · u + b_k) mod p
  *
  * with (a_k, b_k) drawn once from a seeded java.util.Random
  * (a_k ∈ [1, p−1], b_k ∈ [0, p−1]) and shipped as literals. The
  * family is SQL-REPLAYABLE — `(a * u + b) % 2305843009213693951`
  * in any engine with 128-bit integer intermediates reproduces every
  * signature bit-for-bit (the DuckDB oracle does exactly that with
  * the same 128 (a, b) literals), unlike the previous xxhash64 chain,
  * which no SQL engine can recompute. Inputs come from shingle_poly3
  * and already live in [0, p); a defensive 61-bit mask keeps foreign
  * inputs in range without changing in-contract values.
  *
  * All 128 signature rows in ONE pass per row — no explode, no
  * 128-buffer aggregation, no shuffle; the modmul is ~8 long ops via
  * Math.multiplyHigh (see Mersenne61).
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

  /** The (a_k, b_k) literals — what the DuckDB oracle embeds as its
    * seeds VALUES table. Deterministic from the seeded LCG; the
    * GENERATION never needs SQL replay, only these resulting
    * integers do. */
  val seedsA: Array[Long] = new Array[Long](K)
  val seedsB: Array[Long] = new Array[Long](K)
  locally {
    val rnd = new java.util.Random(SEED)
    var k = 0
    while (k < K) {
      seedsA(k) = ((rnd.nextLong() & Long.MaxValue) % (P - 1)) + 1
      seedsB(k) = (rnd.nextLong() & Long.MaxValue) % P
      k += 1
    }
  }

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData): GenericArrayData = {
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val u = arr.getLong(i) & P
        var k = 0
        while (k < K) {
          var v = mulMod(seedsA(k), u) + seedsB(k) // < 2p < 2^62
          if (v >= P) v -= P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
