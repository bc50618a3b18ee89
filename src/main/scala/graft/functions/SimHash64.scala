package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array (Charikar 2002), built
  * entirely from SQL-REPLAYABLE arithmetic:
  *
  *   u   = base-131 codepoint polynomial of the token mod 2^61−1
  *         (Mersenne61.polyFold — the shared universe hash)
  *   h_s = (a_s · u + b_s) mod p for TWO seeded universal hashes —
  *         the 64 signature bits are h_1's 61 bits plus h_2's low 3
  *         (classic simhash slices the bits of one hash of the
  *         token; two modmuls per token replace both the old
  *         xxhash64 — which no SQL engine can recompute — and a
  *         naive 64-hash Carter–Wegman variant that costs 32× more)
  *   sig bit j = sign of Σ_tokens (2·bit_j(u) − 1), ties to 0
  *
  * One pass per row, no explode, no aggregation shuffle — a custom
  * Catalyst Expression fused into whole-stage codegen. The DuckDB
  * oracle replays tokens → u → h_1/h_2 → bit counts → the packed
  * signature bit-for-bit from the embedded (a_s, b_s) literals, so
  * dedup_simhash and mm_phash_dedup are hash-verified end to end
  * (the dedup_minhash r10 posture).
  *
  * The interpreted fallback and the generated code share compute();
  * empty/null-only arrays fold to signature 0.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import Mersenne61.{mulMod, polyFold, P}

  val BITS = 64
  val SEED = 6464L

  /** The two (a_s, b_s) literals the oracle embeds: h_1 supplies
    * signature bits 0..60, h_2's low bits supply 61..63. */
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

  private def uhash(s: Int, u: Long): Long = {
    var h = mulMod(seedsA(s), u) + seedsB(s) // < 2p < 2^62
    if (h >= P) h - P else h
  }

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData): Long = {
    val cnt = new Array[Int](BITS)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val u = polyFold(arr.getUTF8String(i).toString)
        val h1 = uhash(0, u)
        val h2 = uhash(1, u)
        var j = 0
        while (j < 61) {
          cnt(j) += (if (((h1 >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        while (j < BITS) {
          cnt(j) += (if (((h2 >>> (j - 61)) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < BITS) {
      if (cnt(j) > 0) r |= (1L << j)
      j += 1
    }
    r
  }
}
