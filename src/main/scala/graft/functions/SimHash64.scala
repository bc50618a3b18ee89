package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array (Charikar 2002), built
  * entirely from SQL-REPLAYABLE arithmetic:
  *
  *   u       = base-131 codepoint polynomial of the token mod 2^61−1
  *             (Mersenne61.polyFold — the shared universe hash)
  *   bit_j   = ((a_j · u + b_j) mod p) mod 2   (64 Carter–Wegman
  *             pairwise-independent bits from seeded literals)
  *   sig bit j = sign of Σ_tokens (2·bit_j − 1), ties to 0
  *
  * One pass per row, no explode, no aggregation shuffle — a custom
  * Catalyst Expression fused into whole-stage codegen. Previously the
  * per-token bits came from xxhash64, which no SQL engine can
  * recompute, making every simhash consumer rows-only; with this
  * family the DuckDB oracle replays tokens → u → bits → counts → the
  * packed signature bit-for-bit from the embedded (a_j, b_j)
  * literals, so dedup_simhash and mm_phash_dedup are hash-verified
  * end to end (the dedup_minhash r10 posture).
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

  /** The (a_j, b_j) literals the oracle embeds. */
  val seedsA: Array[Long] = new Array[Long](BITS)
  val seedsB: Array[Long] = new Array[Long](BITS)
  locally {
    val rnd = new java.util.Random(SEED)
    var j = 0
    while (j < BITS) {
      seedsA(j) = ((rnd.nextLong() & Long.MaxValue) % (P - 1)) + 1
      seedsB(j) = (rnd.nextLong() & Long.MaxValue) % P
      j += 1
    }
  }

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData): Long = {
    val cnt = new Array[Int](BITS)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val u = polyFold(arr.getUTF8String(i).toString)
        var j = 0
        while (j < BITS) {
          var h = mulMod(seedsA(j), u) + seedsB(j) // < 2p < 2^62
          if (h >= P) h -= P
          cnt(j) += (if ((h & 1L) == 1L) 1 else -1)
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
