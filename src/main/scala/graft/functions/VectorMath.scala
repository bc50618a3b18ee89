package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic vector arithmetic over array<float>
  * embedding columns.
  *
  * Elements are quantized once to DECIMAL(12,8); pairwise products
  * are then exact at scale 16 and their sum is order-independent, so
  * Spark and the DuckDB oracle produce bit-identical dot products.
  * Only the final sqrt/divide happen in double — single IEEE ops,
  * identical everywhere. The DECIMAL(30,16) accumulator stays under
  * Spark's 38-precision cap (at the cap, decimal + silently drops a
  * scale digit) and the merge cast is precision-only (no rounding).
  */
object VectorMath {
  def dec(c: Column): Column = c.cast("double").cast(DecimalType(12, 8))

  /** Exact decimal dot product, returned as double — the codegen'd
    * dec_quant/dec_dot expressions (see graft.functions.DecDot);
    * bit-identical to [[dotDecHof]], which is kept as the reference
    * implementation the parity spec checks against. */
  def dotDec(a: Column, b: Column): Column =
    call_function("dec_dot",
      call_function("dec_quant", a), call_function("dec_quant", b))

  /** The original interpreted higher-order-function formulation —
    * the semantic definition dec_dot must match bit-for-bit. */
  def dotDecHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => dec(x) * dec(y)),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(30, 16)),
      (acc, v) => (acc + v).cast(DecimalType(30, 16))).cast("double")

  /** cosine(a, b) given precomputed squared norms (as doubles). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotDec(a, b) / (sqrt(normA) * sqrt(normB))

  /** Quantize ONCE per vector (array<long> of unscaled DECIMAL(12,8))
    * before a pairwise join: dec_quant costs 64 BigDecimal roundings
    * per call, so running it inside an N×Q pair expression repeats
    * that work per PAIR. Pre-quantizing on the scan side leaves only
    * dec_dot's 64 long multiplies in the pair loop — same bits, since
    * dotDec is exactly dec_dot∘(dec_quant × dec_quant). */
  def quantized(c: Column): Column = call_function("dec_quant", c)

  /** Exact dot over two pre-[[quantized]] vectors. */
  def dotQ(a: Column, b: Column): Column = call_function("dec_dot", a, b)

  /** cosine over pre-[[quantized]] vectors + precomputed sq norms. */
  def cosineQ(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotQ(a, b) / (sqrt(normA) * sqrt(normB))
}
