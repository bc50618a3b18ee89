package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * The driver hash-compares our parquet output against DuckDB. Double
  * aggregation is order-dependent, so every money/measure sum goes
  * through fixed-scale decimal (exact, order-independent) and is cast
  * back to double at the end — both engines then produce bit-identical
  * values. Per-row double arithmetic (same IEEE ops on same inputs) is
  * deterministic and safe.
  */
object Num {
  /** Exact sum: per-row cast to DECIMAL(18,scale), exact decimal sum,
    * result as double. Same shape as CAST(SUM(CAST(x AS DECIMAL)) AS
    * DOUBLE) on the oracle side. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean: exact decimal sum divided by count in double
    * space, rounded. */
  def davg(c: Column, scale: Int = 4, digits: Int = 6): Column =
    round(dsum(c, scale) / count(lit(1)), digits)

  /** Round a per-row double expression for output. */
  def r(c: Column, digits: Int = 6): Column = round(c, digits)

  /** Quantized ln in integer micro-units: round(ln(x), 6)·10⁶ — the
    * ln-quantization contract (ln is the one non-correctly-rounded
    * IEEE op, so it enters exact integer arithmetic through ONE
    * per-value rounding both engines replay identically). */
  def lnqU(x: Column): Column =
    (round(log(x.cast("double")), 6).cast(DecimalType(12, 6)) * 1000000)
      .cast("long")

  /** DuckDB twin of [[lnqU]]. */
  def lnqUSql(x: String): String =
    s"CAST(CAST(ROUND(ln($x), 6) AS DECIMAL(12,6)) * 1000000 AS BIGINT)"
}
