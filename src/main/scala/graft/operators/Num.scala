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
}
