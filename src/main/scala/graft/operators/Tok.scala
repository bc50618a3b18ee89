package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE tokenizer shared by every text-facing suite, paired with
  * its DuckDB twin. The Spark expression and the SQL fragment must
  * stay in lockstep — the driver hash-compares suite outputs against
  * oracles built from `toksSql`, so a drift in either silently breaks
  * cross-engine parity for every consumer. */
object Tok {
  /** Whitespace tokens, empties dropped. */
  def toks: Column = filter(split(col("text"), " "), x => x =!= lit(""))

  val toksSql: String = "list_filter(string_split(text, ' '), x -> x <> '')"
}
