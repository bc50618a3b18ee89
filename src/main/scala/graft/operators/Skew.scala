package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §5).
  *
  * AQE's skew-join handles sort-merge skew it can see at runtime;
  * salting is the explicit tool for the cases it can't — a
  * fact⋈dimension join where one key holds a double-digit share of
  * the fact table, or a pre-planned repartition whose hot key would
  * pin one task at 100 TB.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side's hot keys
    * spread over `salts` sub-partitions: every fact row gets a salt
    * in [0, salts), the dimension side replicates `salts`× (it's the
    * SMALL side — replication cost is salts·|dim|), and the join runs
    * on (key, salt), so one hot key occupies `salts` tasks instead of
    * one.
    *
    * The output multiset is identical to `fact.join(dim, key)` for
    * ANY salt assignment — the salt only spreads rows, it never
    * changes which fact row meets which dim row. The assignment
    * hashes the row content PLUS a per-partition row counter:
    * content alone would send byte-identical duplicate rows (common
    * in event logs — same key, same payload) to one salt and leave
    * the hot key pinned to one task. The counter component makes the
    * salt deterministic for a fixed input partitioning rather than
    * content-stable; correctness never depends on it. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = pmod(
      xxhash64(struct(fact.columns.map(col).toSeq: _*),
        monotonically_increasing_id()),
      lit(salts.toLong))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val repDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
