package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (when SQL-expressible)
  * a DuckDB oracle twin the driver hash-compares against. */
case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Suite {
  def ops: Seq[Op]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(o => o.name -> o.fn).toMap
  final def oracles: Map[String, String] =
    ops.flatMap(o => o.oracle.map(o.name -> _)).toMap
}
