package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet star schema.
  *
  * The reference ingests rows from PostgreSQL logical replication
  * (/root/reference/src/pipeline_manager.rs); here the equivalent
  * "source" abstraction is a columnar scan that Catalyst can push
  * filters/projections into. At 100 TB these would be partitioned
  * parquet/iceberg paths — the API stays the same.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts normalizes to TimestampType regardless of the file's
    * physical encoding — the generator has shipped both layouts:
    *  - TIMESTAMP(NANOS): Spark reads it as long under Engine's
    *    nanosAsLong; convert ns→µs with integer division (`div` — a
    *    double division would lose precision at 1.7e18).
    *  - TIMESTAMP(MICROS) (isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ; with the session pinned to UTC the cast to
    *    TimestampType preserves the wall clock, matching DuckDB's
    *    naive µs TIMESTAMP view of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
