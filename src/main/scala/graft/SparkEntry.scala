package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Suites registered with the driver; each pairs Spark queries with
    * DuckDB oracle SQL (SURVEY.md §2 A–G). */
  private val suites: Seq[Suite] =
    Seq(Relational, CdcOps, EventOps, TextOps, DedupOps, SimilarityOps,
      MultimodalOps, PipelineOps, ScaleOps, FeatureOps, QualityOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.flatMap(_.oracles).toMap
}
