package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality gates (SURVEY §A) — the constraint audit an ETL
  * engine runs between ingest and merge: null keys, duplicate
  * primary keys, referential orphans, domain violations, each as a
  * (check, n_checked, n_violations, ok) report row. The reference
  * trusts PostgreSQL to enforce these upstream; a file-fed lakehouse
  * has no such enforcement, so the engine must audit them itself
  * before a bad batch poisons the merge (the same
  * fail-before-the-sink posture as the circuit breaker).
  *
  * Scale: ALL single-table checks for a table fuse into ONE
  * aggregate pass (conditional counts — adding a check adds zero
  * scans), the duplicate-PK check is the same pass's count-distinct,
  * and the referential check is one left-anti join on the join key
  * the tables already shuffle on. The report itself is a handful of
  * rows stacked map-side.
  */
object QualityOps extends Suite {

  private def cnt(pred: Column): Column = count(when(pred, lit(1)))

  private def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)

    // one conditional-count pass per table: every per-row check rides
    // the same scan
    val oAgg = o.agg(
      count(lit(1)).as("n"),
      cnt(col("o_custkey").isNull).as("null_custkey"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
      cnt(col("o_totalprice") <= 0).as("nonpos_total"))
    val lAgg = l.agg(
      count(lit(1)).as("n"),
      cnt(col("l_quantity") <= 0).as("nonpos_qty"),
      cnt(col("l_discount") < 0 || col("l_discount") > 1).as("bad_discount"))
    // referential integrity: lineitem rows whose order doesn't exist.
    // One left join gives total and orphan count in the same pass (a
    // duplicated o_orderkey would inflate n — the dup_orderkey check
    // in this same report is the guard for that)
    val orphan = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        cnt(col("o_orderkey").isNull).as("orphans"))

    // stack the three tiny frames into report rows map-side
    def stack(src: DataFrame, rows: (String, Column, Column)*): DataFrame =
      src.select(explode(array(rows.map { case (name, checked, viol) =>
        struct(lit(name).as("check"), checked.cast("long").as("n_checked"),
          viol.cast("long").as("n_violations"))
      }: _*)).as("r")).select("r.*")

    stack(oAgg,
        ("orders_null_custkey", col("n"), col("null_custkey")),
        ("orders_dup_orderkey", col("n"), col("dup_orderkey")),
        ("orders_nonpositive_total", col("n"), col("nonpos_total")))
      .unionAll(stack(lAgg,
        ("lineitem_nonpositive_qty", col("n"), col("nonpos_qty")),
        ("lineitem_discount_range", col("n"), col("bad_discount"))))
      .unionAll(stack(orphan,
        ("lineitem_orphan_orderkey", col("n"), col("orphans"))))
      .withColumn("ok", (col("n_violations") === 0).cast("int"))
      .orderBy("check")
  }

  private val dqChecksSql =
    """WITH o AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
      |    COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpos_total
      |  FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS nonpos_qty,
      |    COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
      |      AS bad_discount
      |  FROM lineitem),
      |orph AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS orphans
      |  FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey),
      |r AS (
      |  SELECT 'orders_null_custkey' AS "check", n AS n_checked,
      |    null_custkey AS n_violations FROM o
      |  UNION ALL SELECT 'orders_dup_orderkey', n, dup_orderkey FROM o
      |  UNION ALL SELECT 'orders_nonpositive_total', n, nonpos_total FROM o
      |  UNION ALL SELECT 'lineitem_nonpositive_qty', n, nonpos_qty FROM l
      |  UNION ALL SELECT 'lineitem_discount_range', n, bad_discount FROM l
      |  UNION ALL SELECT 'lineitem_orphan_orderkey', n, orphans FROM orph)
      |SELECT "check", CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_violations AS BIGINT) AS n_violations,
      |  CAST(n_violations = 0 AS INT) AS ok
      |FROM r ORDER BY "check"""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("dq_checks", dqChecks, Some(dqChecksSql)),
  )
}
