package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import Num._

/** Relational / analytic core — the bench backbone.
  *
  * TPC-H-style declarative plans: filters and projections stay
  * pushdown-able, dimension sides are broadcast, aggregations use
  * map-side partial agg (all algebraic), money math is decimal-exact
  * (order-independent → cross-engine deterministic).
  */
object Relational extends Suite {

  /** Exact revenue term: decimal-first arithmetic. Casting the INPUTS
    * to decimal and multiplying in decimal space is exact (no
    * per-engine double-rounding), so the aggregated sums are
    * bit-identical across Spark and the DuckDB oracle. The SQL twins
    * use the identical CAST structure. */
  private[operators] def rev(
      price: String = "l_extendedprice", disc: String = "l_discount") =
    col(price).cast(DecimalType(12, 2)) *
      (lit(1.0) - col(disc)).cast(DecimalType(4, 2))

  private[operators] val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))"

  // ---- q1: pricing summary (TPC-H Q1 shape) -------------------------
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(rev()).cast("double").as("sum_disc_price"),
        sum(rev() * (lit(1.0) + col("l_tax")).cast(DecimalType(4, 2)))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 6))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM($revSql * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q3: shipping priority (3-way join + top-k) -------------------
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer (filtered, dim-sized) broadcasts; lineitem⋈orders is a
    // fact-fact shuffle join — AQE coalesces/skew-splits at runtime.
    li.join(ord.join(broadcast(cust),
        col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(rev()).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  private val q3Sql =
    s"""SELECT l_orderkey,
      |  CAST(SUM($revSql) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // ---- q5: local supplier volume (6-table join) ---------------------
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // orders and customer are fact-sized: shuffle joins (AQE handles
    // coalesce/skew). Only true dims (supplier/nation/region) broadcast.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(rev()).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  private val q5Sql =
    s"""SELECT n_name,
      |  CAST(SUM($revSql) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---- q6: revenue change (selective filter + agg) ------------------
  private def q6(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        col("l_discount").cast(DecimalType(4, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q6Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---- q_top_suppliers: revenue rank (TPC-H Q15 shape) --------------
  private def qTopSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(rev()).cast("double").as("total_rev"))
    // Global top-10 via orderBy+limit = TakeOrderedAndProject (per-
    // partition partial top-k, no single-partition window shuffle);
    // row_number then runs over just the 10 surviving rows.
    val top10 = r.join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(desc("total_rev"), col("s_suppkey"))
      .limit(10)
    top10
      // single-partition window over exactly 10 rows — correct at any
      // scale. s_suppkey % 1 (always 0) is non-foldable, so the
      // optimizer keeps the partition spec and WindowExec doesn't warn.
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("s_suppkey") % 1)
          .orderBy(desc("total_rev"), col("s_suppkey"))).cast("long"))
      .select("s_suppkey", "s_name", "total_rev", "rk")
      .orderBy("rk")
  }

  private val qTopSuppliersSql =
    s"""WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(SUM($revSql) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev, rk FROM (
      |  SELECT s_suppkey, s_name, total_rev,
      |    ROW_NUMBER() OVER (ORDER BY total_rev DESC, s_suppkey) AS rk
      |  FROM r JOIN supplier ON l_suppkey = s_suppkey) t
      |WHERE rk <= 10 ORDER BY rk""".stripMargin

  // ---- q_semi_anti: EXISTS / NOT EXISTS per segment -----------------
  private def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val withO = cust.join(active, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
    val without = cust.join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
    withO.join(without, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_with", "n_without"))
      .orderBy("c_mktsegment")
  }

  private val qSemiAntiSql =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      |SELECT c_mktsegment,
      |  COUNT(a.o_custkey) AS n_with,
      |  COUNT(*) - COUNT(a.o_custkey) AS n_without
      |FROM customer LEFT JOIN a ON c_custkey = a.o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- q_rollup: hierarchical aggregation ---------------------------
  // Expressed via spark.sql on temp views: the Dataset-API .rollup over
  // join-derived columns trips DetectAmbiguousSelfJoin inside the
  // Expand node ROLLUP generates, even after re-aliasing. The SQL path
  // produces the identical Expand+Aggregate plan without the check.
  private def qRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_rollup_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_rollup_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_rollup_nation")
    spark.sql(
      """SELECT /*+ BROADCAST(c), BROADCAST(n) */ n_name, c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |  COUNT(*) AS n_orders
        |FROM graft_rollup_orders o
        |JOIN graft_rollup_customer c ON o_custkey = c_custkey
        |JOIN graft_rollup_nation n ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
  }

  private val qRollupSql =
    """SELECT n_name, c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin

  // ---- q_pivot: status × priority matrix ----------------------------
  private def qPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .withColumnRenamed("F", "n_f")
      .withColumnRenamed("O", "n_o")
      .withColumnRenamed("P", "n_p")
      .orderBy("o_orderpriority")
  }

  private val qPivotSql =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q_window_topn: top-3 parts per brand -------------------------
  private def qWindowTopn(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_partkey")
      .agg(sum(rev()).cast("double").as("revenue"))
      .withColumn("rk", row_number().over(Window.partitionBy("p_brand")
        .orderBy(desc("revenue"), col("l_partkey"))).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("p_brand", "rk")
  }

  private val qWindowTopnSql =
    s"""SELECT p_brand, l_partkey, revenue, rk FROM (
      |  SELECT p_brand, l_partkey, revenue,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, l_partkey) AS rk
      |  FROM (
      |    SELECT p_brand, l_partkey,
      |      CAST(SUM($revSql) AS DOUBLE) AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, l_partkey) agg) ranked
      |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin

  // ---- q_running_sum: per-customer running order total ---------------
  private def qRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val qRunningSumSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---- q_approx_distinct: HLL vs exact (no oracle: HLL impl-specific)
  private def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  // ---- q7: volume shipping between nation pairs (TPC-H Q7 shape) ----
  // Cross-nation trade flows: revenue shipped from a supplier nation
  // to a DIFFERENT customer nation, per ship year. Two independent
  // dimension paths hang off lineitem (supplier→nation and
  // orders→customer→nation) — the shape that exercises multi-path
  // broadcast resolution; facts shuffle once on their join keys.
  private def q7(spark: SparkSession, dir: String): DataFrame = {
    val nationS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val nationC = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nationS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(nationC), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(rev()).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM($revSql) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |WHERE ns.n_name <> nc.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---- q10: returned-item top customers (TPC-H Q10 shape) -----------
  // Who returned the most revenue: returned lineitems joined back to
  // customer + nation, top 20. The sort key is the DOUBLE-cast
  // revenue (identical on both engines because the sum is decimal),
  // so the c_custkey tie-break is LOAD-BEARING: distinct decimal
  // revenues can collapse to equal doubles, and without the tie-break
  // the top-20 cut would be nondeterministic. Don't remove it.
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(rev()).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM($revSql) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---- q14: promo revenue share per month (TPC-H Q14 shape) ---------
  // Conditional aggregation over a fact⋈dim join: the share of
  // monthly revenue from promo parts. Both sums are decimal-exact;
  // the ratio is one double division of bit-identical operands, and
  // months with zero revenue cannot occur (every lineitem has a
  // part), so the divide never hits 0/0.
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
        date_trunc("month", col("l_shipdate")).as("ship_month"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), rev())
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(12, 2))))
          .cast("double").as("promo_revenue"),
        sum(rev()).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6))
      .orderBy("ship_month")
  }

  private val q14Sql =
    s"""SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
      |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM($revSql) AS DOUBLE) AS total_revenue,
      |  ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
      |    CAST(SUM($revSql) AS DOUBLE), 6) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("q1_pricing_summary", q1, Some(q1Sql)),
    Op("q3_shipping_priority", q3, Some(q3Sql)),
    Op("q5_local_supplier", q5, Some(q5Sql)),
    Op("q6_revenue_change", q6, Some(q6Sql)),
    Op("q7_volume_shipping", q7, Some(q7Sql)),
    Op("q10_returned_items", q10, Some(q10Sql)),
    Op("q14_promo_revenue", q14, Some(q14Sql)),
    Op("q_top_suppliers", qTopSuppliers, Some(qTopSuppliersSql)),
    Op("q_semi_anti", qSemiAnti, Some(qSemiAntiSql)),
    Op("q_rollup", qRollup, Some(qRollupSql)),
    Op("q_pivot", qPivot, Some(qPivotSql)),
    Op("q_window_topn", qWindowTopn, Some(qWindowTopnSql)),
    Op("q_running_sum", qRunningSum, Some(qRunningSumSql)),
    Op("q_approx_distinct", qApproxDistinct, None),
  )
}
