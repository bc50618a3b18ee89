package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // customer/orders/lineitem all grow with SF: no hard hints —
    // AQE picks broadcast from runtime sizes at small SF and degrades
    // to shuffle joins (coalesce/skew-split) at 100×.
    li.join(ord.join(cust,
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
    // orders/customer/supplier are SF-scaled: shuffle joins (AQE
    // handles coalesce/skew/broadcast-at-small-SF). Only true dims
    // (nation/region) carry hints.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
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
    val top10 = r.join(Tables.supplier(spark, dir),
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

  // ---- q_cube: full cube with grouping indicators -------------------
  // CUBE = every subset of (status, priority) including the grand
  // total, with GROUPING() flags distinguishing "NULL because
  // aggregated away" from a NULL data value — the half of the Expand
  // shape q_rollup doesn't cover. SQL path for the same reason as
  // q_rollup (the Dataset .cube over join-derived columns trips
  // DetectAmbiguousSelfJoin); counts and decimal sums keep the cells
  // cross-engine exact.
  private def qCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_cube_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM graft_cube_orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  private val qCubeSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- q_grouping_sets: explicit non-hierarchical sets --------------
  // The third Expand shape: two INDEPENDENT single-column summaries
  // ((status), (priority)) in one pass over the fact — neither a
  // prefix hierarchy (ROLLUP) nor the powerset (CUBE). One scan feeds
  // both summaries (the Expand doubles rows, the aggregation stays
  // one exchange); GROUPING() flags disambiguate which summary a row
  // belongs to. SQL path for q_rollup's reason.
  private def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_gs_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM graft_gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_status,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  private val qGroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY g_status,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- q_ntile_spend: spend quartiles per segment -------------------
  // NTILE over a TOTAL order (spend DESC, custkey) — deterministic
  // bucket boundaries, standard remainder-to-leading-buckets
  // semantics in both engines. Partitioned by segment so no single
  // task ever sorts the whole customer base (the global-NTILE form is
  // exactly the unpartitioned-window shape the plan audit forbids);
  // per-customer spend is one decimal-exact aggregation first, so the
  // window input is customers, not orders.
  private def qNtileSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("spend"), col("c_custkey"))
    spend.withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("c_mktsegment", "quartile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("double").as("total_spend"),
        max(col("spend")).cast("double").as("top_spend"))
      .orderBy("c_mktsegment", "quartile")
  }

  private val qNtileSpendSql =
    """WITH spend AS (
      |  SELECT c_custkey, c_mktsegment,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |tiled AS (
      |  SELECT c_mktsegment, spend,
      |    CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY spend DESC, c_custkey) AS BIGINT) AS quartile
      |  FROM spend)
      |SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
      |  CAST(SUM(spend) AS DOUBLE) AS total_spend,
      |  CAST(MAX(spend) AS DOUBLE) AS top_spend
      |FROM tiled GROUP BY 1, 2 ORDER BY c_mktsegment, quartile""".stripMargin

  // ---- q_full_outer: order months ⟗ ship months ---------------------
  // The one outer-join mode the suite didn't exercise: monthly order
  // activity FULL OUTER monthly ship activity. The generated data
  // guarantees one-sided rows on both ends (shipments trail orders by
  // up to ~3 months), so coalesced keys and zero-filled sides are
  // genuinely exercised, not vacuous. Two pre-aggregations shrink the
  // join inputs to month-cardinality first — the full outer join is
  // between ~100-row frames at any corpus scale (aggregate-then-join,
  // never join-then-aggregate for this shape).
  private def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val om = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice"), 2).as("order_value"))
    val sm = Tables.lineitem(spark, dir)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(count(lit(1)).as("n_shipments"))
    om.join(sm, Seq("month"), "full_outer")
      .select(col("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("order_value"), lit(0.0)).as("order_value"),
        coalesce(col("n_shipments"), lit(0L)).as("n_shipments"),
        (col("n_orders").isNull || col("n_shipments").isNull)
          .as("one_sided"))
      .orderBy("month")
  }

  private val qFullOuterSql =
    """WITH om AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |    COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS order_value
      |  FROM orders GROUP BY 1),
      |sm AS (
      |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
      |    COUNT(*) AS n_shipments
      |  FROM lineitem GROUP BY 1)
      |SELECT COALESCE(om.month, sm.month) AS month,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(order_value, 0.0) AS order_value,
      |  COALESCE(n_shipments, 0) AS n_shipments,
      |  n_orders IS NULL OR n_shipments IS NULL AS one_sided
      |FROM om FULL OUTER JOIN sm ON om.month = sm.month
      |ORDER BY month""".stripMargin

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
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
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
      .join(supp, col("l_suppkey") === col("s_suppkey"))
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
      .join(part, col("l_partkey") === col("p_partkey"))
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

  // ---- q15: top supplier by quarterly revenue (TPC-H Q15 shape) -----
  // The revenue-view + scalar-max shape: per-supplier revenue over a
  // fixed 3-month ship window, then the supplier(s) hitting the max
  // (ties kept, per the spec). The max rides a broadcast 1-row frame
  // and the tiny winners frame broadcasts into the supplier scan, so
  // the only corpus-sized exchange is the suppkey aggregation — no
  // global window, no second fact pass. Revenue compares in exact
  // decimal space (a double max could tie-break differently per
  // engine) and casts to double only at output.
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val revView = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev()).as("total_rev"))
    val maxRev = revView.agg(max(col("total_rev")).as("max_rev"))
    val winners = revView.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .select("l_suppkey", "total_rev")
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    s"""WITH revenue AS (
      |  SELECT l_suppkey, SUM($revSql) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1995-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM revenue JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---- q4: priority count over EXISTS (TPC-H Q4 shape) --------------
  // The decorrelated-EXISTS shape: count orders per priority having at
  // least one returned lineitem (this schema has no commit/receipt
  // dates, so the return flag stands in for the lateness predicate).
  // Spark plans the semi join; no count-distinct or dedup needed.
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    Tables.orders(spark, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q12: two-class conditional counts (TPC-H Q12 shape) ----------
  // Conditional aggregation over the fact⋈fact join: urgent/high vs
  // other order priorities per return flag (no l_shipmode in this
  // schema — the flag is the grouping stand-in). Counts are BIGINT on
  // both engines (DuckDB's SUM-of-int would be HUGEINT — the audited
  // type-drift trap — so the oracle counts with COUNT + FILTER).
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_returnflag")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(when(highPrio, 1)).as("high_line_count"),
        count(when(!highPrio, 1)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  COUNT(*) FILTER (o_orderpriority IN ('1-URGENT','2-HIGH'))
      |    AS high_line_count,
      |  COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
      |    AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q13: customer order-count distribution (TPC-H Q13 shape) -----
  // The left-outer + two-level aggregation: customers keep a row even
  // with zero qualifying orders (COUNT of the null-extended side is
  // 0), then the distribution of counts. The outer join preserves the
  // 0-bucket that an inner join would silently drop.
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    val openOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") =!= "F").select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(openOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      |  GROUP BY c_custkey) x
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- q18: large-volume orders (TPC-H Q18 shape) -------------------
  // Aggregate-then-join-back: orders whose total quantity clears a
  // threshold, rejoined to order/customer detail. The HAVING runs on
  // the exact decimal sum (bit-identical cross-engine, so the cut is
  // too); o_orderkey breaks the price tie deterministically.
  private val bigOrderQty = 250

  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > bigOrderQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(20)
  }

  private val q18Sql =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |    > $bigOrderQty) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // ---- q19: disjunctive predicate revenue (TPC-H Q19 shape) ---------
  // OR-of-ANDs across both join sides — the planner-stress shape: no
  // single conjunct pushes below the join, so the filter must run on
  // the joined rows without degrading the equi-join to a cross
  // product (PlanAuditSpec's no-cartesian gate covers every query).
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pt = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)
          && col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)
          && col("l_quantity").between(20, 40)))
      .agg(sum(rev()).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // ---- q8: market share per year (TPC-H Q8 shape) -------------------
  // Share-of-total conditional aggregation over the full dimension
  // path (lineitem⋈orders⋈customer⋈nation⋈region): one nation's slice
  // of a region's yearly revenue. Both sums are decimal-exact; the
  // share is one double division of bit-identical operands, rounded
  // after.
  private val q8Region = "ASIA"
  private val q8Nation = "NATION_2"

  private def q8(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === q8Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("n_name") === q8Nation, rev())
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(12, 2))))
          .cast("double").as("nation_revenue"),
        sum(rev()).cast("double").as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy("o_year")
  }

  private val q8Sql =
    s"""SELECT year(o_orderdate) AS o_year,
      |  CAST(SUM(CASE WHEN n_name = '$q8Nation' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_revenue,
      |  CAST(SUM($revSql) AS DOUBLE) AS total_revenue,
      |  ROUND(CAST(SUM(CASE WHEN n_name = '$q8Nation' THEN $revSql
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
      |    CAST(SUM($revSql) AS DOUBLE), 6) AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = '$q8Region'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q9: profit by supplier nation × year (TPC-H Q9 shape) --------
  // Derived-measure aggregation across four dimension paths: profit =
  // revenue − 10% of retail value of the shipped quantity (this
  // schema has no ps_supplycost; p_retailprice stands in). The whole
  // amount stays in decimal until the final cast, so the per-group
  // sums are order-independent and cross-engine exact.
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    val amount = rev() -
      col("l_quantity").cast(DecimalType(12, 2)) *
      col("p_retailprice").cast(DecimalType(12, 2)) *
      lit(new java.math.BigDecimal("0.1")).cast(DecimalType(1, 1))
    val supNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir)
        .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name", "o_year")
      .agg(sum(amount).cast("double").as("profit"))
      .orderBy("n_name", "o_year")
  }

  private val q9Sql =
    s"""SELECT n_name, year(o_orderdate) AS o_year,
      |  CAST(SUM($revSql -
      |    CAST(l_quantity AS DECIMAL(12,2)) *
      |    CAST(p_retailprice AS DECIMAL(12,2)) *
      |    CAST(0.1 AS DECIMAL(1,1))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q17: small-quantity revenue (TPC-H Q17 shape) ----------------
  // The correlated-scalar-per-group shape, decorrelated as an
  // aggregate self-join: lineitems shipping less than half their
  // part's average quantity. The average is exact-decimal-sum over
  // count — bit-identical cross-engine — and 0.5× is a power-of-two
  // scale, so the cut is deterministic.
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val pavg = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(pavg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(sum(rev()).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q17Sql =
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |      AS avg_qty
      |  FROM lineitem GROUP BY 1) a ON l.l_partkey = a.pk
      |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin

  // ---- q22: rich idle customers (TPC-H Q22 shape) -------------------
  // Global-scalar subquery + anti join: customers above the positive
  // average balance with NO open order, bucketed by segment. The
  // scalar average broadcasts as a 1-row frame (BroadcastNestedLoop,
  // not a CartesianProduct — the plan gate distinguishes); the anti
  // join is the NOT EXISTS.
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val openCust = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O").select("o_custkey")
    Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(openCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  private val q22Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |      / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q16: supplier breadth per part attribute (TPC-H Q16 shape) ---
  // Distinct-count aggregation with an exclusion filter: how many
  // distinct suppliers ship each surviving (brand, type) combination
  // (lineitem stands in for partsupp — this schema has no partsupp).
  // COUNT(DISTINCT) plans expand+two-phase aggregate in Spark; the
  // full (brand, type) group key makes the DESC-count ordering
  // deterministic.
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 9, 19, 29, 39, 49))
      .select("p_partkey", "p_brand", "p_type")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"))
      .limit(20)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 19, 29, 39, 49)
      |GROUP BY 1, 2
      |ORDER BY supplier_cnt DESC, p_brand, p_type
      |LIMIT 20""".stripMargin

  // ---- q2: minimum-cost supplier per part (TPC-H Q2 shape) ----------
  // Min-per-group + join-back across a dimension path: for each
  // size-15 part, the EUROPE supplier(s) offering it at the lowest
  // observed price (no partsupp in this schema — min l_extendedprice
  // from lineitem stands in for ps_supplycost). MIN over doubles is
  // order-independent (no summation), and the join-back compares a
  // value against the min of the set it came from, so the equality is
  // exact within and across engines.
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    // EUROPE nation keys first (a ≤25-row true-dim frame with
    // accurate stats); suppliers qualify via a SEMI join so the
    // frame's size estimate stays supplier-scan-sized — an inner
    // supplier⋈nation⋈region chain multiplied the byte estimates and
    // forced SMJ plans downstream even at toy SF (q11's finding)
    val euN = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val euKeys = Tables.supplier(spark, dir)
      .join(broadcast(euN.select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey")
    val pt = Tables.part(spark, dir)
      .filter(col("p_size") === 15).select("p_partkey", "p_type")
    // part + supplier filters land BEFORE the (partkey, suppkey) agg —
    // at 100 TB the grouped frame holds only qualifying pairs.
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(pt.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(euKeys,
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("supply_cost"))
    val m = ps.groupBy(col("l_partkey").as("mpk"))
      .agg(min(col("supply_cost")).as("min_cost"))
    // join-back for names runs on the min-cost survivors only;
    // supplier/part are unhinted (AQE/size-estimates broadcast them
    // while they fit), nation keeps the true-dim hint
    ps.join(m, col("l_partkey") === col("mpk") &&
        col("supply_cost") === col("min_cost"))
      .join(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(euN), col("s_nationkey") === col("n_nationkey"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("supply_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    """WITH eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |ps AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
      |    AND l_suppkey IN (SELECT s_suppkey FROM eu)
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT l_partkey AS mpk, MIN(supply_cost) AS min_cost
      |  FROM ps GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
      |FROM ps
      |JOIN m ON l_partkey = mpk AND supply_cost = min_cost
      |JOIN eu ON l_suppkey = s_suppkey
      |JOIN part ON l_partkey = p_partkey
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ---- q11: important part values (TPC-H Q11 shape) -----------------
  // Group-share-of-global-scalar: per-part shipped value from one
  // region's suppliers, keeping parts above a multiple of the MEAN
  // part value. The classic fixed fraction must shrink 1/SF to stay
  // meaningful; the mean-relative cut is scale-invariant, so the same
  // query is non-degenerate at every corpus size. Group sums and the
  // total are exact decimal; the threshold compare runs on double
  // casts of bit-identical operands with the same op-association
  // ((k·total)/count) on both engines. The 1-row total broadcasts
  // (BroadcastNestedLoop, not a cartesian product).
  private val q11Region = "MIDDLE EAST"
  private val q11MeanMultiple = 2.0

  private def q11(spark: SparkSession, dir: String): DataFrame = {
    // region-qualifying nation keys first (a ≤25-row true-dim frame
    // with accurate stats), then a SEMI join against supplier: the
    // semi join's size estimate stays supplier-scan-sized, so
    // Catalyst auto-broadcasts the unhinted regSupp below while it
    // fits and degrades to a shuffle join at 100× (an inner-join
    // chain here blew the estimate up and forced SMJ plans even at
    // toy SF)
    val q11Nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === q11Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val regSupp = Tables.supplier(spark, dir)
      .join(broadcast(q11Nations),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey")
    val v = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(regSupp, col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        col("l_quantity").cast(DecimalType(8, 2))).as("value_dec"))
    val tot = v.agg(sum(col("value_dec")).cast("double").as("total"),
      count(lit(1)).as("cnt"))
    v.withColumn("part_value", col("value_dec").cast("double"))
      .crossJoin(broadcast(tot))
      .filter(col("part_value") >
        lit(q11MeanMultiple) * col("total") / col("cnt"))
      .select("l_partkey", "part_value")
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  private val q11Sql =
    s"""WITH v AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        CAST(l_quantity AS DECIMAL(8,2))) AS value_dec
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = '$q11Region')
      |  GROUP BY 1),
      |t AS (SELECT CAST(SUM(value_dec) AS DOUBLE) AS total,
      |  COUNT(*) AS cnt FROM v)
      |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
      |FROM v, t
      |WHERE CAST(value_dec AS DOUBLE) >
      |  CAST($q11MeanMultiple AS DOUBLE) * t.total / t.cnt
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---- q20: promotion-candidate suppliers (TPC-H Q20 shape) ---------
  // Nested semi-join chain: suppliers in EUROPE who shipped more than
  // a threshold quantity of any 'small…' part in 1997. The quantity
  // cut runs on an exact decimal sum; the qualifying-supplier list is
  // SF-scaled, so the final semi join carries no hint — AQE broadcasts
  // it while it fits and shuffles it once it doesn't.
  private val q20Qty = 50

  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val hot = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(smallParts, col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(dsum(col("l_quantity")).as("ship_qty"))
      .filter(col("ship_qty") > q20Qty)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(hot, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      .orderBy("s_name")
  }

  private val q20Sql =
    s"""SELECT s_suppkey, s_name, s_acctbal, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN
      |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |      AND l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_partkey, l_suppkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |      > $q20Qty)
      |ORDER BY s_name""".stripMargin

  // ---- q21: suppliers who kept orders waiting (TPC-H Q21 shape) -----
  // The double-correlated EXISTS + NOT-EXISTS shape (no commit/receipt
  // dates here — l_returnflag='R' stands in for the late delivery):
  // count, per supplier, returned lineitems in finished multi-supplier
  // orders where that supplier was the ONLY one with a return. Instead
  // of two decorrelated self-joins, both existence tests collapse into
  // one per-order aggregate: ≥2 distinct suppliers ⟺ min≠max suppkey,
  // and exactly-one distinct returning supplier ⟺ min=max over the
  // R-filtered suppkey — one pass, no expand, no count-distinct.
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val r = when(col("l_returnflag") === "R", col("l_suppkey"))
    val ordStats = li.groupBy("l_orderkey")
      .agg(min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"),
        min(r).as("r_min"), max(r).as("r_max"))
      .filter(col("s_min") =!= col("s_max") && col("r_min") === col("r_max"))
      .select(col("l_orderkey").as("ok"))
    li.filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(ordStats, col("l_orderkey") === col("ok"), "left_semi")
      .join(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // ---- q_percentiles: exact discrete quantiles per group ------------
  // p50/p90/p99 of order value per (segment, priority) via integer
  // rank indexing (value at row ceil(p·n) of the sorted group).
  // Deliberately discrete, not interpolated: linear interpolation is
  // two FP ops whose rounding differs between engines, while an
  // integer index into the sorted set is exact — ties permute rows
  // but never change the value at a rank. Exact per-group sort is
  // the correctness baseline; at 100 TB the production path is
  // approx_percentile's mergeable t-digest (same pattern as
  // q_approx_distinct's HLL).
  private def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment", "o_orderpriority")
    val ranked = joined
      .withColumn("rn", row_number().over(w.orderBy("o_totalprice")))
      .withColumn("n", count(lit(1)).over(w))
    def at(p: Double) =
      max(when(col("rn") === greatest(lit(1L), ceil(lit(p) * col("n"))),
        col("o_totalprice")))
    ranked.groupBy("c_mktsegment", "o_orderpriority")
      .agg(at(0.5).as("p50"), at(0.9).as("p90"), at(0.99).as("p99"),
        max(col("n")).as("n_orders"))
      .orderBy("c_mktsegment", "o_orderpriority")
  }

  // ---- q_approx_percentiles: the declared 100 TB quantile path ------
  // q_percentiles' production form: percentile_approx's mergeable
  // sketch replaces the exact per-group sort — partial sketches
  // combine map-side, so the shuffle carries one digest per
  // (partition, group) instead of every order row. Rows-only (digest
  // internals are impl-specific); the invariant spec bounds its error
  // against the exact discrete quantiles.
  private def qApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("ap50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("ap90"),
        percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("ap99"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment", "o_orderpriority")

  private val qPercentilesSql = {
    // CAST(p AS DOUBLE): a bare 0.9 literal is DECIMAL in DuckDB and
    // 0.9*n is then exact, while Spark's double 0.9*n can land just
    // above the integer (0.9*10 = 9.000000000000002) — both engines
    // must ceil the same double product.
    def at(p: String) =
      s"""MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(CAST($p AS DOUBLE) * n) AS BIGINT))
        |    THEN o_totalprice END)""".stripMargin
    s"""SELECT c_mktsegment, o_orderpriority,
      |  ${at("0.5")} AS p50,
      |  ${at("0.9")} AS p90,
      |  ${at("0.99")} AS p99,
      |  MAX(n) AS n_orders
      |FROM (
      |  SELECT c_mktsegment, o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment, o_orderpriority
      |      ORDER BY o_totalprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment, o_orderpriority) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---- q_order_gaps: inter-order gap stats per segment (LAG) --------
  // The lag/lead window shape: days between a customer's consecutive
  // orders, aggregated per market segment. The lag ordering key
  // (o_orderdate, o_orderkey) is unique per customer, so consecutive
  // pairing — and therefore every gap — is deterministic; gaps are
  // exact integer day arithmetic and the mean divides bit-identical
  // BIGINT/COUNT operands.
  private def qOrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"), col("prev").cast("date"))
          .cast("long"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_days")).as("total_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
      .withColumn("avg_gap_days",
        round(col("total_gap_days").cast("double") / col("n_gaps"), 6))
      .orderBy("c_mktsegment")
  }

  private val qOrderGapsSql =
    """SELECT c_mktsegment, COUNT(*) AS n_gaps,
      |  CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
      |  MAX(gap_days) AS max_gap_days,
      |  ROUND(CAST(CAST(SUM(gap_days) AS BIGINT) AS DOUBLE) / COUNT(*), 6)
      |    AS avg_gap_days
      |FROM (
      |  SELECT o_custkey,
      |    CAST(date_diff('day',
      |      CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
      |  FROM orders) g
      |JOIN customer ON o_custkey = c_custkey
      |WHERE gap_days IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q_set_ops: INTERSECT / EXCEPT cohort counts ------------------
  // Set-operator plan shapes (both plan as distinct-mode joins in
  // Spark — left-semi for INTERSECT, left-anti for EXCEPT, each with
  // aggregate-distinct on both sides): year-over-year customer
  // retention cohorts. Set semantics make the result order- and
  // duplicate-insensitive, so the counts are deterministic.
  private def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def buyers(year: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_custkey")
    val y96 = buyers(1996)
    val y97 = buyers(1997)
    def counted(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_customers"))
        .select(lit(name).as("cohort"), col("n_customers"))
    counted("both", y96.intersect(y97))
      .unionAll(counted("only_1996", y96.except(y97)))
      .unionAll(counted("only_1997", y97.except(y96)))
      .orderBy("cohort")
  }

  private val qSetOpsSql =
    """WITH y96 AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'),
      |y97 AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT 'both' AS cohort, COUNT(*) AS n_customers
      |  FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97) a
      |UNION ALL
      |SELECT 'only_1996', COUNT(*)
      |  FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97) b
      |UNION ALL
      |SELECT 'only_1997', COUNT(*)
      |  FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96) c
      |ORDER BY cohort""".stripMargin

  // ---- q_profile: one-pass column profiler (ANALYZE TABLE shape) ----
  // The data-profiling pass a pipeline runs before trusting a new
  // drop: per-column null count, exact distinct count, and min/max,
  // for every orders column, in ONE aggregate over one scan. Spark
  // plans the multi-distinct agg as the standard Expand(×6 columns) +
  // two-phase distinct — the same shape as melting to (column, value)
  // rows, but without materializing the melt. The 1-row wide result
  // explodes into one output row per column (driver-free). At 100 TB
  // swap countDistinct for approx_count_distinct: the Expand
  // disappears and the profile becomes one mergeable-sketch pass.
  // min/max stay TYPED through the agg and render to strings only at
  // the end (doubles via lossless DECIMAL(18,2), timestamps at second
  // precision) so the profile is numeric, not lexicographic.
  private def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val asStr = (x: Column) => x.cast("string")
    val asDec = (x: Column) => x.cast(DecimalType(18, 2)).cast("string")
    val asTs = (x: Column) => date_format(x, "yyyy-MM-dd HH:mm:ss")
    val cols: Seq[(String, Column => Column)] = Seq(
      "o_orderkey" -> asStr, "o_custkey" -> asStr,
      "o_orderstatus" -> asStr, "o_totalprice" -> asDec,
      "o_orderdate" -> asTs, "o_orderpriority" -> asStr)
    // Two aggregates, not one: mixing the 6 DISTINCT aggs with the
    // plain aggs would evaluate every plain agg on the ×7-Expanded
    // stream (25 gid-guarded buffers × 7·N rows). Split, the plain
    // pass runs once over N narrow rows and the distinct pass's
    // Expand carries only the 6 distinct columns; the two 1-row
    // results recombine with a free nested-loop join. (At 100 TB the
    // approx_count_distinct swap removes the Expand entirely and the
    // two passes fold back into one.)
    val plainAggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, r) =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        r(min(col(c))).as(s"${c}_min"), r(max(col(c))).as(s"${c}_max"))
    }
    val distinctAggs = cols.map { case (c, _) =>
      countDistinct(col(c)).as(s"${c}_distinct")
    }
    val one = Tables.orders(spark, dir).agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(broadcast(
        Tables.orders(spark, dir).agg(distinctAggs.head, distinctAggs.tail: _*)))
    one.select(explode(array(cols.map { case (c, _) =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"${c}_nulls").as("n_nulls"),
          col(s"${c}_distinct").as("n_distinct"),
          col(s"${c}_min").as("min_repr"), col(s"${c}_max").as("max_repr"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  private val qProfileSql = {
    val render: Map[String, String => String] = Map(
      "o_totalprice" -> (c => s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)"),
      "o_orderdate" -> (c => s"strftime($c, '%Y-%m-%d %H:%M:%S')"))
    val stack = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority").map { c =>
      val r = render.getOrElse(c, (x: String) => s"CAST($x AS VARCHAR)")
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  COUNT(DISTINCT $c) AS n_distinct,
        |  ${r(s"MIN($c)")} AS min_repr, ${r(s"MAX($c)")} AS max_repr
        |FROM orders""".stripMargin
    }
    stack.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---- q_orders_backlog: daily open-order count (interval agg) ------
  // "How many orders were open on each day" — the classic interval
  // counting query. The naive form joins every order against every
  // day it spans (rows × avg-duration blowup); the scale-safe form
  // converts each [order_day, last_ship_day] interval to ±1 delta
  // events and runs ONE running sum over the per-day net — the event
  // frame is 2 rows per order and the daily frame is calendar-sized.
  // The global cumsum is two-phase so no single task sorts all days:
  // a year-partitioned window computes within-year cumsums, and the
  // handful of year totals offset them through a broadcast triangle
  // join. The oracle is the plain one-window form — the hash gate
  // proves the two-phase plan is semantics-preserving.
  private def qOrdersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("start_day"))
      .agg(to_date(max(col("l_shipdate"))).as("end_day"))
    val deltas = iv.select(explode(array(
      struct(col("start_day").as("day"), lit(1).as("delta")),
      struct(date_add(col("end_day"), 1).as("day"), lit(-1).as("delta"))))
      .as("e")).select("e.*")
    // calendar-sized after the delta agg; materialize once (eager
    // Ckpt.stage) — the within-year window AND the
    // year-totals branch both consume it, and without the checkpoint
    // the whole fact-join subtree plans (and runs) under both
    val daily = deltas.groupBy("day")
      .agg(sum(col("delta")).cast("long").as("net"))
      .withColumn("yr", year(col("day")))
      .transform(Ckpt.stage)
    val wYear = Window.partitionBy("yr").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = daily.withColumn("cum_y", sum(col("net")).over(wYear))
    val ytot = within.groupBy("yr").agg(sum(col("net")).as("y_net"))
    val offsets = ytot.as("a")
      .join(broadcast(ytot.as("b")), col("b.yr") < col("a.yr"), "left")
      .groupBy(col("a.yr").as("yr"))
      .agg(coalesce(sum(col("b.y_net")), lit(0L)).as("offset"))
    within.join(broadcast(offsets), Seq("yr"))
      // render the day as a string: DATE columns round-trip as
      // python dates from Spark parquet but datetime64 from DuckDB,
      // and the driver hashes their reprs differently
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("net"),
        (col("offset") + col("cum_y")).cast("long").as("open_orders"))
      .orderBy("day")
  }

  private val qOrdersBacklogSql =
    """WITH iv AS (
      |  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_day,
      |    CAST(MAX(l.l_shipdate) AS DATE) AS end_day
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |deltas AS (
      |  SELECT start_day AS day, 1 AS delta FROM iv
      |  UNION ALL
      |  SELECT end_day + 1, -1 FROM iv),
      |daily AS (
      |  SELECT day, CAST(SUM(delta) AS BIGINT) AS net
      |  FROM deltas GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, net,
      |  CAST(SUM(net) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_orders
      |FROM daily ORDER BY day""".stripMargin

  // ---- q_skyline: 2-D Pareto frontier (the skyline operator) --------
  // Börzsönyi et al. 2001's skyline — the multi-criteria "best
  // trade-off" operator SQL engines lack natively: orders not
  // dominated on (price ↓, recency ↑) — cheaper AND at-least-as-
  // recent with one strict edge kills a row. The 2-D case collapses
  // to a sorted scan: over DISTINCT (price, date) points ordered
  // (price asc, date desc), every PRIOR point offers price ≤ p with
  // a strict edge, so a point survives iff its date strictly beats
  // the running max date — and that cummax is TWO-PHASE
  // (q_orders_backlog's idiom: within-price-band windows + a
  // bands-sized broadcast triangle prefix-max; band boundaries are
  // strict price separators, so cross-band dominance needs only
  // d' ≥ d). The oracle runs the plain one-window form — the hash
  // gate proves the two-phase plan semantics-preserving. All
  // surviving orders at a skyline point are emitted (identical
  // (price, date) twins never dominate each other).
  // Scale: one distinct-point agg (map-side combined), banded
  // windows, a bands-sized triangle, one join back on the point key.
  private def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val pts = o.groupBy("o_totalprice", "o_orderdate")
      .agg(count(lit(1)).as("n"))
      .withColumn("bkt", floor(col("o_totalprice") / 50000).cast("long"))
      .transform(Ckpt.stage)
    val wIn = Window.partitionBy("bkt")
      .orderBy(col("o_totalprice").asc, col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = pts.withColumn("hwm_in",
      max(col("o_orderdate")).over(wIn))
    val btot = pts.groupBy("bkt").agg(max(col("o_orderdate")).as("b_max"))
    val offs = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt")).agg(max(col("b.b_max")).as("off"))
    val sky = within.join(broadcast(offs), Seq("bkt"))
      .filter((col("hwm_in").isNull ||
          col("o_orderdate") > col("hwm_in")) &&
        (col("off").isNull || col("o_orderdate") > col("off")))
      .select("o_totalprice", "o_orderdate")
    o.join(sky, Seq("o_totalprice", "o_orderdate"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy("o_totalprice", "o_orderkey")
  }

  private val qSkylineSql =
    """WITH pts AS (
      |  SELECT o_totalprice AS p, o_orderdate AS d
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT p, d, MAX(d) OVER (ORDER BY p ASC, d DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM pts),
      |sky AS (SELECT p, d FROM r WHERE hwm IS NULL OR d > hwm)
      |SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
      |FROM orders o
      |JOIN sky s ON o.o_totalprice = s.p AND o.o_orderdate = s.d
      |ORDER BY o.o_totalprice, o.o_orderkey""".stripMargin

  // ---- q_order_streaks: gaps-and-islands per customer ---------------
  // The classic consecutive-runs shape (retention streaks, SLA
  // windows, sensor uptime): per customer, group their active months
  // into maximal consecutive runs ("islands") via the
  // month-index − row_number trick — consecutive months share a
  // constant difference, so one subtraction labels the island and an
  // aggregation measures it. No self-join, no recursive CTE: two
  // windows and two aggs, all partitioned by customer (a customer's
  // history fits a partition at any corpus scale; nothing global).
  private def qOrderStreaks(spark: SparkSession, dir: String): DataFrame = {
    val months = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("midx"))
      .distinct()
    val wSeq = Window.partitionBy("o_custkey").orderBy("midx")
    val islands = months
      .withColumn("island", col("midx") - row_number().over(wSeq))
      .groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("len"))
    islands.groupBy("o_custkey")
      .agg(sum(col("len")).cast("long").as("n_active_months"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).cast("long").as("longest_streak"))
      .orderBy("o_custkey")
  }

  private val qOrderStreaksSql =
    """WITH m AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS midx
      |  FROM orders),
      |isl AS (
      |  SELECT o_custkey,
      |    midx - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY midx)
      |      AS island
      |  FROM m),
      |runs AS (
      |  SELECT o_custkey, island, COUNT(*) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT o_custkey,
      |  CAST(SUM(len) AS BIGINT) AS n_active_months,
      |  COUNT(*) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak
      |FROM runs GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("q1_pricing_summary", q1, Some(q1Sql)),
    Op("q3_shipping_priority", q3, Some(q3Sql)),
    Op("q5_local_supplier", q5, Some(q5Sql)),
    Op("q6_revenue_change", q6, Some(q6Sql)),
    Op("q7_volume_shipping", q7, Some(q7Sql)),
    Op("q10_returned_items", q10, Some(q10Sql)),
    Op("q14_promo_revenue", q14, Some(q14Sql)),
    Op("q15_top_supplier", q15, Some(q15Sql)),
    Op("q4_priority_exists", q4, Some(q4Sql)),
    Op("q12_priority_class", q12, Some(q12Sql)),
    Op("q13_custdist", q13, Some(q13Sql)),
    Op("q18_big_orders", q18, Some(q18Sql)),
    Op("q19_disjunctive", q19, Some(q19Sql)),
    Op("q8_market_share", q8, Some(q8Sql)),
    Op("q9_profit_nation", q9, Some(q9Sql)),
    Op("q17_small_qty", q17, Some(q17Sql)),
    Op("q22_rich_idle", q22, Some(q22Sql)),
    Op("q16_supplier_breadth", q16, Some(q16Sql)),
    Op("q2_min_cost_supp", q2, Some(q2Sql)),
    Op("q11_important_parts", q11, Some(q11Sql)),
    Op("q20_promo_suppliers", q20, Some(q20Sql)),
    Op("q21_waiting_supplier", q21, Some(q21Sql)),
    Op("q_top_suppliers", qTopSuppliers, Some(qTopSuppliersSql)),
    Op("q_semi_anti", qSemiAnti, Some(qSemiAntiSql)),
    Op("q_rollup", qRollup, Some(qRollupSql)),
    Op("q_cube", qCube, Some(qCubeSql)),
    Op("q_grouping_sets", qGroupingSets, Some(qGroupingSetsSql)),
    Op("q_ntile_spend", qNtileSpend, Some(qNtileSpendSql)),
    Op("q_full_outer", qFullOuter, Some(qFullOuterSql)),
    Op("q_pivot", qPivot, Some(qPivotSql)),
    Op("q_window_topn", qWindowTopn, Some(qWindowTopnSql)),
    Op("q_running_sum", qRunningSum, Some(qRunningSumSql)),
    Op("q_approx_distinct", qApproxDistinct, None),
    Op("q_percentiles", qPercentiles, Some(qPercentilesSql)),
    Op("q_approx_percentiles", qApproxPercentiles, None),
    Op("q_order_gaps", qOrderGaps, Some(qOrderGapsSql)),
    Op("q_set_ops", qSetOps, Some(qSetOpsSql)),
    Op("q_profile", qProfile, Some(qProfileSql)),
    Op("q_orders_backlog", qOrdersBacklog, Some(qOrdersBacklogSql)),
    Op("q_skyline", qSkyline, Some(qSkylineSql)),
    Op("q_order_streaks", qOrderStreaks, Some(qOrderStreaksSql)),
  )
}
