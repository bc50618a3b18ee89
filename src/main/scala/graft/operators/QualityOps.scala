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

  // ---- dq_drift: PSI distribution drift between batches -------------
  // Population-Stability-Index drift report between a baseline and a
  // current time slice of the event stream — the "did the input
  // distribution move under my model/pipeline" check that gates a
  // retrain or pages an operator (the batch complement of
  // ev_anomaly's per-hour spike detection; industry convention:
  // PSI < 0.1 stable, ≥ 0.1 drifting). Per event_type, `value` is
  // histogrammed into fixed-width bins over BOTH slices, bin shares
  // are Laplace-smoothed (+1 per observed bin, so an empty side never
  // divides by zero or ln(0)), and
  // PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base).
  // Cross-engine determinism: all counts are exact integers; each
  // bin's ln ratio is quantized once to 6 decimals (txt_tfidf's
  // ln-quantization contract); per-bin terms land in DECIMAL(18,12)
  // so the cross-bin sum is exact and order-independent; the drifted
  // flag cuts on the ROUND(…, 6) value both engines share.
  // Scale: one conditional-count pass to alphabet×bin cells (both
  // slices ride the same scan); per-type totals are a window over the
  // SAME event_type partitioning the final PSI aggregation then
  // reuses, so the whole post-cells chain is one shuffle — the only
  // thing that grows with the corpus is the first map-side-combined
  // aggregation.
  private val driftSplit = "2024-01-16 00:00:00"
  private val driftBinWidth = 50

  private def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("ts") < lit(driftSplit).cast("timestamp")).as("is_base"),
        floor(col("value") / driftBinWidth).cast("long").as("bucket"))
    val cells = ev.groupBy("event_type", "bucket")
      .agg(count(when(col("is_base"), lit(1))).as("cb"),
        count(when(!col("is_base"), lit(1))).as("cc"))
    // per-type totals as a window: cells is alphabet×bins-sized, and
    // the window's hashpartitioning(event_type) is exactly what the
    // PSI groupBy below needs — no stats frame, no joins back
    val w = Window.partitionBy("event_type")
    cells
      .withColumn("n_bins", count(lit(1)).over(w))
      .withColumn("nb", sum(col("cb")).over(w))
      .withColumn("nc", sum(col("cc")).over(w))
      .withColumn("pb", (col("cb") + 1).cast("double") /
        (col("nb") + col("n_bins")).cast("double"))
      .withColumn("pc", (col("cc") + 1).cast("double") /
        (col("nc") + col("n_bins")).cast("double"))
      .withColumn("term", ((col("pc") - col("pb")) *
        round(log(col("pc") / col("pb")), 6))
        .cast(org.apache.spark.sql.types.DecimalType(18, 12)))
      .groupBy("event_type")
      .agg(max(col("nb")).as("n_base"), max(col("nc")).as("n_cur"),
        max(col("n_bins")).as("n_bins"), sum(col("term")).as("psum"))
      .select(col("event_type"), col("n_base"), col("n_cur"),
        col("n_bins"), round(col("psum").cast("double"), 6).as("psi"))
      .withColumn("drifted", (col("psi") >= 0.1).cast("int"))
      .orderBy("event_type")
  }

  private val dqDriftSql =
    s"""WITH ev AS (
      |  SELECT event_type, (ts < TIMESTAMP '$driftSplit') AS is_base,
      |    CAST(floor(value / $driftBinWidth) AS BIGINT) AS bucket
      |  FROM events),
      |cells AS (
      |  SELECT event_type, bucket,
      |    COUNT(CASE WHEN is_base THEN 1 END) AS cb,
      |    COUNT(CASE WHEN NOT is_base THEN 1 END) AS cc
      |  FROM ev GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bins,
      |    CAST(SUM(cb) AS BIGINT) AS nb, CAST(SUM(cc) AS BIGINT) AS nc
      |  FROM cells GROUP BY 1),
      |terms AS (
      |  SELECT event_type,
      |    CAST((pc - pb) * ROUND(ln(pc / pb), 6) AS DECIMAL(18,12)) AS term
      |  FROM (
      |    SELECT c.event_type,
      |      CAST(c.cb + 1 AS DOUBLE) / CAST(s.nb + s.n_bins AS DOUBLE) AS pb,
      |      CAST(c.cc + 1 AS DOUBLE) / CAST(s.nc + s.n_bins AS DOUBLE) AS pc
      |    FROM cells c JOIN stats s USING (event_type)) x),
      |psi AS (SELECT event_type, SUM(term) AS psum FROM terms GROUP BY 1)
      |SELECT s.event_type, s.nb AS n_base, s.nc AS n_cur, s.n_bins,
      |  ROUND(CAST(p.psum AS DOUBLE), 6) AS psi,
      |  CAST(ROUND(CAST(p.psum AS DOUBLE), 6) >= 0.1 AS INT) AS drifted
      |FROM stats s JOIN psi p USING (event_type)
      |ORDER BY s.event_type""".stripMargin

  // ---- dq_freshness: per-stream freshness & completeness ------------
  // The third leg of the DQ suite (dq_checks = constraints, dq_drift
  // = distribution, THIS = arrival): per event_type, how stale is
  // the newest data vs the corpus watermark, and how many of the
  // hours in the type's own active span actually delivered events —
  // the "is the feed alive and gapless" page an ingest operator
  // reads first (the reference's wal/lag monitor answers the same
  // question for the replication socket; this is its batch audit).
  // All quantities are exact integers on epoch-hour arithmetic
  // (timestamp→long is whole seconds in both engines); completeness
  // is the single ROUND(observed/expected, 6) division.
  // Scale: one conditional pass to per-type (count, min, max,
  // distinct-hour) — the distinct rides the same (type, hour)
  // pre-agg the drift/anomaly ops share — then a 1-row corpus
  // watermark broadcasts back onto the alphabet-sized report.
  private def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
    val perType = hourly.groupBy("event_type")
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("hours_observed"),
        (min(col("hr").cast("long")) / 3600).cast("long").as("lo_h"),
        (max(col("hr").cast("long")) / 3600).cast("long").as("hi_h"))
    val watermark = hourly.agg(
      (max(col("hr").cast("long")) / 3600).cast("long").as("wm_h"))
    perType.crossJoin(broadcast(watermark))
      .withColumn("hours_expected", col("hi_h") - col("lo_h") + 1)
      .select(col("event_type"), col("n_events"),
        (col("wm_h") - col("hi_h")).as("lag_hours"),
        col("hours_expected"),
        col("hours_observed"),
        (col("hours_expected") - col("hours_observed")).as("hours_missing"),
        round(col("hours_observed").cast("double") /
          col("hours_expected").cast("double"), 6).as("completeness"))
      .orderBy("event_type")
  }

  private val dqFreshnessSql =
    """WITH hourly AS (
      |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |per_type AS (
      |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
      |    CAST(COUNT(*) AS BIGINT) AS hours_observed,
      |    CAST(floor(epoch(MIN(hr))) AS BIGINT) // 3600 AS lo_h,
      |    CAST(floor(epoch(MAX(hr))) AS BIGINT) // 3600 AS hi_h
      |  FROM hourly GROUP BY 1),
      |wm AS (
      |  SELECT CAST(floor(epoch(MAX(hr))) AS BIGINT) // 3600 AS wm_h
      |  FROM hourly)
      |SELECT event_type, n_events,
      |  wm_h - hi_h AS lag_hours,
      |  hi_h - lo_h + 1 AS hours_expected,
      |  hours_observed,
      |  (hi_h - lo_h + 1) - hours_observed AS hours_missing,
      |  ROUND(CAST(hours_observed AS DOUBLE) /
      |    CAST(hi_h - lo_h + 1 AS DOUBLE), 6) AS completeness
      |FROM per_type, wm ORDER BY event_type""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("dq_checks", dqChecks, Some(dqChecksSql)),
    Op("dq_drift", dqDrift, Some(dqDriftSql)),
    Op("dq_freshness", dqFreshness, Some(dqFreshnessSql)),
  )
}
