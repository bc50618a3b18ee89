package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  // shared with the streaming twin (DriftStream) and its parity spec
  private[graft] val driftSplit = "2024-01-16 00:00:00"
  private[graft] val driftBinWidth = 50

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

  // ---- dq_reconcile: header-vs-detail financial reconciliation ------
  // The audit every warehouse runs between fact tables that SHOULD
  // agree: order headers (o_totalprice) against the total derived
  // from their lineitems (Σ price·(1−disc)·(1+tax), TPC-H Q1's
  // charge formula in the proven decimal-exact structure). The report
  // is per header status plus one ORPHAN_DETAIL row: header/detail
  // row counts, childless headers, both money totals, and the signed
  // drift — the numbers a close-of-books job pages on. On this
  // synthetic corpus headers and details genuinely disagree (drift
  // ≠ 0, 257 childless headers at sf0.01) — exactly what the audit
  // exists to surface.
  // Scale: ONE per-order detail aggregate (map-side combined on the
  // orderkey the tables already shuffle on) + one full-outer join on
  // that same key — orphans on BOTH sides fall out of the join for
  // free — + a statuses-sized final agg. Money stays decimal-exact
  // end to end; no double ever aggregates.
  private def dqReconcile(spark: SparkSession, dir: String): DataFrame = {
    val charge = col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2)) *
      (lit(1.0) + col("l_tax")).cast(DecimalType(4, 2))
    val d = Tables.lineitem(spark, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_li"), sum(charge).as("detail_dec"))
    val j = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .join(d, col("o_orderkey") === col("l_orderkey"), "full_outer")
    j.groupBy(coalesce(col("o_orderstatus"), lit("ORPHAN_DETAIL"))
        .as("status"))
      .agg(
        count(col("o_orderkey")).as("n_headers"),
        count(when(col("o_orderkey").isNotNull && col("n_li").isNull,
          lit(1))).as("n_childless"),
        sum(coalesce(col("n_li"), lit(0L))).as("n_details"),
        sum(coalesce(col("o_totalprice").cast(DecimalType(18, 2)),
          lit(0).cast(DecimalType(18, 2)))).as("h_dec"),
        sum(coalesce(col("detail_dec"),
          lit(0).cast(DecimalType(22, 6)))).as("d_dec"))
      // report money at cents via the half-up INTEGER contract: the
      // scale-6 charge total's unscaled value exceeds 2^53 at sf0.1
      // (decimal→double casts then differ by an ulp across engines)
      // and a decimal downscale is no better (Spark rounds HALF_UP,
      // DuckDB truncates) — so both engines compute cents as
      // (2u+10⁴) div 2·10⁴ on the exact non-negative micro total.
      // the ×10⁶ micro totals wrapped int64 past ~9·10¹² currency
      // units per status — the micro/cent intermediates run in
      // DECIMAL(38,0)/HUGEINT in both engines (APPLIED r11; the
      // emitted sums are doubles, so no output type moves)
      .withColumn("h_cents", (col("h_dec") * 100).cast(DecimalType(38, 0)))
      .withColumn("d_u6", (col("d_dec") * 1000000L).cast(DecimalType(38, 0)))
      .withColumn("d_cents", expr("(2 * d_u6 + 10000) div 20000"))
      .select(col("status"), col("n_headers"), col("n_childless"),
        col("n_details"),
        (col("h_cents").cast("double") / lit(100.0)).as("header_sum"),
        (col("d_cents").cast("double") / lit(100.0)).as("detail_sum"),
        ((col("h_cents") - col("d_cents")).cast("double") / lit(100.0))
          .as("delta_sum"))
      .orderBy("status")
  }

  private val dqReconcileSql =
    """WITH d AS (
      |  SELECT l_orderkey, COUNT(*) AS n_li,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |      * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS detail_dec
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
      |    d.n_li, d.detail_dec
      |  FROM orders o FULL OUTER JOIN d ON o.o_orderkey = d.l_orderkey),
      |g AS (
      |  SELECT COALESCE(o_orderstatus, 'ORPHAN_DETAIL') AS status,
      |    COUNT(o_orderkey) AS n_headers,
      |    COUNT(CASE WHEN o_orderkey IS NOT NULL AND n_li IS NULL
      |      THEN 1 END) AS n_childless,
      |    CAST(SUM(COALESCE(n_li, 0)) AS BIGINT) AS n_details,
      |    CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)),
      |      CAST(0 AS DECIMAL(18,2)))) * 100 AS HUGEINT) AS h_cents,
      |    (2 * CAST(SUM(COALESCE(detail_dec, CAST(0 AS DECIMAL(22,6))))
      |      * 1000000 AS HUGEINT) + 10000) // 20000 AS d_cents
      |  FROM j GROUP BY 1)
      |SELECT status, n_headers, n_childless, n_details,
      |  CAST(h_cents AS DOUBLE) / 100.0 AS header_sum,
      |  CAST(d_cents AS DOUBLE) / 100.0 AS detail_sum,
      |  CAST(h_cents - d_cents AS DOUBLE) / 100.0 AS delta_sum
      |FROM g ORDER BY status""".stripMargin

  // ---- dq_outliers: robust MAD outlier gate -------------------------
  // The fifth DQ leg — distributional health of a measure column:
  // per event type the median and MAD (median absolute deviation) of
  // `value`, and how many rows fall outside the robust fence
  // |x − med| > 3·1.4826·MAD (the robust-z screen that, unlike
  // dq_drift's mean/std, a few wild rows cannot drag). Medians are
  // DISCRETE (the value at rank ⌈n/2⌉ — q_percentiles' posture:
  // interpolation is cross-engine-unstable, a ranked value is
  // exact), values quantize to centi-units so deviations are int64,
  // and the fence DECISION is the exact integer inequality
  // dev·10⁴ > 44478·mad100 — no float near the boundary.
  // Scale: two ranked windows (value, then deviation) and the final
  // conditional agg all ride the event_type shuffle; the two
  // alphabet-sized median frames broadcast back. The per-type sort
  // is the exact baseline; at 100 TB the fences come from
  // q_approx_percentiles' mergeable digests instead — same report.
  // n_outliers COALESCEs to 0 (the NULLable-int cross-engine trap).
  /** Centi-quantized measure rows (ft_scaler's contract) — shared by
    * the outlier gate and the quarantine export. */
  private def centiEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("q100"))

  /** (event_type, med100) discrete medians of `q100` — the exact
    * rank-⌈n/2⌉ contract. Applied twice: once on values, once on
    * deviations (the MAD). */
  private def discreteMedian(ev: DataFrame, of: String,
      as: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    ev.withColumn("rn",
        row_number().over(w.orderBy(col(of), col("event_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rn") === greatest(lit(1L), ceil(lit(0.5) * col("n"))))
      .select(col("event_type"), col(of).as(as))
  }

  /** Rows with their deviation from the per-type median, plus the
    * type's MAD — the shared core of dq_outliers and dq_quarantine. */
  private def robustDeviations(ev: DataFrame): DataFrame = {
    val dev = ev
      .join(broadcast(discreteMedian(ev, "q100", "med100")),
        Seq("event_type"))
      .withColumn("dev", abs(col("q100") - col("med100")))
    dev.join(broadcast(discreteMedian(dev, "dev", "mad100")),
      Seq("event_type"))
  }

  private def dqOutliers(spark: SparkSession, dir: String): DataFrame = {
    robustDeviations(centiEvents(spark, dir))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(col("med100")).as("med100"),
        max(col("mad100")).as("m100"),
        coalesce(sum(when(col("dev") * 10000 > col("mad100") * 44478,
          lit(1))), lit(0L)).as("n_outliers"),
        max(col("dev")).as("maxdev"))
      .select(col("event_type"), col("n_events"),
        (col("med100").cast("double") / 100.0).as("median"),
        (col("m100").cast("double") / 100.0).as("mad"),
        col("n_outliers"),
        (expr("(2 * n_outliers * 1000000 + n_events) div (2 * n_events)")
          .cast("double") / lit(1000000.0)).as("outlier_share"),
        (col("maxdev").cast("double") / 100.0).as("max_abs_dev"))
      .orderBy("event_type")
  }

  /** The shared robust-stats CTE chain (q → medians → deviations →
    * MAD) — the SQL twin of [[robustDeviations]], used by both the
    * gate's and the quarantine's oracles. */
  private val robustCtes =
    """q AS (
      |  SELECT event_type, event_id, value,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS q100
      |  FROM events WHERE value IS NOT NULL),
      |r1 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY q100, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM q),
      |med AS (
      |  SELECT event_type, q100 AS med100 FROM r1
      |  WHERE rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * n)
      |    AS BIGINT))),
      |d AS (
      |  SELECT q.event_type, q.event_id, q.value, q.q100, med100,
      |    abs(q100 - med100) AS dev
      |  FROM q JOIN med ON q.event_type = med.event_type),
      |r2 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY dev, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM d),
      |mad AS (
      |  SELECT event_type, dev AS mad100 FROM r2
      |  WHERE rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * n)
      |    AS BIGINT)))""".stripMargin

  private val dqOutliersSql =
    s"""WITH $robustCtes
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(med100) AS DOUBLE) / 100.0 AS median,
      |  CAST(MAX(mad100) AS DOUBLE) / 100.0 AS mad,
      |  CAST(COALESCE(SUM(CASE WHEN dev * 10000 > mad100 * 44478
      |    THEN 1 END), 0) AS BIGINT) AS n_outliers,
      |  CAST((2 * CAST(COALESCE(SUM(CASE WHEN dev * 10000 >
      |      mad100 * 44478 THEN 1 END), 0) AS BIGINT) * 1000000
      |    + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000.0
      |    AS outlier_share,
      |  CAST(MAX(dev) AS DOUBLE) / 100.0 AS max_abs_dev
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- dq_quarantine: worst-offender outlier row export -------------
  // The actionable half of dq_outliers: the actual ROWS an operator
  // inspects (and a pipeline routes to a quarantine table instead of
  // the merge) — per type the 5 largest robust deviations beyond the
  // same exact integer fence, ranked (dev DESC, event_id) so the cut
  // is deterministic under ties. Shares [[robustDeviations]] and the
  // [[robustCtes]] oracle chain with the gate, so the two reports
  // can never disagree about what an outlier is.
  // Scale: the fence filter runs map-side after the broadcast stats
  // join; only flagged rows (outlier_share · corpus) reach the
  // per-type top-5 window.
  private def dqQuarantine(spark: SparkSession, dir: String): DataFrame =
    robustDeviations(centiEvents(spark, dir))
      .filter(col("dev") * 10000 > col("mad100") * 44478)
      .withColumn("rank", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("dev").desc, col("event_id"))))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("rank"), col("event_id"),
        col("value"),
        (col("dev").cast("double") / 100.0).as("abs_dev"),
        (col("med100").cast("double") / 100.0).as("median"))
      .orderBy("event_type", "rank")

  private val dqQuarantineSql =
    s"""WITH $robustCtes
      |SELECT d.event_type,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
      |    ORDER BY dev DESC, event_id) AS INT) AS rank,
      |  event_id, value,
      |  CAST(dev AS DOUBLE) / 100.0 AS abs_dev,
      |  CAST(med100 AS DOUBLE) / 100.0 AS median
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |WHERE dev * 10000 > mad100 * 44478
      |QUALIFY rank <= 5
      |ORDER BY d.event_type, rank""".stripMargin

  // ---- dq_benford: leading-digit conformance screen ------------------
  // The sixth DQ leg — PROVENANCE: Benford's-law first-digit analysis
  // (Nigrini's fraud/fabrication screen; naturally-grown multi-scale
  // amounts follow P(d) = log10(1+1/d), while fabricated, capped,
  // defaulted, or unit-mangled feeds visibly don't): per leading
  // digit of the order amount, observed share vs the Benford
  // expectation and the absolute deviation. The verdict statistic is
  // MAD (mean absolute deviation, Nigrini's tables: > 0.015 =
  // nonconformity for first digits) — reported per row for
  // self-containment. Digit extraction is integer-only: amounts go
  // through the cents contract, then d = c div 10^(len(str(c))−1) —
  // the decimal-string length of an INTEGER is engine-stable, while
  // floor(log10(double)) can flip at power-of-ten boundaries. Shares
  // and MAD ride the half-up micro contract; the Benford expectations
  // are 6-decimal micro LITERALS shared by both engines (one rounding
  // of log10(1+1/d), applied identically). A uniform synthetic price
  // table legitimately FAILS this screen — the gate detecting
  // non-Benford data is the honest demo.
  // Scale: one map-side-combined 9-row agg, eager-checkpointed (the
  // fan-out rule — it feeds the totals scalar AND the share join, and
  // the scored frame feeds the MAD scalar AND the report; without the
  // checkpoints the corpus scan replays 4×, final plan 8 exchanges →
  // 2); the MAD join is 9×9-row.
  private val benfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  private def dqBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exp = benfordMicro.toDF("digit", "benford_micro")
    val digits = Tables.orders(spark, dir)
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("c"))
      .filter(col("c") > 0)
      .select(expr(
        "c div cast(power(10, length(cast(c as string)) - 1) as long)")
        .cast("int").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
      .transform(Ckpt.stage)
    val tot = counts.agg(sum(col("n")).as("t"))
    val scored = exp.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("share_micro",
        expr("(2 * n * 1000000 + t) div (2 * t)"))
      .withColumn("dev_micro",
        abs(col("share_micro") - col("benford_micro")))
      .transform(Ckpt.stage)
    val mad = scored.agg(
      expr("(2 * sum(dev_micro) + 9) div 18").as("mad_micro"))
    scored.crossJoin(broadcast(mad))
      .select(col("digit"), col("n").as("n_orders"),
        (col("share_micro").cast("double") / 1000000L).as("share"),
        (col("benford_micro").cast("double") / 1000000L).as("benford"),
        (col("dev_micro").cast("double") / 1000000L).as("abs_dev"),
        (col("mad_micro").cast("double") / 1000000L).as("mad"),
        (col("mad_micro") > 15000L).cast("int").as("nonconforming"))
      .orderBy("digit")
  }

  private val dqBenfordSql = {
    val expRows = benfordMicro.map { case (d, m) => s"($d, $m)" }
      .mkString(", ")
    s"""WITH exp(digit, benford_micro) AS (VALUES $expRows),
      |cents AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS c
      |  FROM orders),
      |digits AS (
      |  SELECT CAST(c // CAST(power(10, length(CAST(c AS VARCHAR)) - 1)
      |    AS BIGINT) AS INT) AS digit
      |  FROM cents WHERE c > 0),
      |counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM digits GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
      |scored AS (
      |  SELECT e.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
      |    e.benford_micro,
      |    (2 * CAST(COALESCE(c.n, 0) AS BIGINT) * 1000000 + t) // (2 * t)
      |      AS share_micro
      |  FROM exp e LEFT JOIN counts c ON e.digit = c.digit
      |  CROSS JOIN tot),
      |devs AS (
      |  SELECT digit, n, share_micro, benford_micro,
      |    abs(share_micro - benford_micro) AS dev_micro
      |  FROM scored),
      |mad AS (
      |  SELECT (2 * SUM(dev_micro) + 9) // 18 AS mad_micro FROM devs)
      |SELECT digit, n AS n_orders,
      |  CAST(share_micro AS DOUBLE) / 1000000 AS share,
      |  CAST(benford_micro AS DOUBLE) / 1000000 AS benford,
      |  CAST(dev_micro AS DOUBLE) / 1000000 AS abs_dev,
      |  CAST(mad_micro AS DOUBLE) / 1000000 AS mad,
      |  CAST(mad_micro > 15000 AS INT) AS nonconforming
      |FROM devs CROSS JOIN mad ORDER BY digit""".stripMargin
  }

  override val ops: Seq[Op] = Seq(
    Op("dq_checks", dqChecks, Some(dqChecksSql)),
    Op("dq_drift", dqDrift, Some(dqDriftSql)),
    Op("dq_freshness", dqFreshness, Some(dqFreshnessSql)),
    Op("dq_reconcile", dqReconcile, Some(dqReconcileSql)),
    Op("dq_outliers", dqOutliers, Some(dqOutliersSql)),
    Op("dq_quarantine", dqQuarantine, Some(dqQuarantineSql)),
    Op("dq_benford", dqBenford, Some(dqBenfordSql)),
  )
}
