package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Feature engineering over the event stream (SURVEY §I) — the
  * point-in-time-correct feature shapes a training pipeline derives
  * from raw event logs before model training. The reference's
  * continuous pipeline delivers the events (docs/data_flow.md §1–3);
  * these operators are what the downstream consumer computes from
  * them, with the one invariant that matters for training data:
  * every feature at time t is a function of events at or before t
  * only (no leakage from the future).
  *
  * Scale notes: everything here shuffles at most once by user_id.
  * Rolling windows are RANGE frames over a per-user sort (Spark
  * maintains running aggregates incrementally — no per-row rescan);
  * the time grid is a bounded explode (days-active per user); the
  * point-in-time join is an equi-join on user_id whose range
  * predicate bounds the match set by the lookback horizon, so the
  * joined cardinality per user is O(events in window), never O(n²).
  */
object FeatureOps extends Suite {

  // ---- ft_rolling_24h: trailing-24h rolling features per event ------
  // For every event: how many events (and how much value) did this
  // user generate in the 24 hours ending at — and including — this
  // event. The RANGE frame is on epoch micros, so the window is
  // time-based, not row-based; ties (equal ts) are frame peers in
  // both engines by RANGE semantics. Count is integer-exact; the
  // value sum runs in fixed-scale decimal (order-independent) and
  // casts to double only at the end, so both engines emit identical
  // bits.
  private val dayUs = 86400000000L // 24h in microseconds

  private def ftRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-dayUs, 0L)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("n_24h"), col("sum_24h"))
      .orderBy("event_id")
  }

  private val ftRollingSql =
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS n_24h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- ft_daily_ffill: gap-filled daily grid with forward-fill ------
  // Resample each user's irregular event stream onto a regular daily
  // grid from their first to their last active day: day-level event
  // count (0 on silent days) and the last observed `value` carried
  // forward — the align-to-training-grid shape (a model consumes a
  // fixed-frequency series; sensors/logs don't emit one). The in-day
  // "last" is deterministic via max_by on the (ts, event_id) total
  // order, never a tie-broken double. The grid explode is bounded by
  // days-active per user (a 10-year user is ~3.7k rows), and the
  // forward-fill window rides the same user_id partitioning as the
  // grid join. Day 1 of every user has an event by construction, so
  // the fill never sees a leading NULL.
  private def ftDailyFfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("day_last"))
    val spans = ev.groupBy("user_id")
      .agg(date_trunc("day", min(col("ts"))).as("d0"),
        date_trunc("day", max(col("ts"))).as("d1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
        .as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_last"), ignoreNulls = true).over(w).as("value_ffill"))
      .orderBy("user_id", "day")
  }

  private val ftDailyFfillSql =
    """WITH ranked AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |daily AS (
      |  SELECT user_id, day, COUNT(*) AS n_events,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS day_last
      |  FROM ranked GROUP BY 1, 2),
      |spans AS (
      |  SELECT user_id, date_trunc('day', min(ts)) AS d0,
      |    date_trunc('day', max(ts)) AS d1
      |  FROM events GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      |  FROM spans)
      |SELECT g.user_id, g.day,
      |  COALESCE(d.n_events, 0) AS n_events,
      |  LAST_VALUE(d.day_last IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
      |FROM grid g LEFT JOIN daily d
      |  ON g.user_id = d.user_id AND g.day = d.day
      |ORDER BY 1, 2""".stripMargin

  // ---- ft_point_in_time: leakage-safe features per label event ------
  // The feature-store point-in-time join: for every purchase (the
  // label event), the user's activity STRICTLY BEFORE the purchase —
  // views in the prior 7 days, any events in the prior 24 hours,
  // exact-decimal value sum over 7 days. `h_ts < p_ts` (never <=) is
  // the leakage guard: a feature computed from the label's own
  // instant would train on the answer. Left join keeps cold-start
  // purchases (no prior activity) as all-zero feature rows — count
  // over the null-extended side is 0 without special-casing.
  private def ftPointInTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val h = ev.select(col("user_id").as("h_user"), col("ts").as("h_ts"),
      col("event_type").as("h_type"), col("value").as("h_value"))
    p.join(h,
        p("user_id") === h("h_user") &&
          h("h_ts") < p("p_ts") &&
          h("h_ts") >= p("p_ts") - expr("INTERVAL 7 DAYS"),
        "left")
      .groupBy(col("p_id"), col("user_id"), col("p_ts"))
      .agg(count(col("h_ts")).as("n_events_7d"),
        count(when(col("h_type") === "view", lit(1))).as("n_views_7d"),
        count(when(col("h_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"),
          lit(1))).as("n_events_24h"),
        coalesce(sum(col("h_value").cast(DecimalType(18, 2))),
          lit(0).cast(DecimalType(18, 2))).cast("double").as("sum_value_7d"))
      .orderBy("p_id")
  }

  private val ftPointInTimeSql =
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |  COUNT(h.ts) AS n_events_7d,
      |  COUNT(CASE WHEN h.event_type = 'view' THEN 1 END) AS n_views_7d,
      |  COUNT(CASE WHEN h.ts >= p.ts - INTERVAL 24 HOURS THEN 1 END)
      |    AS n_events_24h,
      |  CAST(COALESCE(SUM(CAST(h.value AS DECIMAL(18,2))),
      |    CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_value_7d
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN events h
      |  ON p.user_id = h.user_id
      |  AND h.ts < p.ts AND h.ts >= p.ts - INTERVAL 7 DAYS
      |GROUP BY 1, 2, 3 ORDER BY p_id""".stripMargin

  // ---- ft_label_next7d: forward-window label generation -------------
  // The mirror image of ft_point_in_time: features look strictly
  // BACK, labels look strictly FORWARD. For every active (user, day):
  // did the user purchase within the next 7 days, exclusive of the
  // label day itself ((day, day+7] — a same-day purchase would leak
  // the outcome into its own features). The RANGE frame runs on an
  // integer epoch-day index, identical in both engines; the purchase
  // day-counts it sums are integer-exact. One user_id shuffle for the
  // daily rollup; the label window reuses that partitioning.
  private def ftLabelNext7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", lit(1)))
          .as("n_purchases"))
    val w = Window.partitionBy("user_id").orderBy(col("day_idx"))
      .rangeBetween(1L, 7L)
    daily
      .withColumn("label_purchase_7d",
        (coalesce(sum(col("n_purchases")).over(w), lit(0L)) > 0)
          .cast("int"))
      .select(col("user_id"), col("day"), col("n_events"),
        col("label_purchase_7d"))
      .orderBy("user_id", "day")
  }

  private val ftLabelNext7dSql =
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
      |    COUNT(*) AS n_events,
      |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT user_id, day, n_events,
      |  CAST(COALESCE(SUM(n_purchases) OVER (
      |    PARTITION BY user_id ORDER BY day_idx
      |    RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING), 0) > 0 AS INT)
      |    AS label_purchase_7d
      |FROM daily
      |ORDER BY user_id, day""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("ft_rolling_24h", ftRolling, Some(ftRollingSql)),
    Op("ft_daily_ffill", ftDailyFfill, Some(ftDailyFfillSql)),
    Op("ft_point_in_time", ftPointInTime, Some(ftPointInTimeSql)),
    Op("ft_label_next7d", ftLabelNext7d, Some(ftLabelNext7dSql)),
  )
}
