package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** CDC / ETL core — the reference's defining semantics, re-expressed
  * as batch Spark operators over the `events` CDC-log model.
  *
  * Reference semantics (studied, not copied):
  *  - landing-table dedupe to latest-row-per-PK by sequence, then a
  *    MERGE whose arms are delete / update / insert
  *    (/root/reference/etl-snowflake-py/etl_snowflake/task.py:154-190)
  *  - schema self-heal: destination adds missing columns then retries
  *    (/root/reference/src/schema_cache.rs:185, docs/data_flow.md §7)
  *  - throughput/op-mix metrics (/root/reference/src/metrics.rs:65)
  *
  * CDC log model (SURVEY §2A): PK = user_id, sequence = (ts,
  * event_id), op = DELETE when event_type='error' else UPSERT.
  *
  * Scale notes: every op here is a single hash-shuffle by PK (the
  * window/groupBy key); no collects, no cross joins. At 100 TB the
  * landing scan is filter-pruned parquet and the shuffle is the one
  * unavoidable exchange — identical shape to the reference's
  * partitioned MERGE.
  */
object CdcOps extends Suite {

  /** Latest row per PK by the CDC sequence — as a max_by aggregation,
    * not a row_number window: the aggregate partial-combines on the
    * map side, so the one shuffle by PK carries at most one row per
    * (partition, key) instead of the whole landing table, and no
    * per-key sort happens. Same rows as the ROW_NUMBER form (the
    * oracle SQL keeps that form; results are identical since
    * (ts, event_id) is unique per key). */
  private def latestPerKey(ev: DataFrame): DataFrame = {
    val cols = ev.columns
    // the key column must come from the GROUPING key, not from inside
    // the max_by struct: extracting r.user_id would erase the agg's
    // output partitioning, and every downstream join on the PK (e.g.
    // cdc_snapshot_diff's full-outer diff) would re-shuffle both
    // sides for nothing
    ev.groupBy("user_id")
      .agg(max_by(struct(cols.map(col).toSeq: _*),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(cols.map(c =>
        if (c == "user_id") col(c) else col(s"r.$c").as(c)).toSeq: _*)
  }

  private val opCol =
    when(col("event_type") === "error", "DELETE").otherwise("UPSERT").as("op")

  // ---- cdc_dedupe_latest: landing-table dedupe ----------------------
  private def cdcDedupeLatest(spark: SparkSession, dir: String): DataFrame =
    latestPerKey(Tables.events(spark, dir))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .orderBy("user_id")

  private val cdcDedupeLatestSql =
    """SELECT user_id, event_id, ts, event_type, value FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- cdc_apply_snapshot: full CDC apply → final table state -------
  // MERGE semantics: the latest op per key wins; a latest DELETE means
  // the key is absent from the final state.
  private def cdcApplySnapshot(spark: SparkSession, dir: String): DataFrame =
    latestPerKey(Tables.events(spark, dir))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy("user_id")

  private val cdcApplySnapshotSql =
    """SELECT user_id, event_id, ts, value FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin

  // ---- cdc_merge_batch: incremental MERGE into a prior snapshot -----
  // Phase 1 builds the snapshot from the log before the split date;
  // phase 2 dedupes the incremental batch and MERGEs it in:
  //   matched + DELETE  → delete
  //   matched + UPSERT  → update
  //   unmatched + UPSERT → insert
  // Expressed as: batch-upserts ∪ (snapshot ⟕-anti batch-keys) — a
  // full outer join by PK in MERGE terms, here two co-partitioned
  // hash-shuffles on user_id.
  private val mergeSplit = "2024-01-16"

  private def cdcMergeBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val split = lit(mergeSplit).cast("timestamp")
    val snapshot = latestPerKey(ev.filter(col("ts") < split))
      .filter(col("event_type") =!= "error")
      .select("user_id", "event_id", "ts", "value")
    val batch = latestPerKey(ev.filter(col("ts") >= split))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val upserts = batch.filter(col("event_type") =!= "error")
      .select("user_id", "event_id", "ts", "value")
    val untouched = snapshot.join(batch.select("user_id"),
      Seq("user_id"), "left_anti")
    upserts.unionByName(untouched).orderBy("user_id")
  }

  private val cdcMergeBatchSql =
    s"""WITH snapshot AS (
      |  SELECT user_id, event_id, ts, value FROM (
      |    SELECT user_id, event_id, ts, event_type, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '$mergeSplit') t
      |  WHERE rn = 1 AND event_type <> 'error'),
      |batch AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM (
      |    SELECT user_id, event_id, ts, event_type, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts >= TIMESTAMP '$mergeSplit') t
      |  WHERE rn = 1)
      |SELECT user_id, event_id, ts, value FROM batch WHERE event_type <> 'error'
      |UNION ALL
      |SELECT s.user_id, s.event_id, s.ts, s.value FROM snapshot s
      |WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.user_id = s.user_id)
      |ORDER BY user_id""".stripMargin

  // ---- cdc_scd2: slowly-changing-dimension type 2 history -----------
  // Every upsert opens a version at its ts; the next event for the
  // same PK (upsert or delete) closes it. A version is current iff
  // nothing follows it. Deletes close history but are not versions.
  // Open-ended versions use the standard SCD2 high-date sentinel
  // (2200-01-01, within pandas ns-datetime range) rather than NULL — idiomatic, and keeps the oracle
  // hash free of engine-specific NULL-timestamp renderings.
  private val scd2OpenEnd = "2200-01-01 00:00:00"

  private def cdcScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"),
        coalesce(col("valid_to"), lit(scd2OpenEnd).cast("timestamp"))
          .as("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  private val cdcScd2Sql =
    s"""SELECT user_id, event_id, value, ts AS valid_from,
      |  COALESCE(valid_to, TIMESTAMP '$scd2OpenEnd') AS valid_to,
      |  valid_to IS NULL AS is_current
      |FROM (
      |  SELECT user_id, event_id, event_type, value, ts,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM events) t
      |WHERE event_type <> 'error'
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ---- cdc_changelog_stats: per-hour op mix + throughput ------------
  private def cdcChangelogStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("hour"), opCol,
        col("user_id"), col("value"))
      .groupBy("hour", "op")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_keys"),
        Num.dsum(col("value"), 2).as("sum_value"))
      .orderBy("hour", "op")

  private val cdcChangelogStatsSql =
    """SELECT date_trunc('hour', ts) AS hour,
      |  CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_keys,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, op""".stripMargin

  // ---- cdc_schema_reconcile: schema-evolution self-heal -------------
  // Batch v1 has the old schema (no value/props); batch v2 dropped
  // event_type and added value/props. Reconcile = union by name with
  // missing columns as NULL — the destination "adds missing columns
  // and retries" semantic as one relational op.
  private def cdcSchemaReconcile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v1 = ev.filter(col("event_id") % 2 === 0)
      .select("event_id", "ts", "user_id", "event_type")
    val v2 = ev.filter(col("event_id") % 2 === 1)
      .select("event_id", "ts", "user_id", "value", "props")
    v1.unionByName(v2, allowMissingColumns = true)
      // string NULLs hash consistently across engines; double NULLs
      // don't (NaN vs None in the compare) — use a -1 sentinel.
      .withColumn("value", coalesce(col("value"), lit(-1.0)))
      .orderBy("event_id")
  }

  private val cdcSchemaReconcileSql =
    """SELECT event_id, ts, user_id, event_type,
      |  -1.0 AS value, CAST(NULL AS VARCHAR) AS props
      |FROM events WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT event_id, ts, user_id, CAST(NULL AS VARCHAR) AS event_type,
      |  value, props
      |FROM events WHERE event_id % 2 = 1
      |ORDER BY event_id""".stripMargin

  // ---- cdc_snapshot_diff: changelog from two table states -----------
  // The INVERSE of apply: given the table state at two cut points,
  // emit the net change rows (INSERT / UPDATE / DELETE with old and
  // new values) — what a reconciliation job produces when the source
  // can't stream and must be re-snapshotted. Both states shuffle by
  // the PK once; the FULL OUTER diff join then reuses that exact
  // partitioning (co-partitioned, no third exchange), and keys whose
  // value didn't change drop out. At 100 TB this is two pruned scans
  // + one co-located join — the canonical snapshot-reconcile plan.
  private val diffT1 = "2024-01-15"
  private val diffT2 = "2024-01-31"

  private def stateAt(spark: SparkSession, dir: String, cut: String) =
    latestPerKey(Tables.events(spark, dir)
      .filter(col("ts") <= lit(cut).cast("timestamp")))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("value"))

  private def cdcSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val before = stateAt(spark, dir, diffT1)
      .withColumnRenamed("value", "old_value")
    val after = stateAt(spark, dir, diffT2)
      .withColumnRenamed("value", "new_value")
    before.join(after, Seq("user_id"), "full_outer")
      .withColumn("change",
        when(col("old_value").isNull, "INSERT")
          .when(col("new_value").isNull, "DELETE")
          .when(col("old_value") =!= col("new_value"), "UPDATE"))
      .filter(col("change").isNotNull)
      // values render as DECIMAL(18,2)→string: `value` is exactly
      // 2-dp so the cast is lossless and both engines format the
      // scale-2 decimal identically ('116.00'), while a NULL (the
      // absent side of an INSERT/DELETE) crosses as a NULL STRING —
      // None in both engines' arrow bridges. A NULL double would
      // become NaN on the oracle's pandas side and a bare decimal
      // would be re-floated there, both breaking the hash gate.
      .select(col("user_id"), col("change"),
        col("old_value").cast(DecimalType(18, 2)).cast("string")
          .as("old_value"),
        col("new_value").cast(DecimalType(18, 2)).cast("string")
          .as("new_value"))
      .orderBy("user_id")
  }

  private val cdcSnapshotDiffSql =
    s"""WITH state1 AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, event_type, value, ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts <= TIMESTAMP '$diffT1') t
      |  WHERE rn = 1 AND event_type <> 'error'),
      |state2 AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, event_type, value, ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts <= TIMESTAMP '$diffT2') t
      |  WHERE rn = 1 AND event_type <> 'error')
      |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
      |  CASE WHEN a.user_id IS NULL THEN 'INSERT'
      |       WHEN b.user_id IS NULL THEN 'DELETE'
      |       WHEN a.value <> b.value THEN 'UPDATE' END AS change,
      |  CAST(CAST(a.value AS DECIMAL(18,2)) AS VARCHAR) AS old_value,
      |  CAST(CAST(b.value AS DECIMAL(18,2)) AS VARCHAR) AS new_value
      |FROM state1 a FULL OUTER JOIN state2 b ON a.user_id = b.user_id
      |WHERE CASE WHEN a.user_id IS NULL THEN 'INSERT'
      |       WHEN b.user_id IS NULL THEN 'DELETE'
      |       WHEN a.value <> b.value THEN 'UPDATE' END IS NOT NULL
      |ORDER BY user_id""".stripMargin

  // ---- cdc_incremental_agg: materialized-view maintenance -----------
  // The aggregate-refresh job every CDC destination runs after a merge:
  // a per-group materialized view (n_keys, sum_value by the latest
  // row's event_type) is maintained INCREMENTALLY from the batch — for
  // each touched key, retract its prior contribution and add its new
  // one — instead of re-aggregating the table. The oracle recomputes
  // the view from the full log, so the hash gate proves incremental
  // maintenance ≡ recompute (the IVM correctness property).
  //
  // Scale shape: the batch shuffles by PK once (latestPerKey); prior
  // state is probed ONLY for batch keys (left-semi — at 100 TB the
  // batch-key list broadcasts into a bucketed state scan, so the
  // retraction read is key-pruned, not a table scan); the delta agg is
  // group-cardinality-sized. The full corpus is never re-aggregated —
  // that is the entire point of IVM at this scale. Here prior state
  // and its view are derived from the log for self-containment; in
  // production both are stored tables.
  private def cdcIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val split = lit(mergeSplit).cast("timestamp")
    val dec = DecimalType(18, 2)
    val state1 = latestPerKey(ev.filter(col("ts") < split))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_type"), col("value"))
    val view1 = state1.groupBy("event_type")
      .agg(count(lit(1)).as("n_keys"), sum(col("value").cast(dec)).as("sum_value"))
    val batch = ev.filter(col("ts") >= split)
    // retract: prior contributions of every key the batch touches
    val retract = state1
      .join(batch.select("user_id").distinct(), Seq("user_id"), "left_semi")
      .select(col("event_type"), lit(-1L).as("dk"),
        (col("value").cast(dec) * lit(-1).cast(DecimalType(1, 0))).as("dv"))
    // add: the touched keys' new rows (batch events all sequence-after
    // prior ones, so latest-of-batch IS the key's new state)
    val additions = latestPerKey(batch)
      .filter(col("event_type") =!= "error")
      .select(col("event_type"), lit(1L).as("dk"), col("value").cast(dec).as("dv"))
    val deltas = retract.unionByName(additions)
      .groupBy("event_type").agg(sum("dk").as("dk"), sum("dv").as("dv"))
    view1.join(deltas, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n_keys"), lit(0L)) + coalesce(col("dk"), lit(0L)))
          .as("n_keys"),
        (coalesce(col("sum_value"), lit(0).cast(dec)) +
          coalesce(col("dv"), lit(0).cast(dec))).cast("double").as("sum_value"))
      .filter(col("n_keys") > 0)
      .orderBy("event_type")
  }

  private val cdcIncrementalAggSql =
    """SELECT event_type, COUNT(*) AS n_keys,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, event_type, value, ROW_NUMBER() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND event_type <> 'error'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- cdc_log_compact: Kafka-style log compaction ------------------
  // The compaction pass a changelog topic/table runs to stay bounded
  // (Kafka's cleaner semantics, batch form): everything newer than
  // the retention watermark (the "dirty head") survives untouched;
  // in the tail, only each key's LATEST OVERALL record survives —
  // and an expired DELETE tombstone is dropped entirely (its absence
  // IS the deletion). The invariant that makes this safe, pinned by
  // spec: cdc_apply_snapshot over the compacted log equals
  // cdc_apply_snapshot over the full log — compaction changes
  // storage, never state. Watermark = corpus max ts − 24 h (a
  // broadcast 1-row scalar, ft_rfm's reference-date pattern, so the
  // op is deterministic from the data alone).
  // Scale: ONE user_id shuffle carries the latest-rank window; the
  // watermark scalar broadcasts; output order rides the same key.
  private def cdcLogCompact(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), opCol)
    val wm = ev.agg((max(col("ts")) - expr("INTERVAL 24 HOUR")).as("wm"))
    ev.crossJoin(broadcast(wm))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("ts") > col("wm") ||
        (col("rn") === 1 && col("op") =!= "DELETE"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("op"),
        when(col("ts") > col("wm"), "head").otherwise("tail")
          .as("segment"))
      .orderBy("user_id", "ts", "event_id")
  }

  private val cdcLogCompactSql =
    """WITH wm AS (
      |  SELECT MAX(ts) - INTERVAL 24 HOUR AS wm FROM events),
      |r AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    CASE WHEN event_type = 'error' THEN 'DELETE'
      |      ELSE 'UPSERT' END AS op,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id, ts, event_type, value, op,
      |  CASE WHEN ts > wm THEN 'head' ELSE 'tail' END AS segment
      |FROM r CROSS JOIN wm
      |WHERE ts > wm OR (rn = 1 AND op <> 'DELETE')
      |ORDER BY user_id, ts, event_id""".stripMargin

  // ---- cdc_redelivery_audit: landing-table delivery QA ---------------
  // The delivery audit a landing table needs BEFORE trusting the
  // latest-per-PK MERGE: at-least-once transports redeliver (the
  // exact failure the reference's sequence-guarded task dedupe
  // exists for, task.py:170-177) and redelivered rows arrive LATE
  // and OUT OF EVENT-TIME ORDER. The synthetic log is clean, so the
  // landing table under audit is constructed deterministically from
  // it — every 37th record is delivered twice, replays arriving
  // after the whole original stream (arrival = event_id for
  // originals, max_id + event_id for replays; both engines replay
  // the identical construction, so the oracle is exact). The audit
  // then reports, per event_type: rows landed, duplicate deliveries
  // beyond the first per (user, event_id), affected keys, rows whose
  // event time is behind the key's arrival-order high-water mark
  // (the redelivery signature a watermark would drop), and the worst
  // lateness. On a CLEAN landing table every violation column is 0 —
  // the audit is the gate proving it.
  // Scale: the construction is map-only (filter + union + column
  // arithmetic over one broadcast max-id scalar); ONE user_id
  // shuffle carries both the arrival-order high-water-mark window
  // and (its keys being a superset) the duplicate count; the final
  // agg is alphabet-sized.
  private def cdcRedeliveryAudit(spark: SparkSession,
      dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val maxId = ev.agg(max(col("event_id")).as("max_id"))
    val landing = ev.withColumn("arrival", col("event_id"))
      .unionByName(ev.filter(col("event_id") % 37 === 0)
        .crossJoin(broadcast(maxId))
        .withColumn("arrival", col("max_id") + col("event_id"))
        .drop("max_id"))
    val wArr = Window.partitionBy("user_id").orderBy("arrival")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDup = Window.partitionBy("user_id", "event_id").orderBy("arrival")
    val audited = landing
      .withColumn("hwm", max(col("ts")).over(wArr))
      .withColumn("delivery_rank", row_number().over(wDup))
      .withColumn("late_us",
        when(col("ts") < col("hwm"),
          unix_micros(col("hwm")) - unix_micros(col("ts"))))
    audited.groupBy("event_type")
      .agg(count(lit(1)).as("n_landed"),
        count(when(col("delivery_rank") > 1, lit(1))).as("n_dup_deliveries"),
        countDistinct(when(col("delivery_rank") > 1, col("user_id")))
          .as("n_keys_affected"),
        count(col("late_us")).as("n_late"),
        round(coalesce(max(col("late_us")), lit(0L)).cast("double") /
          1000000L, 6).as("max_late_s"))
      .orderBy("event_type")
  }

  private val cdcRedeliveryAuditSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, event_type FROM events),
      |landing AS (
      |  SELECT user_id, event_id, ts, event_type, event_id AS arrival
      |  FROM ev
      |  UNION ALL
      |  SELECT user_id, event_id, ts, event_type,
      |    (SELECT MAX(event_id) FROM ev) + event_id AS arrival
      |  FROM ev WHERE event_id % 37 = 0),
      |audited AS (
      |  SELECT event_type, user_id,
      |    MAX(ts) OVER (PARTITION BY user_id ORDER BY arrival
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_id
      |      ORDER BY arrival) AS delivery_rank,
      |    ts
      |  FROM landing),
      |lat AS (
      |  SELECT event_type, user_id, delivery_rank,
      |    CASE WHEN ts < hwm THEN epoch_us(hwm) - epoch_us(ts) END
      |      AS late_us
      |  FROM audited)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_landed,
      |  CAST(COUNT(*) FILTER (WHERE delivery_rank > 1) AS BIGINT)
      |    AS n_dup_deliveries,
      |  CAST(COUNT(DISTINCT CASE WHEN delivery_rank > 1 THEN user_id END)
      |    AS BIGINT) AS n_keys_affected,
      |  CAST(COUNT(late_us) AS BIGINT) AS n_late,
      |  ROUND(CAST(COALESCE(MAX(late_us), 0) AS DOUBLE) / 1000000, 6)
      |    AS max_late_s
      |FROM lat GROUP BY event_type ORDER BY event_type""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("cdc_dedupe_latest", cdcDedupeLatest, Some(cdcDedupeLatestSql)),
    Op("cdc_apply_snapshot", cdcApplySnapshot, Some(cdcApplySnapshotSql)),
    Op("cdc_merge_batch", cdcMergeBatch, Some(cdcMergeBatchSql)),
    Op("cdc_scd2", cdcScd2, Some(cdcScd2Sql)),
    Op("cdc_changelog_stats", cdcChangelogStats, Some(cdcChangelogStatsSql)),
    Op("cdc_schema_reconcile", cdcSchemaReconcile, Some(cdcSchemaReconcileSql)),
    Op("cdc_snapshot_diff", cdcSnapshotDiff, Some(cdcSnapshotDiffSql)),
    Op("cdc_incremental_agg", cdcIncrementalAgg, Some(cdcIncrementalAggSql)),
    Op("cdc_log_compact", cdcLogCompact, Some(cdcLogCompactSql)),
    Op("cdc_redelivery_audit", cdcRedeliveryAudit,
      Some(cdcRedeliveryAuditSql)),
  )
}
