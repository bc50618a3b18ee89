package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.LagListener.{Danger, Ok, Tier, Warning}

/** Streaming twin of the batch `ev_anomaly` operator — continuous
  * volume-anomaly detection against a trained baseline (the
  * reference's WAL monitor shape, /root/reference/src/wal_monitor.rs:
  * 157-166: compare a live metric against fixed thresholds, classify
  * into warning/danger tiers, hand the tier to the alert path).
  *
  * `baseline` carries per-event-type moment sums (n, s, ss) from a
  * historical window — integer-exact, typically the batch ev_anomaly
  * aggregation at training time. The stream folds hourly counts under
  * a watermark and z-scores each CLOSED window with the identical
  * integer-exact formula z = (n·c − s) / (n·σ), so a completed
  * streaming window scores exactly what the batch operator would
  * score given the same baseline (the spec pins this parity).
  *
  * Scale: one watermarked window aggregation (per-key state bounded
  * by the watermark), then a broadcast join against the tiny baseline
  * frame — per-type hourly series stay small no matter the event
  * volume, and nothing re-shuffles after the window agg.
  */
object AnomalyStream {

  /** Per-type integer moment sums over an hourly count series. */
  def baselineOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))

  /** Hourly z-scores of a (streaming or batch) event frame against a
    * fixed baseline; rows for σ = 0 types are dropped (a constant
    * series has no scale for "unusual"). */
  def zScores(events: DataFrame, baseline: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val withSigma = baseline.withColumn("sigma",
      sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double") /
        (col("n") * col("n")).cast("double")))
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(withSigma), Seq("event_type"))
      .filter(col("sigma") > 0)
      .select(col("event_type"), col("w.start").as("window_start"),
        col("n_events"),
        ((col("n") * col("n_events") - col("s")).cast("double") /
          (col("n").cast("double") * col("sigma"))).as("z"))
  }

  /** Tier classification shared with the alert path: |z| ≥ danger ⇒
    * Danger, ≥ warn ⇒ Warning. Defaults align Danger with batch
    * ev_anomaly's flag threshold. */
  def tierOf(z: Double, warnZ: Double = 1.5, dangerZ: Double = 2.0): Tier =
    if (math.abs(z) >= dangerZ) Danger
    else if (math.abs(z) >= warnZ) Warning
    else Ok

  /** Reduce a micro-batch of z-scored rows to per-type worst-|z|
    * observations (foreachBatch: aggregate the batch with this, then
    * hand the one-row-per-type result to [[observe]]). */
  def worstByType(batch: DataFrame): DataFrame =
    batch.groupBy("event_type").agg(max(abs(col("z"))).as("worst"))

  /** Drive an [[AlertManager]] from per-type worst-|z| pairs — the
    * control-plane hop (alerting runs on the driver by nature; the
    * data-plane reduction stays distributed in [[worstByType]]). */
  def observe(manager: AlertManager, worst: Iterable[(String, Double)],
      warnZ: Double = 1.5, dangerZ: Double = 2.0): Unit =
    worst.foreach { case (tpe, w) =>
      manager.update(s"anomaly:$tpe", tierOf(w, warnZ, dangerZ))
    }
}
