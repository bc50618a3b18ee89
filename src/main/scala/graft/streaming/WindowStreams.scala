package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Num

/** Streaming window aggregations (SURVEY §C streaming rows). The
  * builders take any DataFrame with (ts, event_type, user_id, value)
  * — batch or streaming — so the specs can assert stream/batch
  * parity on identical input. Watermarks bound state: late events
  * beyond the watermark are dropped and closed windows are evicted
  * from the state store (the WAL-retention analog).
  */
object WindowStreams {

  /** Tumbling 1h counts by event_type, 2h watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.dsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** 30-min-gap sessions per user, 1h watermark. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
