package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY §C streaming rows): attribute
  * each conversion-like event to the impression-like events for the
  * same user within a bounded lookback interval.
  *
  * Reference semantic: joining two live change streams on a time
  * bound (the streaming analog of `ev_asof_join`'s batch bounded-
  * lookback). In Structured Streaming both sides buffer in the state
  * store; the watermark plus the time-range condition make that state
  * BOUNDED — left rows are evicted once older than watermark, right
  * rows once older than watermark + lookback — so the join runs
  * indefinitely at a fixed memory footprint per user-time bucket. At
  * 100 TB/day the state shards by the equi-key (user_id): no skewed
  * global buffer, and the range predicate prunes within each shard.
  *
  * The builders take any DataFrame with (ts, event_type, user_id,
  * event_id, value) — batch or streaming — so specs can assert
  * stream/batch parity on identical input.
  */
object StreamJoin {

  /** Rows of `leftType` joined to same-user rows of `rightType` with
    * r_ts ∈ [l_ts − lookback, l_ts]. `joinType` may be "inner" or
    * "left_outer" (outer rows emit null-extended once the watermark
    * passes their eligibility bound). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftType: String,
      rightType: String,
      lookback: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", "1 hour")
    val r = right.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", "1 hour")
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback"),
      joinType)
  }
}
