package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming ordered funnel (the §C streaming twin of `ev_funnel`):
  * signup → view → purchase per user, stage k strictly after stage
  * k−1, computed over a live event stream with
  * `flatMapGroupsWithState`.
  *
  * The funnel rule is ORDER-SENSITIVE (a late-arriving earlier signup
  * lowers t1 and can re-qualify views already seen), so an
  * incremental min-update would diverge from the batch answer under
  * cross-batch disorder. Instead the state buffers the user's stage
  * events and the funnel is evaluated ONCE, when the user goes quiet:
  * an event-time timeout fires after `quietGap` beyond the user's
  * last event (as measured by the stream's watermark), the buffered
  * events are folded exactly like the batch operator, and the state
  * is dropped. State is bounded by the watermark horizon — a user's
  * buffer lives only while the user is active plus `quietGap`, the
  * same bound `dropDuplicatesWithinWatermark` relies on — and shards
  * by user_id, so there is no global buffer to skew.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelResult(user_id: Long, signup_ts: Timestamp,
      view_ts: Option[Timestamp], purchase_ts: Option[Timestamp], stage: Int)

  private val stages = Seq("signup", "view", "purchase")

  /** Event time as epoch MICROS — `Timestamp.getTime` alone is
    * millisecond-truncated, and the events table carries genuine
    * microsecond precision: two stage events inside the same
    * millisecond would collapse under ms and flip the strict `>`
    * comparisons the funnel rule is built on. */
  private[graft] def epochMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private[graft] def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** The one funnel rule, shared by the streaming fold and the spec's
    * batch replay: t1 = min signup, t2 = min view > t1,
    * t3 = min purchase > t2; users with no signup emit nothing.
    * Event times are epoch micros (see [[epochMicros]]). */
  def foldFunnel(uid: Long, events: Seq[(Long, String)]): Option[FunnelResult] = {
    def minAfter(tpe: String, after: Long): Option[Long] = {
      val c = events.collect { case (t, `tpe`) if t > after => t }
      if (c.isEmpty) None else Some(c.min)
    }
    minAfter("signup", Long.MinValue).map { t1 =>
      val t2 = minAfter("view", t1)
      val t3 = t2.flatMap(minAfter("purchase", _))
      FunnelResult(uid, microsTs(t1),
        t2.map(microsTs), t3.map(microsTs),
        1 + t2.size + t3.size)
    }
  }

  /** `events` must be a streaming Dataset; results emit in append
    * mode as users time out. `watermark` bounds disorder, `quietGap`
    * is the silence that closes a user's funnel. */
  def funnel(events: Dataset[FunnelEvent], watermark: String = "1 hour",
      quietGap: String = "1 hour"): Dataset[FunnelResult] = {
    val s = events.sparkSession
    import s.implicits._
    events.filter(col("event_type").isin(stages: _*))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Long, String)], FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Seq.empty)
            state.remove()
            foldFunnel(uid, buf).iterator
          } else {
            val buf = state.getOption.getOrElse(Seq.empty) ++
              it.map(e => (epochMicros(e.ts), e.event_type))
            state.update(buf)
            // close the funnel once the watermark passes the user's
            // last activity by quietGap (timeout API takes millis)
            state.setTimeoutTimestamp(buf.map(_._1).max / 1000L, quietGap)
            Iterator.empty
          }
      }
  }
}
