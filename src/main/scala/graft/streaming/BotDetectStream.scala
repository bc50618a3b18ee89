package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event on the wire: just the keys the gap detector needs. */
case class BotEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** Per-user running gap moments. Σg² exceeds int64 (a day-long gap
  * squared is ~10²²), and the state store cannot hold a BigInt — so
  * it rides as BASE-10¹⁸ LIMBS (hi·10¹⁸ + lo), exact and encodable;
  * the decision reconstructs the BigInt. */
case class BotState(lastUs: Long, n: Long, sumG: Long, hi: Long, lo: Long)

/** One emitted per-user update (Update output mode). */
case class BotUpdate(user_id: Long, n_gaps: Long, mean_gap_s: Double,
    cv2: Double, is_bot: Int)

/** Streaming twin of the batch `ev_bot_detect` operator — continuous
  * inter-event-gap regularity screening (the reference's pipeline
  * health posture applied to BEHAVIORAL monitoring: classify a live
  * entity against a fixed decision rule as data arrives, the
  * wal_monitor.rs tier shape).
  *
  * The state per user is exactly the batch op's three integer
  * moments (n, Σg, Σg²) plus the last-seen timestamp; each
  * micro-batch's events fold in (ts, event_id) order, and the bot
  * DECISION replays the batch op's exact integer inequality
  * 100·(n·Σg² − (Σg)²) < (Σg)² in BigInt — a user's emitted row
  * after any prefix of in-order batches is BIT-IDENTICAL to the
  * batch operator run over the same prefix (the spec pins this).
  * Out-of-order events (us < lastUs across batches) are DROPPED and
  * would otherwise corrupt the gap series — the same in-order
  * contract CdcStream enforces with its sequence guard, here by
  * explicit skip so a replayed source cannot double-count.
  *
  * Scale: mapGroupsWithState keyed by user_id — state is five longs
  * per user regardless of event volume; no shuffle beyond the one
  * the grouping requires.
  */
object BotDetectStream {
  private val LIMB = 1000000000000000000L // 10¹⁸

  /** Epoch micros with full sub-ms precision (Timestamp.getTime alone
    * floors to ms — the batch twin compares unix_micros). */
  private def usOf(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def fold(st: BotState,
      events: Seq[BotEvent]): BotState = {
    var s = st
    events.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
      val us = usOf(e.ts)
      if (s.n == 0L && s.lastUs == Long.MinValue)
        s = s.copy(lastUs = us)
      else if (us >= s.lastUs) {
        val g = us - s.lastUs
        val g2 = BigInt(g) * BigInt(g)
        var lo = s.lo + (g2 % LIMB).toLong
        var hi = s.hi + (g2 / LIMB).toLong
        if (lo >= LIMB) { hi += lo / LIMB; lo = lo % LIMB }
        s = BotState(us, s.n + 1, s.sumG + g, hi, lo)
      } // else: out-of-order arrival — dropped, see contract above
    }
    s
  }

  /** The exact integer report the batch twin emits, or None below the
    * support/zero-signal cuts. */
  private[streaming] def report(userId: Long,
      s: BotState): Option[BotUpdate] =
    if (s.n < 20 || s.sumG <= 0) None
    else {
      val n = BigInt(s.n)
      val sumG = BigInt(s.sumG)
      val sumG2 = BigInt(s.hi) * LIMB + s.lo
      val v = n * sumG2 - sumG * sumG
      val sg2 = sumG * sumG
      val mean = ((2 * sumG + n) / (2 * n)).toDouble / 1e6
      val cv2 = ((2 * v * 1000000 + sg2) / (2 * sg2)).toDouble / 1e6
      Some(BotUpdate(userId, s.n, mean, cv2,
        if (v * 100 < sg2) 1 else 0))
    }

  /** The continuous query: per-user updates whenever a batch moves a
    * monitored user past the support cut. */
  def updates(events: DataFrame): Dataset[BotUpdate] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "event_id").as[BotEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[BotState, Option[BotUpdate]](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[BotEvent],
            state: GroupState[BotState]) =>
          val prev = state.getOption
            .getOrElse(BotState(Long.MinValue, 0L, 0L, 0L, 0L))
          val next = fold(prev, batch.toSeq)
          state.update(next)
          report(userId, next)
      }
      .flatMap(_.toSeq)
  }

  /** Run [[updates]] in Update mode into a memory sink (spec entry). */
  def start(events: DataFrame, name: String) =
    updates(events).writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
}
