package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Bounded-state streaming heavy hitters — the live twin of the §C
  * frequency family (`ev_heavy_hitters` exact batch, `ev_count_min`
  * sketched batch): per group key, a Misra–Gries summary (Misra &
  * Gries, "Finding repeated elements", 1982) maintained across
  * micro-batches with `flatMapGroupsWithState`.
  *
  * Why not a plain streaming `groupBy(type, user).count()`: that
  * state grows with the live KEY DOMAIN — at 100 TB/day of events an
  * unbounded user space makes the state store the bottleneck. The MG
  * summary holds AT MOST k counters per group key forever, and still
  * guarantees (a) every item with true frequency > N/(k+1) is
  * present, and (b) each kept counter underestimates its true count
  * by at most N/(k+1). The spec drives both bounds against an exact
  * batch replay.
  *
  * Streams shard by the group key (event_type here), so summaries
  * build independently per shard with no global state. Emission is
  * OutputMode.Update: each batch re-emits the updated summaries of
  * the keys it touched, stamped with the processed-count n so a
  * consumer keeps the freshest row per (key, item) — INCLUDING a
  * RETRACTION row (est = 0) for any item the MG decrement evicted
  * this batch. Without it, an item emitted once and then evicted
  * would ghost in the consumer's freshest-row view forever, with no
  * way to distinguish eviction from quiescence; with it, the
  * consumer's view always equals the live summary (est = 0 rows are
  * "no longer resident", droppable on read).
  */
object HeavyHitterStream {

  case class HhEvent(event_type: String, user_id: Long)
  /** One summary counter: est ≤ true count ≤ est + n/(k+1). */
  case class Hitter(event_type: String, user_id: Long, est: Long, n: Long)

  // public: the state encoder's generated code must reach the fields
  case class MgState(counts: Map[Long, Long], n: Long)

  def summarize(events: Dataset[HhEvent], k: Int): Dataset[Hitter] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MgState, Hitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          var counts = prev.counts
          var n = prev.n
          it.foreach { e =>
            n += 1
            counts.get(e.user_id) match {
              case Some(c) => counts = counts.updated(e.user_id, c + 1)
              case None if counts.size < k =>
                counts = counts.updated(e.user_id, 1L)
              case None =>
                // classic MG step: a non-resident item past capacity
                // decrements EVERY counter; zeros free their slots
                counts = counts.collect {
                  case (u, c) if c > 1 => (u, c - 1)
                }
            }
          }
          state.update(MgState(counts, n))
          // retractions first (deterministic order), then the summary
          val evicted = (prev.counts.keySet -- counts.keySet).toSeq.sorted
            .map(u => Hitter(key, u, 0L, n))
          (evicted ++ counts.toSeq.sortBy(_._1)
            .map { case (u, c) => Hitter(key, u, c, n) }).iterator
      }
  }
}
