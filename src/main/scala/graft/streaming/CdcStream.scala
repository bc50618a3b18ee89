package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** One decoded CDC event (the pgoutput-decoded row analog —
  * /root/reference/src/pipeline_manager.rs decodes logical-replication
  * messages into the same shape: PK, sequence, op, payload). */
case class CdcEvent(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Latest known state of one PK, as emitted downstream. */
case class CdcApplied(
    user_id: Long, event_id: Long, ts: Timestamp, value: Double,
    is_deleted: Boolean)

/** Streaming CDC apply — the continuous twin of CdcOps.
  *
  * The reference holds per-table buffers sealed by size/time and
  * merges them into the destination on a schedule; in Spark the
  * buffer/seal is the micro-batch trigger, per-key latest state lives
  * in the state store (mapGroupsWithState — no reshuffle across
  * batches, state is already hash-partitioned by key), and the merge
  * is a foreachBatch sink.
  */
object CdcStream {

  private def newer(a: CdcEvent, b: CdcEvent): CdcEvent = {
    import scala.math.Ordering.Implicits._
    if ((b.ts.getTime, b.event_id) > (a.ts.getTime, a.event_id)) b else a
  }

  private def applied(e: CdcEvent): CdcApplied =
    CdcApplied(e.user_id, e.event_id, e.ts, e.value,
      is_deleted = e.event_type == "error")

  /** Latest-per-key over a CDC event stream. Emits the updated state
    * of every key touched in the micro-batch (update output mode). */
  def latestPerKey(events: Dataset[CdcEvent]): Dataset[CdcApplied] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[CdcEvent, CdcApplied](GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          val latest = (state.getOption.iterator ++ batch).reduce(newer)
          state.update(latest)
          applied(latest)
      }
  }

  /** Micro-batched CDC merge into an arbitrary target (the
    * foreachBatch sink = the reference's scheduled landing→target
    * MERGE task). The batch is deduped to latest-per-key before the
    * target merge, exactly like the landing-table dedupe. */
  def mergeInto(
      events: Dataset[CdcEvent],
      target: CdcTarget,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    import events.sparkSession.implicits._
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
        val deduped = batch.groupByKey(_.user_id)
          .reduceGroups(newer _).map(_._2).map(applied)
          .collect() // micro-batch is already size-bounded by the trigger
        target.merge(batchId, deduped.toSeq)
      }
      .start()
  }
}

/** Merge destination abstraction (Snowflake/BigQuery/Iceberg writer
  * analog). Implementations must upsert non-deleted rows and drop
  * deleted keys. */
trait CdcTarget extends Serializable {
  def merge(batchId: Long, rows: Seq[CdcApplied]): Unit
}

/** In-memory reference target used by the specs. */
class InMemoryCdcTarget extends CdcTarget {
  private val state = scala.collection.concurrent.TrieMap.empty[Long, CdcApplied]
  override def merge(batchId: Long, rows: Seq[CdcApplied]): Unit =
    rows.foreach { r =>
      if (r.is_deleted) state.remove(r.user_id) else state.put(r.user_id, r)
    }
  def snapshot: Map[Long, CdcApplied] = state.toMap
}
