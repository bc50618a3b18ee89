package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.ReplicationState._

/** Table bootstrap: initial snapshot copy, then continuous streaming —
  * the reference's new-table lifecycle (redis_store.rs phases:
  * init → data_sync → finished_copy → ready; pipeline_manager runs
  * the full copy before the replication stream takes over for that
  * table).
  *
  * The snapshot lands through the SAME CdcTarget merge the stream
  * uses, with the snapshot rows' own (ts, event_id) sequence. That
  * makes the copy/stream handoff safe without a barrier: any change
  * event NEWER than a snapshot row wins the sequence guard, any
  * change the snapshot already reflects is rejected as stale — so
  * events that raced the copy (the overlap window every CDC bootstrap
  * has) reconcile idempotently instead of double-applying.
  * Phases land in the durable [[ReplicationStateStore]], so a
  * crash-restart knows whether the copy finished and whether the
  * stream may start.
  */
object CdcBootstrap {

  /** Run the snapshot copy: Init → DataSync → (merge) → FinishedCopy.
    * `snapshot` is the source table's current state as CDC rows (a
    * batch Dataset — at 100 TB this is the parallel table scan). */
  def copy(table: String, snapshot: Dataset[CdcApplied],
      target: CdcTarget, registry: ReplicationStateStore,
      snapshotBatchId: Long = -1L): Unit = {
    registry.update(table, Init)
    registry.update(table, DataSync)
    try {
      target.merge(snapshotBatchId, snapshot)
      registry.update(table, FinishedCopy)
    } catch {
      case e: Exception =>
        registry.update(table, Errored(
          Option(e.getMessage).getOrElse(e.getClass.getName)))
        throw e
    }
  }

  /** Start the continuous stream for a table whose copy finished;
    * phase moves to Ready once the stream is live. Refuses to stream
    * a table whose snapshot never completed — restart-after-crash
    * must re-copy first (the registry knows). */
  def stream(table: String, events: Dataset[CdcEvent], target: CdcTarget,
      registry: ReplicationStateStore, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    val phase = registry.get(table)
    require(phase.contains(FinishedCopy) || phase.contains(Ready),
      s"$table is in phase ${phase.map(_.name).getOrElse("absent")} — " +
        "snapshot copy must finish before streaming")
    val q = CdcStream.mergeInto(events, target, checkpoint, trigger)
    registry.update(table, Ready)
    q
  }
}
