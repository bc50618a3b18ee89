package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Lag/throughput monitor — the WAL-size monitor + Prometheus
  * throughput metrics analog (/root/reference/src/wal_monitor.rs,
  * metrics.rs `etl_throughput_rows`): watches every micro-batch's
  * progress, accumulates row throughput, and flags batches whose
  * processing time exceeds a threshold (the "replication lag growing"
  * warning condition).
  */
class LagListener(warnBatchMillis: Long = 10000, maxEntries: Int = 10000)
    extends StreamingQueryListener {

  case class BatchProgress(batchId: Long, numInputRows: Long, durationMs: Long)

  // per-batch detail is a bounded ring (a 1s-trigger monitor would
  // otherwise grow ~86k entries/day); totals are running counters so
  // they stay exact beyond the retention window.
  private val progress = new ConcurrentLinkedQueue[BatchProgress]()
  private val rowTotal = new java.util.concurrent.atomic.AtomicLong(0)
  private val warnTotal = new java.util.concurrent.atomic.AtomicLong(0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val bp = BatchProgress(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
    progress.add(bp)
    rowTotal.addAndGet(bp.numInputRows)
    if (bp.durationMs > warnBatchMillis) warnTotal.incrementAndGet()
    while (progress.size > maxEntries) progress.poll()
  }

  /** Retained (most recent) batch details. */
  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    progress.asScala.toSeq
  }

  def totalRows: Long = rowTotal.get

  def totalWarnings: Long = warnTotal.get

  /** Retained batches slower than the threshold — lag warnings. */
  def warnings: Seq[BatchProgress] =
    batches.filter(_.durationMs > warnBatchMillis)
}
