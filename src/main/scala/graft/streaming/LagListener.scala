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
class LagListener(warnBatchMillis: Long = 10000) extends StreamingQueryListener {

  case class BatchProgress(batchId: Long, numInputRows: Long, durationMs: Long)

  private val progress = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    progress.add(BatchProgress(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)))
  }

  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    progress.asScala.toSeq
  }

  def totalRows: Long = batches.map(_.numInputRows).sum

  /** Batches slower than the threshold — lag warnings. */
  def warnings: Seq[BatchProgress] =
    batches.filter(_.durationMs > warnBatchMillis)
}
