package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Lag/throughput monitor — the WAL-size monitor + Prometheus
  * throughput metrics analog (/root/reference/src/wal_monitor.rs,
  * metrics.rs `etl_throughput_rows`): watches every micro-batch's
  * progress, accumulates row throughput, and classifies each batch's
  * processing time into Ok / Warning / Danger tiers — the
  * warning_wal_mb / danger_wal_mb two-threshold scheme of
  * wal_monitor.rs:157-166, with `health` as the current-status
  * surface that the reference's alert manager + health endpoint
  * expose (alert_manager.rs update_status, health.rs).
  */
class LagListener(
    warnBatchMillis: Long = 10000,
    dangerBatchMillis: Long = 30000,
    maxEntries: Int = 10000)
    extends StreamingQueryListener {

  // Optionally scope to one query: listeners are session-global in
  // Spark, so a multi-pipeline session (PipelineManager) binds one
  // listener per stream to keep metrics attributable.
  @volatile private var onlyQuery: Option[java.util.UUID] = None

  /** Restrict this listener to `queryId`'s progress events. */
  def bindTo(queryId: java.util.UUID): this.type = {
    onlyQuery = Some(queryId); this
  }

  require(dangerBatchMillis >= warnBatchMillis,
    "danger threshold must be at or above the warning threshold")

  import LagListener._

  case class BatchProgress(batchId: Long, numInputRows: Long, durationMs: Long) {
    def tier: Tier =
      if (durationMs >= dangerBatchMillis) Danger
      else if (durationMs >= warnBatchMillis) Warning
      else Ok
  }

  // per-batch detail is a bounded ring (a 1s-trigger monitor would
  // otherwise grow ~86k entries/day); totals are running counters so
  // they stay exact beyond the retention window.
  private val progress = new ConcurrentLinkedQueue[BatchProgress]()
  private val rowTotal = new java.util.concurrent.atomic.AtomicLong(0)
  private val warnTotal = new java.util.concurrent.atomic.AtomicLong(0)
  private val dangerTotal = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var lastTier: Tier = Ok

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (onlyQuery.exists(_ != p.id)) return
    val bp = BatchProgress(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
    progress.add(bp)
    rowTotal.addAndGet(bp.numInputRows)
    // danger ⊂ warnings: a Danger batch is also past the warning
    // threshold, so both counters move (totalWarnings must agree with
    // `warnings`, which returns every non-Ok batch)
    bp.tier match {
      case Danger => dangerTotal.incrementAndGet(); warnTotal.incrementAndGet()
      case Warning => warnTotal.incrementAndGet()
      case Ok => ()
    }
    lastTier = bp.tier
    while (progress.size > maxEntries) progress.poll()
  }

  /** Retained (most recent) batch details. */
  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    progress.asScala.toSeq
  }

  def totalRows: Long = rowTotal.get

  def totalWarnings: Long = warnTotal.get

  def totalDangers: Long = dangerTotal.get

  /** Retained batches at or above the warning threshold. */
  def warnings: Seq[BatchProgress] = batches.filter(_.tier != Ok)

  /** Current health = the most recent batch's tier (the reference's
    * per-source status: latest observation wins, recovery is
    * immediate once a batch lands under threshold again). */
  def health: Tier = lastTier
}

object LagListener {
  sealed trait Tier
  case object Ok extends Tier
  case object Warning extends Tier
  case object Danger extends Tier
}
