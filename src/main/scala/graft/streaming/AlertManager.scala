package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** Sustained-state alert dispatch — the reference alert manager's
  * per-source status tracking (/root/reference/src/alert_manager.rs:
  * 113 `update_status`, 180-238 webhook send with retry): a non-Ok
  * tier must be SUSTAINED for `sustainMillis` before an alert record
  * is emitted (transient spikes never page), an alerted pipeline that
  * escalates emits again at the higher severity, and a return to Ok
  * after an alert emits a recovery notification.
  *
  * Delivery goes through [[Retry.withBackoff]] to a pluggable sink
  * (the webhook analog); an alert whose delivery exhausts its retries
  * stays queued and is re-attempted on the next observation, so a
  * down alert channel delays notifications but never drops them.
  *
  * The clock and retry sleep are injectable — specs drive
  * sustain/escalation/recovery transitions without real waiting.
  */
class AlertManager(
    deliver: AlertManager.Alert => Unit,
    sustainMillis: Long = 60000,
    clock: () => Long = () => System.currentTimeMillis(),
    deliveryAttempts: Int = 3,
    sleep: Long => Unit = Thread.sleep) {

  import AlertManager._
  import LagListener.{Danger, Ok, Tier, Warning}

  /** One unhealthy episode: when it started, and the highest tier
    * already alerted for it (None until the first alert fires). */
  private case class Episode(since: Long, alertedTier: Option[Tier])

  private val episodes = TrieMap.empty[String, Episode]
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[Alert]()

  private def severity(t: Tier): Int = t match {
    case Ok => 0
    case Warning => 1
    case Danger => 2
  }

  /** Observe `pipeline`'s current tier. Call from a monitor loop or
    * after each micro-batch; emission is driven purely by observations
    * (no background thread), like the reference's periodic
    * update_status sweep. */
  def update(pipeline: String, tier: Tier): Unit =
    update(pipeline, tier, None)

  /** As [[update]], with the correlation id of the failure behind the
    * observation (tracing_context.rs's contract: the page carries the
    * trace, so the responder can walk back to the wire record). The
    * id rides the alert payload when THIS observation triggers or
    * escalates one. */
  def update(pipeline: String, tier: Tier, trace: Option[String]): Unit =
    synchronized {
      val now = clock()
      tier match {
        case Ok =>
          // recovery notifies only if the episode actually alerted —
          // a sub-threshold blip that never paged has nothing to recover
          episodes.remove(pipeline).foreach { ep =>
            if (ep.alertedTier.isDefined)
              pending.add(Alert(pipeline, Recovered, Ok, now))
          }
        case t =>
          val ep = episodes.getOrElse(pipeline, Episode(now, None))
          val sustained = now - ep.since >= sustainMillis
          val escalated = ep.alertedTier.exists(a => severity(t) > severity(a))
          val next =
            if (sustained && (ep.alertedTier.isEmpty || escalated)) {
              pending.add(Alert(pipeline, Triggered, t, now, trace))
              ep.copy(alertedTier = Some(t))
            } else ep
          episodes.update(pipeline, next)
      }
      drainPending()
    }

  /** Convenience: observe a pipeline through its lag monitor. */
  def observe(pipeline: String, listener: LagListener): Unit =
    update(pipeline, listener.health)

  private def drainPending(): Unit = {
    var blocked = false
    while (!blocked && !pending.isEmpty) {
      val a = pending.peek()
      try {
        Retry.withBackoff(deliveryAttempts, sleep = sleep)(deliver(a))
        pending.poll()
      } catch {
        // channel down past its retries: keep the alert queued (FIFO,
        // so ordering is preserved) and stop — the next update retries
        case NonFatal(_) => blocked = true
      }
    }
  }

  /** Alerts emitted but not yet delivered (alert channel down). */
  def pendingCount: Int = pending.size
}

object AlertManager {
  sealed trait Kind
  case object Triggered extends Kind
  case object Recovered extends Kind

  /** One dispatched alert record (webhook payload analog). `traceId`
    * is the correlation id of the failure that raised it, when the
    * observer knows one (see [[TraceRegistry]]). */
  case class Alert(
      pipeline: String, kind: Kind, tier: LagListener.Tier, at: Long,
      traceId: Option[String] = None)
}
