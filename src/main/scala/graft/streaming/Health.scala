package graft.streaming

/** Aggregated pipeline health — the health-endpoint analog
  * (/root/reference/src/health.rs exposes a status assembled from
  * the WAL monitor and destination state): one status over the lag
  * monitor's tier and the sink breaker's circuit state, with the
  * detail a dashboard or readiness probe would render.
  *
  * Severity: an Open breaker (sink down, stream failing fast)
  * dominates; a lagging stream (Danger/Warning tier) degrades; a
  * HalfOpen breaker is recovering, not healthy.
  */
object Health {

  sealed trait Status
  case object Healthy extends Status
  case object Degraded extends Status
  case object Unhealthy extends Status

  case class Report(
      status: Status,
      lagTier: LagListener.Tier,
      breakerState: CircuitBreaker.State,
      totalRows: Long,
      totalWarnings: Long,
      totalDangers: Long)

  def check(listener: LagListener, breaker: CircuitBreaker): Report = {
    val status = (breaker.state, listener.health) match {
      case (CircuitBreaker.Open, _) => Unhealthy
      case (_, LagListener.Danger) => Unhealthy
      case (CircuitBreaker.HalfOpen, _) => Degraded
      case (_, LagListener.Warning) => Degraded
      case _ => Healthy
    }
    Report(status, listener.health, breaker.state,
      listener.totalRows, listener.totalWarnings, listener.totalDangers)
  }
}
