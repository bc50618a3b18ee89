package graft.streaming

import scala.util.control.NonFatal

/** Bounded retry with exponential backoff — the per-write retry the
  * reference's destination clients perform before a failure counts
  * against the circuit breaker (transient warehouse errors resolve in
  * seconds; only a persistent failure should trip the circuit).
  *
  * `sleep` is injectable so specs drive the schedule without waiting.
  * Fatal JVM errors are not retried (same policy as
  * [[CircuitBreaker.protect]]).
  */
object Retry {

  def withBackoff[T](
      maxAttempts: Int = 3,
      baseDelayMillis: Long = 100,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be at least 1")
    var attempt = 1
    while (true) {
      try return f
      catch {
        case NonFatal(e) =>
          if (attempt >= maxAttempts) throw e
          sleep(baseDelayMillis << (attempt - 1)) // 100, 200, 400, ...
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
