package graft.streaming

/** Circuit breaker for flaky merge targets — the fault-tolerance
  * analog of the reference's breaker around destination writes
  * (/root/reference/src/circuit_breaker.rs:93-115): Closed → Open
  * after `failureThreshold` failures inside `failureWindowMillis`;
  * Open rejects requests until `recoveryTimeoutMillis` elapses, then
  * HalfOpen admits probes; `successThreshold` consecutive successes
  * close it again, one failure re-opens it.
  *
  * In a Structured Streaming sink, "reject while open" means failing
  * the micro-batch fast instead of hammering a down target: the
  * checkpoint guarantees no data loss across the restart, and the
  * sequence-guarded [[CdcTarget.merge]] makes redelivery idempotent —
  * so the breaker trades latency for target protection, never
  * correctness.
  *
  * The clock is injectable so specs can drive window/timeout
  * transitions deterministically.
  */
class CircuitBreaker(
    val failureThreshold: Int = 5,
    val failureWindowMillis: Long = 60000,
    val recoveryTimeoutMillis: Long = 30000,
    val successThreshold: Int = 2,
    clock: () => Long = () => System.currentTimeMillis()) extends Serializable {

  import CircuitBreaker._

  private var current: State = Closed
  private var failureCount: Int = 0
  private var successCount: Int = 0
  private var lastFailureAt: Option[Long] = None
  private var lastChangeAt: Long = clock()

  def state: State = synchronized(current)

  /** True if a request may proceed. Open → HalfOpen once the recovery
    * timeout has elapsed (the admitted request is the probe). */
  def allowRequest(): Boolean = synchronized {
    current match {
      case Closed => true
      case HalfOpen => true
      case Open =>
        if (clock() - lastChangeAt >= recoveryTimeoutMillis) {
          current = HalfOpen
          successCount = 0
          lastChangeAt = clock()
          true
        } else false
    }
  }

  def recordSuccess(): Unit = synchronized {
    current match {
      case HalfOpen =>
        successCount += 1
        if (successCount >= successThreshold) {
          current = Closed
          failureCount = 0
          successCount = 0
          lastFailureAt = None
          lastChangeAt = clock()
        }
      case _ =>
        failureCount = 0
        lastFailureAt = None
    }
  }

  def recordFailure(): Unit = synchronized {
    val now = clock()
    current match {
      case Closed =>
        // failures outside the window restart the count — a slow drip
        // of unrelated errors must not trip the breaker
        failureCount = lastFailureAt match {
          case Some(t) if now - t > failureWindowMillis => 1
          case _ => failureCount + 1
        }
        lastFailureAt = Some(now)
        if (failureCount >= failureThreshold) {
          current = Open
          lastChangeAt = now
        }
      case HalfOpen =>
        current = Open
        successCount = 0
        failureCount += 1
        lastFailureAt = Some(now)
        lastChangeAt = now
      case Open =>
        lastFailureAt = Some(now)
    }
  }

  /** Run `f` under breaker protection: rejected-while-open throws
    * [[CircuitOpenException]]; failures are recorded and rethrown.
    * Fatal JVM errors (OOM, interrupt during query shutdown) pass
    * through UNRECORDED — they say nothing about the target's health
    * and must not latch the breaker open. */
  def protect[T](f: => T): T = {
    if (!allowRequest())
      throw new CircuitOpenException(
        s"circuit open (failures=$failureCount); retry after ${recoveryTimeoutMillis}ms")
    try { val r = f; recordSuccess(); r }
    catch { case scala.util.control.NonFatal(e) => recordFailure(); throw e }
  }
}

object CircuitBreaker {
  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State
}

class CircuitOpenException(msg: String) extends RuntimeException(msg)
