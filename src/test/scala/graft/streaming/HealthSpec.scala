package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class HealthSpec extends AnyFunSuite {

  private def breaker(clockNow: () => Long) = new CircuitBreaker(
    failureThreshold = 1, recoveryTimeoutMillis = 100, clock = clockNow)

  test("health combines lag tier and breaker state with open dominating") {
    val listener = new LagListener() // no batches observed → Ok
    var now = 0L
    val cb = breaker(() => now)
    assert(Health.check(listener, cb).status == Health.Healthy)

    cb.recordFailure() // threshold 1 → Open
    val down = Health.check(listener, cb)
    assert(down.status == Health.Unhealthy &&
      down.breakerState == CircuitBreaker.Open)

    now += 100
    assert(cb.allowRequest()) // half-open probe admitted
    assert(Health.check(listener, cb).status == Health.Degraded,
      "recovering breaker is degraded, not healthy")
    cb.recordSuccess(); cb.recordSuccess()
    assert(Health.check(listener, cb).status == Health.Healthy)
  }
}
