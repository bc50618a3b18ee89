package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class CircuitBreakerSpec extends AnyFunSuite {

  private class Clock(var now: Long = 0L) { def apply(): Long = now }

  private def breaker(clock: Clock) = new CircuitBreaker(
    failureThreshold = 3, failureWindowMillis = 1000,
    recoveryTimeoutMillis = 500, successThreshold = 2, clock = () => clock.now)

  test("opens after N failures inside the window and rejects while open") {
    val clock = new Clock; val cb = breaker(clock)
    assert(cb.state == CircuitBreaker.Closed && cb.allowRequest())
    cb.recordFailure(); cb.recordFailure()
    assert(cb.state == CircuitBreaker.Closed, "below threshold stays closed")
    cb.recordFailure()
    assert(cb.state == CircuitBreaker.Open, "threshold failures must open")
    assert(!cb.allowRequest(), "open circuit must reject")
  }

  test("failures outside the window restart the count") {
    val clock = new Clock; val cb = breaker(clock)
    cb.recordFailure(); cb.recordFailure()
    clock.now += 2000 // beyond failureWindowMillis
    cb.recordFailure() // count restarts at 1, not 3
    assert(cb.state == CircuitBreaker.Closed,
      "a slow drip of unrelated errors must not trip the breaker")
  }

  test("half-opens after the recovery timeout; successes close it") {
    val clock = new Clock; val cb = breaker(clock)
    (1 to 3).foreach(_ => cb.recordFailure())
    assert(!cb.allowRequest())
    clock.now += 500
    assert(cb.allowRequest(), "recovery timeout must admit a probe")
    assert(cb.state == CircuitBreaker.HalfOpen)
    cb.recordSuccess()
    assert(cb.state == CircuitBreaker.HalfOpen, "needs successThreshold probes")
    cb.recordSuccess()
    assert(cb.state == CircuitBreaker.Closed)
  }

  test("a failure in half-open reopens immediately") {
    val clock = new Clock; val cb = breaker(clock)
    (1 to 3).foreach(_ => cb.recordFailure())
    clock.now += 500
    assert(cb.allowRequest() && cb.state == CircuitBreaker.HalfOpen)
    cb.recordFailure()
    assert(cb.state == CircuitBreaker.Open)
    assert(!cb.allowRequest(), "fresh recovery timeout applies after reopen")
    clock.now += 500
    assert(cb.allowRequest(), "and elapses again")
  }

  test("protect() records outcomes and throws CircuitOpenException when open") {
    val clock = new Clock; val cb = breaker(clock)
    assert(cb.protect(41 + 1) == 42)
    (1 to 3).foreach { _ =>
      intercept[RuntimeException](cb.protect(sys.error("target down")))
    }
    assert(cb.state == CircuitBreaker.Open)
    intercept[CircuitOpenException](cb.protect(42))
    clock.now += 500
    assert(cb.protect(1) == 1) // half-open probe succeeds
    assert(cb.protect(2) == 2)
    assert(cb.state == CircuitBreaker.Closed)
  }
}
