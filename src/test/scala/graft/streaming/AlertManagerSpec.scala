package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AlertManager._
import graft.streaming.LagListener.{Danger, Ok, Warning}

class AlertManagerSpec extends AnyFunSuite {

  private class Harness(sustain: Long = 1000, attempts: Int = 3,
      failDeliveries: Int = 0) {
    var now: Long = 0
    val delivered = ArrayBuffer.empty[Alert]
    val sleeps = ArrayBuffer.empty[Long]
    private var failsLeft = failDeliveries
    val mgr = new AlertManager(
      deliver = a => {
        if (failsLeft > 0) { failsLeft -= 1; sys.error("webhook down") }
        delivered += a
      },
      sustainMillis = sustain,
      clock = () => now,
      deliveryAttempts = attempts,
      sleep = sleeps += _)
  }

  test("a transient spike never alerts; a sustained tier alerts once") {
    val h = new Harness()
    h.mgr.update("p1", Warning)            // t=0: episode starts
    h.now = 500; h.mgr.update("p1", Ok)    // recovered before sustain
    h.now = 600; h.mgr.update("p1", Ok)
    assert(h.delivered.isEmpty, "sub-threshold blip must not page")

    h.now = 1000; h.mgr.update("p1", Warning) // new episode at t=1000
    h.now = 1500; h.mgr.update("p1", Warning) // 500ms in: not sustained
    assert(h.delivered.isEmpty)
    h.now = 2000; h.mgr.update("p1", Warning) // 1000ms: sustained
    assert(h.delivered.map(_.kind) == Seq(Triggered))
    assert(h.delivered.head.tier == Warning)
    h.now = 2500; h.mgr.update("p1", Warning) // still unhealthy
    assert(h.delivered.size == 1, "same episode must not re-page")
  }

  test("escalation after an alert pages again; recovery notifies once") {
    val h = new Harness()
    h.mgr.update("p1", Warning)
    h.now = 1000; h.mgr.update("p1", Warning) // sustained → Triggered
    h.now = 1100; h.mgr.update("p1", Danger)  // escalation → Triggered
    h.now = 1200; h.mgr.update("p1", Warning) // de-escalation: no page
    h.now = 1300; h.mgr.update("p1", Ok)      // recovery
    h.now = 1400; h.mgr.update("p1", Ok)
    assert(h.delivered.map(a => (a.kind, a.tier)) ==
      Seq((Triggered, Warning), (Triggered, Danger), (Recovered, Ok)))
  }

  test("pipelines track independently") {
    val h = new Harness()
    h.mgr.update("a", Warning)
    h.now = 400; h.mgr.update("b", Danger)
    h.now = 1000; h.mgr.update("a", Warning)  // a sustained (1000ms)
    assert(h.delivered.map(_.pipeline) == Seq("a"))
    h.now = 1300; h.mgr.update("b", Danger)   // b sustained (900ms < 1000)
    assert(h.delivered.map(_.pipeline) == Seq("a"))
    h.now = 1400; h.mgr.update("b", Danger)   // b sustained (1000ms)
    assert(h.delivered.map(_.pipeline) == Seq("a", "b"))
  }

  test("delivery retries with backoff inside one update") {
    // 2 failures then success: one alert, delivered on the 3rd attempt
    val h = new Harness(failDeliveries = 2)
    h.mgr.update("p1", Warning)
    h.now = 1000; h.mgr.update("p1", Warning)
    assert(h.delivered.size == 1)
    assert(h.sleeps == Seq(100, 200), "expected exponential backoff")
    assert(h.mgr.pendingCount == 0)
  }

  test("an alert surviving all retries stays queued and delivers later") {
    // 3 failures exhaust one update's attempts; the next update retries
    val h = new Harness(failDeliveries = 3)
    h.mgr.update("p1", Warning)
    h.now = 1000; h.mgr.update("p1", Warning)
    assert(h.delivered.isEmpty && h.mgr.pendingCount == 1,
      "undeliverable alert must stay queued, not drop")
    h.now = 1100; h.mgr.update("p1", Warning) // channel back up
    assert(h.delivered.map(_.kind) == Seq(Triggered))
    assert(h.mgr.pendingCount == 0)
  }

  test("queued alerts deliver in order once the channel recovers") {
    val h = new Harness(failDeliveries = 3)
    h.mgr.update("p1", Warning)
    h.now = 1000; h.mgr.update("p1", Warning) // Triggered, undeliverable
    assert(h.mgr.pendingCount == 1)
    h.now = 1100; h.mgr.update("p1", Ok)      // Recovered queued behind it
    assert(h.delivered.map(_.kind) == Seq(Triggered, Recovered),
      "FIFO: the triggered alert must deliver before its recovery")
  }
}
