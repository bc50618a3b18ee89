package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[AlertManager]]'s delivery through [[Webhook.deliver]]
  * against a REAL local HTTP sink: observed POST bodies, a killed
  * sink producing genuine socket failures, backoff attempts burned,
  * FIFO queueing while down, and in-order drain on recovery — the
  * reference's webhook/alert.py + alert_manager.rs:180-238 retry
  * path proven over an actual socket rather than an injected stub. */
class WebhookSpec extends AnyFunSuite {

  /** Tiny collecting webhook endpoint; `port` is fixed across
    * restarts so "recovery" reuses the dead sink's address. The bind
    * retries briefly: rebinding the SAME port right after a stop can
    * race lingering TIME_WAIT connection state. */
  private class Sink(port: Int) {
    val bodies = new ConcurrentLinkedQueue[String]()
    private var server: HttpServer = _
    private def bind(): HttpServer = {
      val deadline = System.currentTimeMillis() + 10000
      while (true) {
        try return HttpServer.create(new InetSocketAddress(port), 0)
        catch { case e: java.net.BindException =>
          if (System.currentTimeMillis() > deadline) throw e
          Thread.sleep(100)
        }
      }
      sys.error("unreachable")
    }
    def start(): Int = {
      server = bind()
      server.createContext("/alerts", (ex: HttpExchange) => {
        val body = scala.io.Source
          .fromInputStream(ex.getRequestBody, "UTF-8").mkString
        bodies.add(body)
        ex.sendResponseHeaders(200, 2L)
        ex.getResponseBody.write("ok".getBytes("UTF-8"))
        ex.close()
      })
      server.start()
      server.getAddress.getPort
    }
    def stop(): Unit = if (server != null) { server.stop(0); server = null }
  }

  test("alerts POST over HTTP; a dead sink queues FIFO and drains on recovery") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close() // free it — we just needed an ephemeral port number
    val sink = new Sink(port)
    sink.start()
    val url = s"http://127.0.0.1:$port/alerts"

    val sleeps = new ConcurrentLinkedQueue[Long]()
    var now = 0L
    val alerts = new AlertManager(
      Webhook.deliver(url, connectTimeoutMillis = 500),
      sustainMillis = 0, clock = () => now,
      deliveryAttempts = 3, sleep = l => { sleeps.add(l); () })

    // live sink: a triggered alert POSTs immediately with the full
    // payload (pipeline, tier, trace id)
    alerts.update("p1", LagListener.Danger, Some("wire-9"))
    assert(alerts.pendingCount == 0)
    assert(sink.bodies.size == 1)
    val b0 = sink.bodies.poll()
    assert(b0.contains("\"pipeline\":\"p1\"") &&
      b0.contains("\"kind\":\"Triggered\"") &&
      b0.contains("\"tier\":\"Danger\"") &&
      b0.contains("\"trace_id\":\"wire-9\""), b0)

    // kill the sink: real connection-refused failures burn the
    // per-delivery backoff attempts, then the alert stays queued
    sink.stop()
    now += 1
    alerts.update("p2", LagListener.Danger)
    assert(alerts.pendingCount == 1, "undeliverable alert must queue")
    assert(sleeps.size == 2, s"3 attempts = 2 backoff sleeps, got $sleeps")

    // more alerts while down: FIFO order preserved behind the blocked head
    now += 1
    alerts.update("p3", LagListener.Warning)
    assert(alerts.pendingCount == 2)

    // recovery: the next observation drains the whole queue in order,
    // then delivers its own alert
    sink.start()
    now += 1
    alerts.update("p4", LagListener.Danger)
    assert(alerts.pendingCount == 0, "queue must drain once the sink is back")
    val drained = Iterator.continually(sink.bodies.poll())
      .takeWhile(_ != null).toSeq
    assert(drained.map(b =>
      "\"pipeline\":\"(p[0-9])\"".r.findFirstMatchIn(b).get.group(1)) ==
      Seq("p2", "p3", "p4"), s"FIFO violated: $drained")
    sink.stop()
  }
}
