package graft.streaming

import java.net.{HttpURLConnection, URL}
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Real-socket probe coverage for [[HealthServer]]: a Kubernetes-style
  * client GETs /health //ready //liveness while a live pipeline's
  * breaker walks Closed → Open → HalfOpen and a dependency probe
  * flips — the status transitions the reference serves from
  * src/health.rs:71-173 must be visible over HTTP, not just in the
  * in-process Health.Report. */
class HealthServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("health endpoints track breaker transitions and dependency probes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val mgr = new PipelineManager(s)
    var now = 0L
    val cb = new CircuitBreaker(
      failureThreshold = 1, recoveryTimeoutMillis = 100, clock = () => now)
    val in = MemoryStream[CdcEvent]
    val p = mgr.startCdc("probe_src", in.toDS(), new InMemoryCdcTarget,
      Files.createTempDirectory("graft_hs").toString,
      Trigger.ProcessingTime("50 milliseconds"), breaker = cb)

    @volatile var registryDown: Option[String] = None
    val srv = new HealthServer(mgr,
      checks = Map("registry" -> (() => registryDown)))
    val port = srv.start()
    try {
      in.addData(CdcEvent(1, new Timestamp(1000), 1, "click", 1.0))
      p.query.processAllAvailable()

      assert(get(port, "/liveness") == ((200, "alive")))
      assert(get(port, "/ready") == ((200, "ready")))
      val (c0, b0) = get(port, "/health")
      assert(c0 == 200 && b0.contains("\"status\":\"healthy\"") &&
        b0.contains("\"probe_src\":{\"status\":\"Healthy\"") &&
        b0.contains("\"active\":1"), b0)

      // sink failure opens the breaker → /health flips to 503 with the
      // Open state visible in the pipeline detail; readiness (a pure
      // dependency gate) stays 200
      cb.recordFailure()
      val (c1, b1) = get(port, "/health")
      assert(c1 == 503 && b1.contains("\"status\":\"unhealthy\"") &&
        b1.contains("\"breaker\":\"Open\""), b1)
      assert(get(port, "/ready")._1 == 200,
        "readiness must not gate on per-pipeline state")

      // recovery window elapses → HalfOpen probe admitted → degraded,
      // but the pod stays in service (200)
      now += 100
      assert(cb.allowRequest())
      val (c2, b2) = get(port, "/health")
      assert(c2 == 200 && b2.contains("\"status\":\"degraded\"") &&
        b2.contains("\"breaker\":\"HalfOpen\""), b2)
      cb.recordSuccess(); cb.recordSuccess()
      assert(get(port, "/health")._2.contains("\"status\":\"healthy\""))

      // a failing dependency probe takes down BOTH /ready and /health,
      // with the message surfaced in the checks block
      registryDown = Some("connection refused")
      assert(get(port, "/ready") == ((503, "not ready")))
      val (c3, b3) = get(port, "/health")
      assert(c3 == 503 && b3.contains(
        "\"registry\":{\"healthy\":false,\"message\":\"connection refused\"}"),
        b3)
      assert(get(port, "/liveness")._1 == 200, "liveness is process-up only")
    } finally { srv.stop(); mgr.stopAll() }
  }
}
