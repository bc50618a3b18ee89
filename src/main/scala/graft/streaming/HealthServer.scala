package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP health/readiness surface — the probe endpoints of the
  * reference's health module (/root/reference/src/health.rs:71-173
  * serves /health with per-dependency checks + pipeline counts,
  * /ready with a lightweight critical-dependency probe, /liveness as
  * a bare process-up signal, over axum). Spark-first the server is
  * driver-side plumbing, not data plane: it renders what
  * [[PipelineManager.health]] and injected dependency probes already
  * compute, so the data path never gains a thread-safety or
  * serialization dependency on it.
  *
  *  - `GET /health`  full JSON: per-dependency checks (name →
  *    healthy/message, the database/redis checks of health.rs:126-152
  *    generalized to injected probes — a JDBC registry ping, a
  *    checkpoint-dir stat), per-pipeline [[Health.Report]]s and the
  *    active count. 200 when everything is healthy or merely
  *    Degraded (a recovering HalfOpen breaker must not knock the pod
  *    out of the service); 503 when any dependency fails or any
  *    pipeline is Unhealthy (Open breaker / Danger lag).
  *  - `GET /ready`   lightweight: dependency probes only
  *    (health.rs:108-118's SELECT 1) — readiness gates traffic on
  *    dependencies, not on per-pipeline state.
  *  - `GET /liveness` always 200 (health.rs:121-123).
  *
  * `port = 0` binds an ephemeral port (`start()` returns the real
  * one) so specs and multi-driver deployments never collide. */
class HealthServer(
    mgr: PipelineManager,
    checks: Map[String, () => Option[String]] = Map.empty,
    port: Int = 0) {

  @volatile private var server: HttpServer = _

  def start(): Int = synchronized {
    require(server == null, "health server already started")
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (ex: HttpExchange) => respond(ex, healthBody()))
    server.createContext("/ready", (ex: HttpExchange) => respond(ex, readyBody()))
    server.createContext("/liveness",
      (ex: HttpExchange) => respond(ex, (200, "alive", "text/plain")))
    server.setExecutor(null) // probes are tiny; the default executor is fine
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def respond(ex: HttpExchange, r: (Int, String, String)): Unit = {
    val (code, body, ctype) = r
    val bytes = body.getBytes(UTF_8)
    try {
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    } finally ex.close()
  }

  // RFC 8259-complete (control chars included): dependency-probe
  // errors are multi-line JDBC messages, and an unescaped newline
  // makes the /health body unparseable by strict probe tooling
  private def jstr(s: String): String = Json.str(s)

  private def runChecks(): Map[String, Option[String]] =
    checks.map { case (name, probe) =>
      name -> (try probe()
      catch { case scala.util.control.NonFatal(e) =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName)) })
    }

  private def healthBody(): (Int, String, String) = {
    val deps = runChecks()
    val pipelines = mgr.health
    val worst =
      if (pipelines.values.exists(_.status == Health.Unhealthy)) Health.Unhealthy
      else if (pipelines.values.exists(_.status == Health.Degraded)) Health.Degraded
      else Health.Healthy
    val depsOk = deps.values.forall(_.isEmpty)
    val status =
      if (!depsOk || worst == Health.Unhealthy) "unhealthy"
      else if (worst == Health.Degraded) "degraded"
      else "healthy"
    val code = if (status == "unhealthy") 503 else 200
    val checkJson = deps.toSeq.sortBy(_._1).map { case (name, err) =>
      jstr(name) + ":{\"healthy\":" + err.isEmpty +
        ",\"message\":" + err.map(jstr).getOrElse("null") + "}"
    }.mkString("{", ",", "}")
    val pipeJson = pipelines.toSeq.sortBy(_._1).map { case (name, r) =>
      jstr(name) + ":{\"status\":" + jstr(r.status.toString) +
        ",\"lagTier\":" + jstr(r.lagTier.toString) +
        ",\"breaker\":" + jstr(r.breakerState.toString) +
        ",\"totalRows\":" + r.totalRows + "}"
    }.mkString("{", ",", "}")
    val body = "{\"status\":" + jstr(status) +
      ",\"checks\":" + checkJson +
      ",\"pipelines\":{\"active\":" + pipelines.size +
      ",\"detail\":" + pipeJson + "}}"
    (code, body, "application/json")
  }

  private def readyBody(): (Int, String, String) = {
    val deps = runChecks()
    if (deps.values.forall(_.isEmpty)) (200, "ready", "text/plain")
    else (503, "not ready", "text/plain")
  }
}
