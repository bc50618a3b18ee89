package graft.streaming

/** Exportable metrics snapshot — the Prometheus surface of the
  * reference (/root/reference/src/metrics.rs exposes
  * `etl_throughput_rows` et al. in text exposition format): one
  * point-in-time scrape over the per-pipeline monitors, rendered as
  * Prometheus text so any scraper/agent can consume the counters the
  * [[LagListener]] already maintains.
  *
  * Counters are running totals (scrape-to-scrape deltas are the
  * scraper's job, as with any Prometheus counter); tiers and breaker
  * states export as enum-valued gauges.
  */
object Metrics {

  /** One sample: metric name, label pairs, value, and Prometheus
    * metric type ("counter" / "gauge"). */
  final case class Sample(
      name: String, labels: Map[String, String], value: Double, kind: String)

  private def tierValue(t: LagListener.Tier): Double = t match {
    case LagListener.Ok => 0.0
    case LagListener.Warning => 1.0
    case LagListener.Danger => 2.0
  }

  private def breakerValue(s: CircuitBreaker.State): Double = s match {
    case CircuitBreaker.Closed => 0.0
    case CircuitBreaker.HalfOpen => 1.0
    case CircuitBreaker.Open => 2.0
  }

  private def statusValue(s: Health.Status): Double = s match {
    case Health.Healthy => 0.0
    case Health.Degraded => 1.0
    case Health.Unhealthy => 2.0
  }

  /** Snapshot one pipeline's monitors. */
  def snapshot(pipeline: String, listener: LagListener,
      breaker: CircuitBreaker): Seq[Sample] = {
    val l = Map("pipeline" -> pipeline)
    val report = Health.check(listener, breaker)
    Seq(
      Sample("graft_rows_processed_total", l, listener.totalRows.toDouble,
        "counter"),
      Sample("graft_batches_warning_total", l, listener.totalWarnings.toDouble,
        "counter"),
      Sample("graft_batches_danger_total", l, listener.totalDangers.toDouble,
        "counter"),
      Sample("graft_lag_tier", l, tierValue(listener.health), "gauge"),
      Sample("graft_breaker_state", l, breakerValue(breaker.state), "gauge"),
      Sample("graft_health_status", l, statusValue(report.status), "gauge"))
  }

  /** Snapshot every pipeline registered with a [[PipelineManager]]. */
  def snapshot(manager: PipelineManager, names: Seq[String]): Seq[Sample] =
    names.flatMap(n => manager.get(n).toSeq.flatMap(p =>
      snapshot(p.name, p.listener, p.breaker)))

  /** Info-style gauge carrying the pipeline's last merge-failure
    * correlation id as a label (`graft_last_failure_info{pipeline,
    * trace_id, batch_id} 1`) — the metrics leg of the trace contract.
    * Cardinality stays bounded: ONE series per pipeline (the label
    * value is overwritten by the next failure, like a build_info
    * gauge), never one per failure. */
  def failureSample(pipeline: String, traces: TraceRegistry): Seq[Sample] =
    traces.lastFailure(pipeline).toSeq.map { f =>
      Sample("graft_last_failure_info",
        Map("pipeline" -> pipeline,
          "trace_id" -> f.firstRecordTrace.getOrElse(f.ctx.traceId),
          "batch_id" -> f.batchId.toString),
        1.0, "gauge")
    }

  /** Render samples in Prometheus text exposition format: `# TYPE`
    * headers grouped per metric, `name{label="v"} value` lines.
    * Label values are escaped per the exposition spec. */
  def prometheusText(samples: Seq[Sample]): String = {
    def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def fmt(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString
      else String.format(java.util.Locale.ROOT, "%s", Double.box(d))
    val byName = samples.groupBy(_.name).toSeq.sortBy(_._1)
    byName.map { case (name, ss) =>
      val header = s"# TYPE $name ${ss.head.kind}"
      val lines = ss.map { s =>
        val labels =
          if (s.labels.isEmpty) ""
          else s.labels.toSeq.sorted
            .map { case (k, v) => s"""$k="${esc(v)}"""" }
            .mkString("{", ",", "}")
        s"$name$labels ${fmt(s.value)}"
      }
      (header +: lines).mkString("\n")
    }.mkString("", "\n", "\n")
  }
}
