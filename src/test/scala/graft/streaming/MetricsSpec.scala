package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("prometheus text renders typed, labeled, sorted samples") {
    val listener = new LagListener() // no batches → Ok, zero counters
    val breaker = new CircuitBreaker(failureThreshold = 1)
    val text = Metrics.prometheusText(
      Metrics.snapshot("pipe\"a\"", listener, breaker))
    assert(text.contains("# TYPE graft_rows_processed_total counter"))
    assert(text.contains("# TYPE graft_lag_tier gauge"))
    assert(text.contains("""graft_rows_processed_total{pipeline="pipe\"a\""} 0"""),
      s"label escaping/zero counter wrong in:\n$text")
    assert(text.contains("""graft_breaker_state{pipeline="pipe\"a\""} 0"""))
    breaker.recordFailure() // threshold 1 → Open
    val open = Metrics.prometheusText(
      Metrics.snapshot("p", listener, breaker))
    assert(open.contains("""graft_breaker_state{pipeline="p"} 2"""))
    assert(open.contains("""graft_health_status{pipeline="p"} 2"""),
      "open breaker must export unhealthy status")
  }

  test("a live pipeline's counters surface in the scrape") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    def ev(id: Long, t: Long, uid: Long) =
      CdcEvent(id, new Timestamp(t), uid, "click", 1.0)

    val mgr = new PipelineManager(s)
    val in = MemoryStream[CdcEvent]
    val p = mgr.startCdc("scrape_me", in.toDS(), new InMemoryCdcTarget,
      Files.createTempDirectory("graft_metrics").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      in.addData(ev(1, 1000, 1), ev(2, 2000, 2), ev(3, 3000, 3))
      p.query.processAllAvailable()
      // progress events deliver async after the batch commits
      val deadline = System.currentTimeMillis() + 30000
      while (p.listener.totalRows < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)

      val samples = Metrics.snapshot(mgr, Seq("scrape_me", "absent"))
      assert(samples.map(_.name).distinct.size == 6,
        "absent pipelines must not emit samples; present ones emit all 6")
      val rows = samples.find(_.name == "graft_rows_processed_total").get
      assert(rows.value >= 3.0 && rows.labels("pipeline") == "scrape_me")
      val text = Metrics.prometheusText(samples)
      assert(text.contains("""graft_health_status{pipeline="scrape_me"} 0"""))
    } finally mgr.stopAll()
  }

  test("manager sweep drives sustained alerts from live pipeline health") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    def ev(id: Long, t: Long, uid: Long) =
      CdcEvent(id, new Timestamp(t), uid, "click", 1.0)

    val mgr = new PipelineManager(s)
    val in = MemoryStream[CdcEvent]
    // warnBatchMillis = 0: every completed batch classifies Warning, so
    // the sweep observes a genuinely unhealthy live pipeline
    val p = mgr.startCdc("laggy", in.toDS(), new InMemoryCdcTarget,
      Files.createTempDirectory("graft_sweep").toString,
      Trigger.ProcessingTime("50 milliseconds"), warnBatchMillis = 0)
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlertManager.Alert]
    var now = 0L
    val alerts = new AlertManager(delivered += _, sustainMillis = 1000,
      clock = () => now, sleep = _ => ())
    try {
      in.addData(ev(1, 1000, 1))
      p.query.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      while (p.listener.health == LagListener.Ok &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(p.listener.health == LagListener.Warning)

      mgr.sweep(alerts)              // t=0: episode opens, not sustained
      assert(delivered.isEmpty)
      now = 1000; mgr.sweep(alerts)  // sustained → one alert
      assert(delivered.map(a => (a.pipeline, a.kind)) ==
        Seq(("laggy", AlertManager.Triggered)))
    } finally mgr.stopAll()
  }
}
