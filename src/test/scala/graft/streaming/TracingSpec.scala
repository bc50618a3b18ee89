package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.sources.ChangeIngest

/** Follows ONE correlation id from a wire record through the merge
  * failure it induces to the alert payload and the metrics label —
  * the end-to-end promise of the reference's tracing module
  * (src/tracing_context.rs): from any page you can walk back to the
  * record. */
class TracingSpec extends SparkSpec {

  private def counterTracing(): Tracing = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    new Tracing(() => s"id${n.incrementAndGet()}")
  }

  test("decodeTraced keeps wire trace ids and derives stable ones") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"table":"events","event_id":1,"ts":"2024-01-01 00:00:01","user_id":1,"event_type":"click","value":1.0,"trace_id":"wire-a"}""",
      """{"table":"events","event_id":2,"ts":"2024-01-01 00:00:02","user_id":2,"event_type":"view","value":2.0}""")
      .toDF("value")
    val out = ChangeIngest.decodeTraced(raw).collect().sortBy(_.event_id)
    assert(out(0).trace_id == "wire-a", "upstream id must win")
    // no upstream id → deterministic derived id (replay-stable):
    // w-<table>-<event_id>-<ts µs>
    val micros = out(1).ts.getTime * 1000L
    assert(out(1).trace_id == s"w-events-2-$micros", out(1).trace_id)
  }

  test("a poison record's id rides failure -> registry -> alert -> metrics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val tracing = counterTracing()
    val root = tracing.root("pipeline p")
    val traces = new TraceRegistry
    val in = MemoryStream[String]
    val events = ChangeIngest.decodeTraced(in.toDF().toDF("value"))
    // the poison sink: user 13's row is unmergeable (the
    // constraint-violation analog); everything else merges fine
    val target = new InMemoryCdcTarget {
      override def merge(batchId: Long, rows: Dataset[CdcApplied]): Unit = {
        if (rows.filter(_.user_id == 13L).count() > 0)
          throw new RuntimeException("constraint violated by user 13")
        super.merge(batchId, rows)
      }
    }
    val cb = new CircuitBreaker(failureThreshold = 1)
    val q = CdcStream.mergeIntoTraced("p", events, target,
      Files.createTempDirectory("graft_trace").toString,
      tracing, root, traces,
      Trigger.ProcessingTime("50 milliseconds"), breaker = Some(cb))
    try {
      in.addData(
        """{"table":"events","event_id":1,"ts":"2024-01-01 00:00:01","user_id":1,"event_type":"click","value":1.0,"trace_id":"wire-ok-1"}""")
      q.processAllAvailable()
      assert(traces.lastFailure("p").isEmpty, "clean batch must not record")

      in.addData(
        """{"table":"events","event_id":13,"ts":"2024-01-01 00:00:13","user_id":13,"event_type":"click","value":9.0,"trace_id":"wire-poison-13"}""")
      intercept[StreamingQueryException] { q.processAllAvailable() }
    } finally q.stop()

    // registry: the batch span is a child of the pipeline root and the
    // record id is the poison record's wire id
    val f = traces.lastFailure("p").getOrElse(fail("no failure recorded"))
    assert(f.firstRecordTrace.contains("wire-poison-13"))
    assert(f.ctx.traceId == root.traceId, "span left the pipeline's trace")
    assert(f.ctx.parentSpanId.contains(root.spanId))
    assert(f.ctx.operation == "merge batch=1", f.ctx.operation)
    assert(cb.state == CircuitBreaker.Open)

    // alert payload: the sweep-side observation attaches the id
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlertManager.Alert]
    val alerts = new AlertManager(delivered += _, sustainMillis = 0)
    alerts.update("p", LagListener.Danger,
      traces.lastFailure("p").flatMap(_.firstRecordTrace))
    assert(delivered.toSeq.map(a => (a.pipeline, a.kind, a.traceId)) ==
      Seq(("p", AlertManager.Triggered, Some("wire-poison-13"))))

    // metrics label: one bounded info series names the same record
    val text = Metrics.prometheusText(Metrics.failureSample("p", traces))
    assert(text.contains(
      """graft_last_failure_info{batch_id="1",pipeline="p",trace_id="wire-poison-13"} 1"""),
      text)
  }

  test("health sweep pages an open breaker with the failure's trace") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val mgr = new PipelineManager(s)
    val cb = new CircuitBreaker(failureThreshold = 1)
    val in = MemoryStream[CdcEvent]
    mgr.startCdc("swp", in.toDS(), new InMemoryCdcTarget,
      Files.createTempDirectory("graft_sweep").toString,
      Trigger.ProcessingTime("50 milliseconds"), breaker = cb)
    val traces = new TraceRegistry
    val tracing = counterTracing()
    traces.recordFailure("swp", FailureTrace(
      tracing.root("swp"), Some("wire-x"), 7L, 0L))
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlertManager.Alert]
    val alerts = new AlertManager(delivered += _, sustainMillis = 0)
    try {
      // sink down (Open breaker) must page Danger even though the lag
      // tier is clean, and the page carries the failure's record id
      cb.recordFailure()
      mgr.sweep(alerts, traces)
      assert(delivered.toSeq.map(a => (a.tier, a.traceId)) ==
        Seq((LagListener.Danger, Some("wire-x"))))
    } finally mgr.stopAll()
  }
}
