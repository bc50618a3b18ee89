package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("retries transient failures with exponential delays, then succeeds") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff(maxAttempts = 4, baseDelayMillis = 100,
      sleep = delays += _) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(delays.toSeq == Seq(100L, 200L), "exponential schedule")
  }

  test("exhausted attempts rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxAttempts = 3, sleep = _ => ()) {
        calls += 1; sys.error(s"down $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "down 3")
  }

  test("a twice-flaky merge target survives via retry without tripping the breaker") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    val s = graft.SparkSpec.session
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val fails = new java.util.concurrent.atomic.AtomicInteger(2)
    val inner = new InMemoryCdcTarget
    val flaky = new CdcTarget {
      override def merge(batchId: Long,
          rows: org.apache.spark.sql.Dataset[CdcApplied]): Unit = {
        if (fails.getAndDecrement() > 0) sys.error("transient outage")
        inner.merge(batchId, rows)
      }
    }
    val cb = new CircuitBreaker(failureThreshold = 1)
    val input = MemoryStream[CdcEvent]
    input.addData(CdcEvent(1, new Timestamp(1000), 1, "click", 1.0))
    val q = CdcStream.mergeInto(input.toDS(), flaky,
      Files.createTempDirectory("graft_retry_ckpt").toString,
      Trigger.AvailableNow(), breaker = Some(cb), mergeAttempts = 3)
    q.awaitTermination(60000)
    assert(inner.snapshot(1L).event_id == 1, "merge must land after retries")
    assert(cb.state == CircuitBreaker.Closed,
      "retried-through transients must not trip the breaker")
  }
}
