package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.{LagListener, WindowStreams}

case class RawEvent(ts: Timestamp, event_type: String, user_id: Long, value: Double)

class WindowStreamSpec extends SparkSpec {

  private def at(minutes: Long) = new Timestamp(minutes * 60000L)

  private val sample = Seq(
    RawEvent(at(5), "click", 1, 1.0),   // window 0h, session A
    RawEvent(at(20), "click", 1, 2.0),  // window 0h, session A (gap 15m)
    RawEvent(at(65), "view", 1, 3.0),   // window 1h, session B (gap 45m)
    RawEvent(at(70), "click", 2, 4.0))  // window 1h, user 2

  test("streaming tumbling window agg matches the batch computation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[RawEvent]
    val q = WindowStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val got = s.table("win_stream")
        .selectExpr("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val want = WindowStreams.tumblingCounts(sample.toDF())
        .collect().map(_.toSeq).toSet
      assert(got == want, "stream/batch window results diverged")
      assert(got.size == 3) // (0h,click) (1h,view) (1h,click)
    } finally q.stop()
  }

  test("streaming session window merges gap<30m events, splits on larger gaps") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[RawEvent]
    val q = WindowStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val got = s.table("sess_stream")
        .selectExpr("user_id", "n_events").as[(Long, Long)]
        .collect().sorted.toSeq
      // user 1: {5,20} one session, {65} another; user 2: {70}
      assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("watermark drops events later than the 2h bound in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[RawEvent]
    val q = WindowStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("wm_stream")
      .outputMode("append").start()
    try {
      // batch 1 establishes watermark = max(ts) - 2h = 8:00
      input.addData(RawEvent(at(600), "click", 1, 1.0)) // 10:00
      q.processAllAvailable()
      // batch 2: one event inside the watermark, one far behind it
      input.addData(
        RawEvent(at(550), "click", 2, 1.0),  // 9:10 — within bound, kept
        RawEvent(at(100), "click", 3, 1.0))  // 1:40 — beyond bound, dropped
      q.processAllAvailable()
      // advance watermark far enough to close and emit all open windows
      input.addData(RawEvent(at(2000), "click", 1, 1.0))
      q.processAllAvailable()
      val starts = s.table("wm_stream").selectExpr("window_start")
        .collect().map(_.getTimestamp(0).getTime / 60000).toSet
      assert(starts.contains(600L) && starts.contains(540L),
        s"in-bound windows missing: $starts")
      assert(!starts.contains(60L),
        s"late event beyond the watermark must be dropped: $starts")
    } finally q.stop()
  }

  test("lag listener observes batch progress and row throughput") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val listener = new LagListener(warnBatchMillis = 0)
    s.streams.addListener(listener)
    val input = MemoryStream[RawEvent]
    val q = input.toDF().writeStream.format("memory")
      .queryName("lag_probe").outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      // progress events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 30000
      while (listener.totalRows < sample.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.totalRows >= sample.size)
      assert(listener.batches.nonEmpty)
      assert(listener.warnings.nonEmpty) // 0ms threshold flags every batch
    } finally {
      q.stop()
      s.streams.removeListener(listener)
    }
  }

  test("lag listener classifies batches into warning/danger tiers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // thresholds at 0 ⇒ every batch trips that tier; MaxValue ⇒ none.
    val danger = new LagListener(warnBatchMillis = 0, dangerBatchMillis = 0)
    val warning = new LagListener(warnBatchMillis = 0, dangerBatchMillis = Long.MaxValue)
    val ok = new LagListener(warnBatchMillis = Long.MaxValue, dangerBatchMillis = Long.MaxValue)
    Seq(danger, warning, ok).foreach(s.streams.addListener)
    val input = MemoryStream[RawEvent]
    val q = input.toDF().writeStream.format("memory")
      .queryName("tier_probe").outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      while (ok.totalRows < sample.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(danger.health == LagListener.Danger && danger.totalDangers > 0)
      assert(warning.health == LagListener.Warning && warning.totalWarnings > 0
        && warning.totalDangers == 0)
      assert(ok.health == LagListener.Ok && ok.totalWarnings == 0)
    } finally {
      q.stop()
      Seq(danger, warning, ok).foreach(s.streams.removeListener)
    }
  }

  test("streaming mm decode equals the batch mm decode on the same blobs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val blobs = Seq(
      graft.operators.MediaBlob(1, "hello world".getBytes("UTF-8")),
      graft.operators.MediaBlob(2, Array.fill[Byte](1300)(7)))
    val input = MemoryStream[graft.operators.MediaBlob]
    val q = MmStream.decode(input.toDS())
      .writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    try {
      input.addData(blobs: _*)
      q.processAllAvailable()
      val got = s.table("mm_stream")
        .as[graft.operators.MediaFeatures].collect().sortBy(_.doc_id).toSeq
      val want = MmStream.decode(blobs.toDS()).collect().sortBy(_.doc_id).toSeq
      assert(got == want)
      assert(got.head.n_bytes == 11 && got(1).height == 3)
    } finally q.stop()
  }
}
