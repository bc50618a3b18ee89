package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.FunnelStream.{FunnelEvent, FunnelResult}

class FunnelStreamSpec extends SparkSpec {

  private def at(minutes: Long) = new Timestamp(minutes * 60000L)

  test("streaming funnel emits the batch-rule result when a user goes quiet") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[FunnelEvent]
    // watermark (disorder bound) must cover the cross-batch lateness
    // below — view@20 arrives after batch 1 already saw ts 40
    val q = FunnelStream.funnel(input.toDS(),
        watermark = "2 hours", quietGap = "10 minutes")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // user 1 completes all three stages — with the view arriving in
      // a LATER batch than the purchase (cross-batch disorder an
      // incremental min-update would mis-fold)
      input.addData(
        FunnelEvent(1, at(10), "signup"),
        FunnelEvent(1, at(40), "purchase"),
        FunnelEvent(2, at(15), "view")) // user 2: view but no signup
      q.processAllAvailable()
      input.addData(
        FunnelEvent(1, at(20), "view"),
        FunnelEvent(3, at(30), "signup")) // user 3 stops at stage 1
      q.processAllAvailable()
      // nothing may emit while users are still inside the quiet gap
      assert(s.table("funnel_stream").count() == 0)
      // a far-future event pushes the watermark past every timeout
      input.addData(FunnelEvent(9, at(10000), "signup"))
      q.processAllAvailable()
      val got = s.table("funnel_stream").as[FunnelResult]
        .collect().sortBy(_.user_id).toSeq
      val want = Seq(
        FunnelResult(1, at(10), Some(at(20)), Some(at(40)), 3),
        FunnelResult(3, at(30), None, None, 1))
      assert(got == want, s"stream funnel diverged: $got")
    } finally q.stop()
  }

  test("fold rule: stage k must be strictly after stage k-1") {
    import FunnelStream.microsTs
    // view at the same instant as signup does not count (strict >)
    assert(FunnelStream.foldFunnel(1,
      Seq((100L, "signup"), (100L, "view"), (200L, "purchase")))
      .contains(FunnelResult(1, microsTs(100), None, None, 1)))
    // purchase before the qualifying view does not count
    assert(FunnelStream.foldFunnel(2,
      Seq((100L, "signup"), (300L, "view"), (200L, "purchase")))
      .contains(FunnelResult(2, microsTs(100),
        Some(microsTs(300)), None, 2)))
    // no signup → no funnel row at all
    assert(FunnelStream.foldFunnel(3, Seq((100L, "view"))).isEmpty)
    // micros round-trip: sub-millisecond instants stay distinct
    assert(FunnelStream.epochMicros(microsTs(1234567L)) == 1234567L)
  }
}
