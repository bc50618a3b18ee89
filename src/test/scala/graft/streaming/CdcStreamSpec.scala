package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class CdcStreamSpec extends SparkSpec {

  private def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, tpe, v)

  test("streaming CDC apply keeps latest-per-key state across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[CdcEvent]
    val q = CdcStream.latestPerKey(input.toDS())
      .writeStream.format("memory").queryName("cdc_latest")
      .outputMode("update").start()
    try {
      input.addData(ev(1, 1000, 1, "click", 1.0), ev(2, 2000, 1, "view", 2.0))
      q.processAllAvailable()
      val afterB1 = s.table("cdc_latest").as[CdcApplied].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.last }
      assert(afterB1(1L).event_id == 2 && afterB1(1L).value == 2.0)

      // an OLDER event must not displace newer state; a newer delete must
      input.addData(ev(0, 500, 1, "click", 9.9), ev(3, 3000, 2, "error", 0.0))
      q.processAllAvailable()
      val rows = s.table("cdc_latest").as[CdcApplied].collect()
      val latest1 = rows.filter(_.user_id == 1).last
      val latest2 = rows.filter(_.user_id == 2).last
      assert(latest1.event_id == 2, "stale event displaced newer state")
      assert(latest2.is_deleted, "delete op not reflected")
    } finally q.stop()
  }

  test("foreachBatch merge applies MERGE semantics into the target") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[CdcEvent]
    val target = new InMemoryCdcTarget
    val checkpoint = Files.createTempDirectory("graft_ckpt").toString
    val q = CdcStream.mergeInto(input.toDS(), target, checkpoint,
      Trigger.AvailableNow())

    input.addData(
      ev(1, 1000, 1, "click", 1.0), ev(2, 2000, 1, "view", 2.0),
      ev(3, 1500, 2, "signup", 5.0), ev(4, 2500, 3, "error", 0.0),
      ev(5, 1200, 3, "click", 7.0))
    q.processAllAvailable()
    q.awaitTermination(30000)

    val snap = target.snapshot
    assert(snap(1L).event_id == 2, "upsert should keep latest per key")
    assert(snap(2L).event_id == 3)
    assert(!snap.contains(3L), "latest DELETE must remove the key")
  }

  test("streaming latest-per-key matches the batch cdc_dedupe_latest on sf0.001") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val batchEvents = graft.sources.Tables.events(s, sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[CdcEvent].collect().toSeq
    val expected = graft.SparkEntry.queries("cdc_dedupe_latest")(s, sf)
      .selectExpr("user_id", "event_id").as[(Long, Long)].collect().toMap

    val input = MemoryStream[CdcEvent]
    val q = CdcStream.latestPerKey(input.toDS())
      .writeStream.format("memory").queryName("cdc_parity")
      .outputMode("update").start()
    try {
      // two micro-batches to prove state carries across the seal
      val (b1, b2) = batchEvents.splitAt(batchEvents.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("cdc_parity").as[CdcApplied].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.last.event_id }
      assert(got == expected, "stream state diverged from batch dedupe")
    } finally q.stop()
  }
}
