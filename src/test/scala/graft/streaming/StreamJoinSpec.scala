package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class JoinEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamJoinSpec extends SparkSpec {

  private def at(minutes: Long) = new Timestamp(minutes * 60000L)

  // user 1: imp@10 → click@25 (15m, in-bound) and click@55 (45m, out)
  // user 2: imp@30 → click@40 (10m, in-bound)
  // user 3: click@50 with no impression at all
  private val sample = Seq(
    JoinEvent(1, at(10), 1, "imp", 0.0),
    JoinEvent(2, at(25), 1, "click", 1.0),
    JoinEvent(3, at(55), 1, "click", 2.0),
    JoinEvent(4, at(30), 2, "imp", 0.0),
    JoinEvent(5, at(40), 2, "click", 3.0),
    JoinEvent(6, at(50), 3, "click", 4.0))

  test("streaming interval join matches the batch interval join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[JoinEvent]
    val imps = MemoryStream[JoinEvent]
    val q = StreamJoin.intervalJoin(clicks.toDF(), imps.toDF(), "click", "imp")
      .writeStream.format("memory").queryName("sj_stream")
      .outputMode("append").start()
    try {
      clicks.addData(sample: _*)
      imps.addData(sample: _*)
      q.processAllAvailable()
      val got = s.table("sj_stream")
        .selectExpr("l_id", "r_id").as[(Long, Long)].collect().toSet
      val want = StreamJoin.intervalJoin(
        sample.toDF(), sample.toDF(), "click", "imp")
        .selectExpr("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream/batch diverged: $got vs $want")
      // click@25←imp@10 and click@40←imp@30; click@55 is 45m past its
      // impression (outside the 30m lookback) and click@50 has none
      assert(got == Set((2L, 1L), (5L, 4L)))
    } finally q.stop()
  }

  test("left_outer emits null-extended unmatched clicks after the watermark closes them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[JoinEvent]
    val imps = MemoryStream[JoinEvent]
    val q = StreamJoin.intervalJoin(clicks.toDF(), imps.toDF(),
        "click", "imp", joinType = "left_outer")
      .writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      clicks.addData(sample: _*)
      imps.addData(sample: _*)
      q.processAllAvailable()
      // outer results for unmatched clicks can only be emitted once
      // the watermark passes their join-eligibility window — push it
      // far ahead on both inputs
      clicks.addData(JoinEvent(99, at(5000), 9, "click", 0.0))
      imps.addData(JoinEvent(98, at(5000), 9, "imp", 0.0))
      q.processAllAvailable()
      val got = s.table("sj_outer")
        .filter("l_id IN (2,3,5,6)")
        .selectExpr("l_id", "r_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(got == Set((2L, 1L), (5L, 4L), (3L, -1L), (6L, -1L)),
        s"unexpected outer rows: $got")
    } finally q.stop()
  }
}
