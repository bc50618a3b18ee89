package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

class BotDetectStreamSpec extends SparkSpec {

  private def eventsOf(dir: String) =
    graft.sources.Tables.events(spark, dir)
      .select("user_id", "ts", "event_id")

  private def batchRows(dir: String) =
    SparkEntry.queries("ev_bot_detect")(spark, dir)
      .collect().map(_.toSeq).toSet

  test("one-batch stream reproduces the batch bot report bit-identically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[BotEvent]
    val q = BotDetectStream.start(input.toDF(), "bot_stream_one")
    try {
      // deliberately shuffled arrival order within the batch — the
      // fold must sort per user before folding gaps
      val evs = eventsOf(sf).as[BotEvent].collect()
      input.addData(scala.util.Random.shuffle(evs.toSeq): _*)
      q.processAllAvailable()
      val got = s.table("bot_stream_one")
        .select("user_id", "n_gaps", "mean_gap_s", "cv2", "is_bot")
        .collect().map(_.toSeq).toSet
      assert(got == batchRows(sf),
        "single-batch stream diverged from ev_bot_detect")
    } finally q.stop()
  }

  test("incremental batches converge to the same report; stale events drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[BotEvent]
    val q = BotDetectStream.start(input.toDF(), "bot_stream_inc")
    try {
      val evs = eventsOf(sf).as[BotEvent].collect()
        .sortBy(e => (e.ts.getTime, e.event_id))
      val cut = evs.length / 2
      input.addData(evs.take(cut).toSeq: _*)
      q.processAllAvailable()
      input.addData(evs.drop(cut).toSeq: _*)
      q.processAllAvailable()
      // a duplicate replay of an old slice must be a no-op: every
      // event is at or before each user's lastUs, and equal-ts
      // replays add zero-gap rows ONLY for genuinely tied stamps —
      // use a strictly-older slice to keep the assertion exact
      val stale = evs.take(cut / 2)
        .map(e => e.copy(ts = new Timestamp(e.ts.getTime - 3600000L)))
      input.addData(stale.toSeq: _*)
      q.processAllAvailable()
      val got = s.table("bot_stream_inc")
        .groupBy("user_id")
        .agg(max(struct(col("n_gaps"), col("mean_gap_s"), col("cv2"),
          col("is_bot"))).as("last"))
        .select(col("user_id"), col("last.n_gaps"), col("last.mean_gap_s"),
          col("last.cv2"), col("last.is_bot"))
        .collect().map(_.toSeq).toSet
      assert(got == batchRows(sf),
        "incremental stream diverged from ev_bot_detect")
    } finally q.stop()
  }
}
