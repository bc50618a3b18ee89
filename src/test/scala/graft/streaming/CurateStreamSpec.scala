package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class DocEvent(doc_id: Long, lang: String, text: String, ts: Timestamp)

class CurateStreamSpec extends SparkSpec {

  private def at(minutes: Long) = new Timestamp(minutes * 60000L)

  // long fluent text clears the 0.45 floor; "spam spam …" fails on
  // uniq_ratio; doc 4 repeats doc 1's text exactly (the dup)
  private val goodText = ("the quick brown fox jumps over a lazy dog and " +
    "keeps going with plenty of distinct words to push the length " +
    "score up and the repetition penalty down across many tokens " +
    "of varied shape and size for a convincingly real document").take(500)
  private val spamText = Seq.fill(60)("spam").mkString(" ")

  private val sample = Seq(
    DocEvent(1, "en", goodText, at(10)),
    DocEvent(2, "en", spamText, at(11)),
    DocEvent(3, "en", goodText + " tail variation", at(12)),
    DocEvent(4, "en", goodText, at(13))) // exact dup of doc 1

  test("stream curation admits what the batch scorer admits, minus in-watermark dups") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[DocEvent]
    val q = CurateStream.curate(input.toDF())
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val got = s.table("curate_stream")
        .select("doc_id", "quality").as[(Long, Double)]
        .collect().toMap
      // doc 2 fails the floor; docs 1/4 share a fingerprint so exactly
      // one of them survives the in-watermark dedup
      assert(!got.contains(2L), "spam doc must fail the quality gate")
      assert(got.contains(3L))
      assert(Seq(1L, 4L).count(got.contains) == 1,
        s"exactly one of the duplicate pair may survive: $got")

      // quality values must be the BATCH scorer's, bit-for-bit
      val batch = graft.operators.TextOps.scoreQuality(sample.toDF())
        .select("doc_id", "quality").as[(Long, Double)].collect().toMap
      got.foreach { case (id, quality) =>
        assert(batch(id) == quality, s"doc $id quality drifted from batch")
      }
    } finally q.stop()
  }

  test("duplicates arriving after the watermark passes are admitted again") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[DocEvent]
    val q = CurateStream.curate(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("curate_wm")
      .outputMode("append").start()
    try {
      input.addData(DocEvent(1, "en", goodText, at(10)))
      q.processAllAvailable()
      // push the watermark far past doc 1's fingerprint state
      input.addData(DocEvent(9, "en", goodText + " watermark pusher", at(500)))
      q.processAllAvailable()
      // same content re-fetched much later: state was evicted, so it
      // re-admits — the documented contract (bounded state catches
      // duplicate STORMS; global dedup is the batch pass)
      input.addData(DocEvent(10, "en", goodText, at(510)))
      q.processAllAvailable()
      val ids = s.table("curate_wm").select("doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 9L, 10L), s"got $ids")
    } finally q.stop()
  }
}
