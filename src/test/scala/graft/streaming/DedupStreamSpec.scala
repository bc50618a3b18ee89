package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {

  private def doc(id: Long, t: Long, text: String) =
    StreamDoc(id, new Timestamp(t), text)

  test("streaming content-dedup drops same-fingerprint docs across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[StreamDoc]
    val q = DedupStream.dedupeByContent(input.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // cross-batch dups only: which row survives among SAME-batch
      // dups is parallelism-dependent, but committed state from an
      // earlier batch always wins over a later arrival
      input.addData(doc(1, 1000, "alpha beta"), doc(2, 2000, "gamma"))
      q.processAllAvailable()
      input.addData(
        doc(3, 3000, "alpha beta"), // cross-batch dup, inside watermark
        doc(5, 5000, "delta"))
      q.processAllAvailable()
      val ids = s.table("dedup_stream").as[StreamDoc]
        .collect().map(_.doc_id).toSet
      assert(ids == Set(1L, 2L, 5L),
        s"dups must drop within the watermark window, got $ids")
    } finally q.stop()
  }

  test("streaming survivors cover exactly the batch dedup_exact fingerprints") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // one survivor per distinct content fingerprint — the same groups
    // the batch op emits (WHICH member survives a same-batch dup
    // group is parallelism-dependent, so compare fingerprints)
    // +1000ms: an event time of exactly epoch 0 sits ON the initial
    // watermark boundary and is discarded as late
    val docs = graft.sources.Tables.documents(s, sf)
      .selectExpr("doc_id", "timestamp_millis(doc_id + 1000) AS ts", "text")
      .as[StreamDoc].collect().sortBy(_.doc_id).toSeq
    val expected = graft.SparkEntry.queries("dedup_exact")(s, sf)
      .select("fp").as[String].collect().toSet

    val input = MemoryStream[StreamDoc]
    val q = DedupStream.dedupeByContent(input.toDS(), watermark = "24 hours")
      .writeStream.format("memory").queryName("dedup_stream_parity")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("dedup_stream_parity")
        .select(md5(col("text")).as("fp")).as[String].collect()
      assert(got.length == got.distinct.length,
        "a fingerprint survived twice")
      assert(got.toSet == expected,
        "stream survivor fingerprints diverged from batch groups")
    } finally q.stop()
  }
}
