package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** One document arriving on the ingest stream. */
case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming exact-dedup — the ingest-side twin of the batch
  * `dedup_exact` operator: an arriving document is dropped if a
  * document with the same content fingerprint (md5, the same key the
  * batch op groups on) was already seen within the watermark window.
  *
  * State is the fingerprint set, hash-partitioned by fp in the state
  * store — no reshuffle across micro-batches, and the watermark
  * bounds state size (an unbounded exact-dedup over an infinite
  * stream cannot exist; the batch op is the full-corpus complement).
  */
object DedupStream {

  def dedupeByContent(
      docs: Dataset[StreamDoc],
      watermark: String = "1 hour"): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "ts", "text")
      .as[StreamDoc]
  }
}
