package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming corpus curation — the ingest-side twin of
  * `pipe_curate`'s quality gate + exact-dedup stages, for a LIVE
  * document feed (the "continuously arriving crawl" shape of a
  * training-data pipeline).
  *
  * Composition, all on the micro-batch plan:
  *  1. the SHARED quality scorer (TextOps.scoreQuality — the one
  *     expression txt_quality, the §H composites, and this stream all
  *     use, so batch and stream admission can never drift);
  *  2. quality floor;
  *  3. content fingerprint (md5 of raw text — the same key batch
  *     `dedup_exact` groups on) computed AFTER the gate, so rejected
  *     documents are never hashed;
  *  4. `dropDuplicatesWithinWatermark` on the fingerprint — state
  *     stays bounded by the watermark horizon while catching the
  *     duplicate storms that matter on a crawl feed (re-fetches
  *     cluster in time); the batch-side exact dedup over the full
  *     corpus remains the global guarantee.
  *
  * Stages 1-3 are stateless map-only work that scales with ingest
  * rate; only stage 4 keeps state (one fingerprint per doc within
  * the watermark, sharded by fingerprint).
  */
object CurateStream {

  /** `docs` must carry (doc_id, lang, text, ts); emits admitted docs
    * as (doc_id, lang, n_tokens, quality, fp, ts). */
  def curate(docs: DataFrame, minQuality: Double = 0.45,
      watermark: String = "1 hour"): DataFrame = {
    val scored = TextOps.scoreQuality(docs, carry = Seq("text", "ts"))
    scored
      .filter(col("quality") >= minQuality)
      .withColumn("fp", md5(col("text"))).drop("text")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "lang", "n_tokens", "quality", "fp", "ts")
  }
}
