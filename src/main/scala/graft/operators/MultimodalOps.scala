package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A media blob row: opaque binary content + its id. At 100 TB the
  * blob column is the image/audio/video payload; here it's the
  * utf-8 document text standing in as bytes. */
case class MediaBlob(doc_id: Long, blob: Array[Byte])

/** Typed features "decoded" from a blob. */
case class MediaFeatures(
    doc_id: Long, n_bytes: Long, width: Long, height: Long,
    channels: Long, brightness: Double)

/** Multimodal plumbing (SURVEY §G): binary columns flow through a
  * typed Dataset and are processed per-partition in batches — the
  * Spark-side shape (schema, partitioning, iterator batching) is
  * real; only the innermost decode is a STUB.
  *
  * Real deployments swap `decodeStub` for an actual media decoder
  * (libjpeg/ffmpeg via JNI, or an Arrow-batched Python UDF); the
  * mapPartitions boundary is exactly where that library would be
  * initialized once per partition rather than once per row.
  */
object MultimodalOps extends Suite {

  /** STUB DECODER — deterministic fake. Derives "image" dimensions
    * and a "brightness" purely from the byte count so the DuckDB
    * oracle can mirror it. No real media bytes are interpreted. */
  private[graft] def decodeStub(m: MediaBlob): MediaFeatures = {
    val n = m.blob.length.toLong
    MediaFeatures(
      doc_id = m.doc_id,
      n_bytes = n,
      width = n % 640,
      height = n / 640 + 1,
      channels = 3L,
      brightness = ((n * 7919) % 256).toDouble / 255.0)
  }

  // ---- mm_features: blob → typed features ---------------------------
  private def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { batch =>
        // per-partition init point for a real decoder goes here
        batch.map(decodeStub)
      }
      .toDF()
      .orderBy("doc_id")
  }

  private val mmFeaturesSql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  octet_length(encode(text)) % 640 AS width,
      |  octet_length(encode(text)) // 640 + 1 AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST((octet_length(encode(text)) * 7919) % 256 AS DOUBLE) / 255.0 AS brightness
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- mm_dedup: binary-content exact dedup -------------------------
  // The §G counterpart of dedup_exact: media pipelines dedupe on a
  // content hash of the RAW BYTES (re-crawled/re-hosted images are
  // byte-identical far more often than their metadata suggests). One
  // hash aggregation over md5(blob) — map-side combined, no blob ever
  // shuffles beyond its 16-byte digest at 100 TB (project the digest
  // BEFORE the exchange, as here).
  private def mmDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_blobs"), min(col("doc_id")).as("keep_id"))
      .orderBy("fp")

  // DuckDB's md5 takes VARCHAR only; the corpus is pure ascii (the
  // mm_features spec pins n_bytes == n_chars), so md5(text) hashes
  // the identical bytes the Spark side's md5(encode(text,'UTF-8'))
  // sees
  private val mmDedupSql =
    """SELECT md5(text) AS fp, COUNT(*) AS n_blobs,
      |  MIN(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("mm_features", mmFeatures, Some(mmFeaturesSql)),
    Op("mm_dedup", mmDedup, Some(mmDedupSql)),
  )
}
