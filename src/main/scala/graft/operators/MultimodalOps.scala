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

  override val ops: Seq[Op] = Seq(
    Op("mm_features", mmFeatures, Some(mmFeaturesSql)),
  )
}
