package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** One sampled frame: source frame index, byte offset/length, and
    * the digest of the REAL byte slice. */
  case class Frame(
      doc_id: Long, frame_idx: Long, off: Long, n_bytes: Long, fp: String)

  /** One full-stride frame reduced to its scalar "luma" (byte sum —
    * the decode stub's stand-in for mean pixel luminance). */
  case class ShotFrame(doc_id: Long, frame_idx: Long, luma: Long)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  // ---- mm_frame_sample: every k-th fixed-size frame ------------------
  // The video-pipeline shape: a blob is a sequence of fixed-size
  // frames; keep every 4th. This is the 1→N batch shape a real frame
  // extractor has (mapPartitions + flatMap — decoder init once per
  // partition, multiple typed rows out per blob), and the byte
  // slicing + per-frame digest are REAL (only frame geometry is the
  // stub — 64-byte "frames" over the text-as-bytes corpus). The
  // oracle mirrors the slices with substr+md5 (pure-ascii corpus ⇒
  // byte offsets == char offsets, pinned by the mm_features spec).
  private val frameBytes = 64L
  private val sampleEvery = 4L

  private def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { batch =>
        // per-partition init point for a real frame decoder
        batch.flatMap { m =>
          val n = m.blob.length.toLong
          val nFrames = (n + frameBytes - 1) / frameBytes
          (0L until nFrames by sampleEvery).iterator.map { i =>
            val off = i * frameBytes
            val len = math.min(frameBytes, n - off)
            val slice = java.util.Arrays.copyOfRange(
              m.blob, off.toInt, (off + len).toInt)
            Frame(m.doc_id, i, off, len, md5hex(slice))
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  private val mmFrameSampleSql =
    s"""WITH f AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n,
      |    UNNEST(generate_series(0,
      |      (octet_length(encode(text)) + ${frameBytes - 1}) // $frameBytes - 1,
      |      $sampleEvery)) AS i
      |  FROM documents)
      |SELECT doc_id, i AS frame_idx, i * $frameBytes AS off,
      |  LEAST($frameBytes, n - i * $frameBytes) AS n_bytes,
      |  md5(substr(text, CAST(i * $frameBytes + 1 AS BIGINT), $frameBytes))
      |    AS fp
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---- mm_resize: blob → smaller blob with verified content ----------
  // The blob→blob transform shape (resize/transcode): emit the
  // "resized" payload's size and digest. The stub halves the blob by
  // byte truncation — a REAL slice both engines hash identically —
  // where a real deployment decodes, scales, and re-encodes at the
  // same mapPartitions boundary.
  private def mmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { batch =>
        batch.map { m =>
          val half = java.util.Arrays.copyOfRange(
            m.blob, 0, (m.blob.length + 1) / 2)
          (m.doc_id, m.blob.length.toLong, half.length.toLong, md5hex(half))
        }
      }
      .toDF("doc_id", "n_bytes", "new_bytes", "fp")
      .orderBy("doc_id")
  }

  private val mmResizeSql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  (octet_length(encode(text)) + 1) // 2 AS new_bytes,
      |  md5(substr(text, 1, (octet_length(encode(text)) + 1) // 2)) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- mm_phash_dedup: perceptual-hash-style near-dup over blobs ----
  // The §G counterpart of dedup_simhash: media near-dups (re-encoded,
  // metadata-stripped copies) share most content bytes while failing
  // the exact md5 gate of mm_dedup. Each blob fingerprints to a
  // 64-bit signature — simhash over its byte 4-grams via the SAME
  // codegen'd simhash64 expression — and candidate pairs come from
  // the SAME Manku block-triple tables, exact hamming ≤ 3 on
  // survivors. A real image pipeline swaps the byte-4-gram
  // fingerprint for pHash/aHash over DECODED pixels at exactly this
  // expression boundary (decode-then-hash is §G's declared stub
  // point); the bucketing, pair join, and verification are unchanged
  // by that swap. HASH-VERIFIED since r10 (rode simhash64's move to
  // the SQL-replayable Carter–Wegman family): the oracle hexes the
  // same bytes, chunks the same 8-char 4-grams, and replays the full
  // signature→block→pair chain via DedupOps.simhashChainSql.
  // The invariant spec additionally ties byte-identical blobs to
  // hamming-0 pairs.
  private def mmPhashDedup(spark: SparkSession, dir: String): DataFrame =
    DedupOps.simhashPairs(Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .filter(length(col("blob")) >= 4)
      .select(col("doc_id"),
        expr("simhash64(regexp_extract_all(hex(blob), '.{8}', 0))").as("sh")),
      LshWidth.simhashBlocks(spark, dir))

  private val mmPhashDedupSql: String =
    s"""WITH sh_src AS (
      |  SELECT doc_id AS id,
      |    regexp_extract_all(hex(encode(text)), '.{8}', 0) AS t
      |  FROM documents WHERE octet_length(encode(text)) >= 4),
      |${DedupOps.simhashChainSql(LshWidth.docsCountSql)}
      |SELECT a_id, b_id, hamming FROM sh_out
      |ORDER BY a_id, b_id""".stripMargin

  // ---- mm_shot_boundary: frame-delta shot segmentation --------------
  // The video shot-boundary pass (the cut detector every
  // frame-sampling pipeline runs before sampling WITHIN shots
  // instead of blindly every k frames): a blob is a frame sequence
  // (mm_frame_sample's geometry, stride 1), each frame reduces to a
  // scalar "luma" (here the byte sum — a real pipeline computes mean
  // pixel luminance from DECODED frames at this exact mapPartitions
  // boundary), and a cut is declared where the inter-frame luma jump
  // exceeds the threshold. Per video: frame count, shot count, mean
  // shot length (half-up micro), and the largest jump. max_jump and
  // the cut count COALESCE to 0 for single-frame blobs (the
  // NULLable-int trap). Luma sums are exact integers on both engines
  // (pure-ascii corpus ⇒ byte value == code point, pinned by the
  // mm_features spec).
  // Scale: frame expansion is map-only (1→N flatMap inside
  // mapPartitions); the lag window and per-doc agg ride ONE doc_id
  // shuffle; per-doc state is the frame sequence — bounded by blob
  // size, never corpus-scaled.
  private val shotFrameBytes = 64L
  private val shotJump = 320L

  private def mmShotBoundary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { batch =>
        // per-partition init point for a real frame decoder
        batch.flatMap { m =>
          val n = m.blob.length.toLong
          val nFrames = (n + shotFrameBytes - 1) / shotFrameBytes
          (0L until nFrames).iterator.map { i =>
            val off = (i * shotFrameBytes).toInt
            val end = math.min(off + shotFrameBytes, n).toInt
            var s = 0L
            var j = off
            while (j < end) { s += (m.blob(j) & 0xff); j += 1 }
            ShotFrame(m.doc_id, i, s)
          }
        }
      }.toDF()
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("jump",
        abs(col("luma") - lag(col("luma"), 1).over(byDoc)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        coalesce(sum(when(col("jump") > shotJump, lit(1L))), lit(0L))
          .as("n_cuts"),
        coalesce(max(col("jump")), lit(0L)).as("max_jump"))
      .withColumn("n_shots", col("n_cuts") + 1)
      .select(col("doc_id"), col("n_frames"), col("n_shots"),
        (expr("(2 * n_frames * 1000000 + n_shots) div (2 * n_shots)")
          .cast("double") / lit(1000000.0)).as("mean_shot_frames"),
        col("max_jump"))
      .orderBy("doc_id")
  }

  private val mmShotBoundarySql =
    s"""WITH fr AS (
      |  SELECT doc_id,
      |    UNNEST(generate_series(0,
      |      (octet_length(encode(text)) + ${shotFrameBytes - 1})
      |        // $shotFrameBytes - 1, 1)) AS i,
      |    text
      |  FROM documents),
      |lum AS (
      |  SELECT doc_id, i,
      |    CAST(list_sum(list_transform(
      |      range(1, length(substr(text,
      |        CAST(i * $shotFrameBytes + 1 AS BIGINT),
      |        $shotFrameBytes)) + 1),
      |      j -> unicode(substr(substr(text,
      |        CAST(i * $shotFrameBytes + 1 AS BIGINT),
      |        $shotFrameBytes), CAST(j AS BIGINT), 1))))
      |      AS BIGINT) AS luma
      |  FROM fr),
      |jmp AS (
      |  SELECT doc_id, i,
      |    abs(luma - LAG(luma) OVER (PARTITION BY doc_id ORDER BY i))
      |      AS jump
      |  FROM lum),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |    CAST(COALESCE(SUM(CASE WHEN jump > $shotJump THEN 1 END), 0)
      |      AS BIGINT) + 1 AS n_shots,
      |    CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump
      |  FROM jmp GROUP BY 1)
      |SELECT doc_id, n_frames, n_shots,
      |  CAST((2 * n_frames * 1000000 + n_shots) // (2 * n_shots)
      |    AS DOUBLE) / 1000000.0 AS mean_shot_frames,
      |  max_jump
      |FROM agg ORDER BY doc_id""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("mm_features", mmFeatures, Some(mmFeaturesSql)),
    Op("mm_dedup", mmDedup, Some(mmDedupSql)),
    Op("mm_frame_sample", mmFrameSample, Some(mmFrameSampleSql)),
    Op("mm_resize", mmResize, Some(mmResizeSql)),
    Op("mm_phash_dedup", mmPhashDedup, Some(mmPhashDedupSql)),
    Op("mm_shot_boundary", mmShotBoundary, Some(mmShotBoundarySql)),
  )
}
