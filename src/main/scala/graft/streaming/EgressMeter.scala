package graft.streaming

import scala.collection.concurrent.TrieMap

/** Byte-denominated egress accounting — the missing metrics leg of
  * the reference's destination writer
  * (/root/reference/etl-destination/src/egress.rs:9 exports
  * `etl_processed_bytes` with destination / processing-type labels,
  * explicitly for billing). Counters are running totals per
  * (pipeline, destination, processing_type ∈ {streaming,
  * table_copy}), exported through the existing Prometheus text
  * exposition as `graft_egress_bytes_total`.
  *
  * Measurement contract (documented per writer, never a second Spark
  * pass over the batch):
  *   - [[JdbcCdcTarget]]: fixed wire width × landed row count, the
  *     count read back from the warehouse's own landing table inside
  *     the merge transaction — the bytes the destination actually
  *     received, with no re-computation of the batch subtree.
  *   - [[graft.sources.VersionedTable]]: exact on-disk bytes of the
  *     staged parquet data dir, summed after the write.
  *
  * Thread-safe (merges from concurrent pipelines land on a shared
  * meter); counters only grow, scrape deltas are the scraper's job.
  */
class EgressMeter {

  private val counters = TrieMap.empty[(String, String, String), Long]

  def add(pipeline: String, destination: String, processingType: String,
      bytes: Long): Unit = {
    val key = (pipeline, destination, processingType)
    var done = false
    while (!done) {
      counters.putIfAbsent(key, 0L)
      val cur = counters(key)
      done = counters.replace(key, cur, cur + bytes)
    }
  }

  def bytes(pipeline: String, destination: String,
      processingType: String): Long =
    counters.getOrElse((pipeline, destination, processingType), 0L)

  /** Prometheus counter series, one per labelled total. */
  def samples: Seq[Metrics.Sample] =
    counters.readOnlySnapshot().toSeq.sortBy(_._1).map {
      case ((p, d, t), v) =>
        Metrics.Sample("graft_egress_bytes_total",
          Map("pipeline" -> p, "destination" -> d, "processing_type" -> t),
          v.toDouble, "counter")
    }
}
