package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static dimension enrichment: join each micro-batch of a
  * change stream against the CURRENT contents of a dimension table
  * (the lookup-enrichment step between ingest and merge — the
  * reference resolves per-relation metadata for every batch it
  * routes, /root/reference/src/pipeline_manager.rs relation lookup;
  * here the same per-batch resolution applied to data enrichment).
  *
  * The dimension is re-read from its path INSIDE foreachBatch, once
  * per micro-batch — a plan-time static join would capture the file
  * listing when the query starts and serve a stale dimension forever
  * after an overwrite. Per-batch re-read gives read-committed
  * semantics: a dim update lands atomically between batches, never
  * half-applied within one.
  *
  * Scale: the dim side broadcasts (dimensions are small relative to
  * the stream; a 100 TB "dimension" is a fact and belongs in a
  * stream-stream or pre-bucketed join instead), so enrichment adds
  * ZERO shuffles to the micro-batch — the stream side never moves.
  */
object EnrichStream {

  /** Wrap a foreachBatch sink so every batch arrives enriched with
    * the dimension at `dimPath` (left join on `key` — stream rows
    * without a dim match pass through null-extended, they are data,
    * not errors). */
  def enrichSink(dimPath: String, key: String)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val dim = batch.sparkSession.read.parquet(dimPath)
      sink(batch.join(broadcast(dim), Seq(key), "left"), batchId)
  }
}
