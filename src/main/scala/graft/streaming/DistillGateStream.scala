package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming twin of the distilled quality gate — serving the model
  * `txt_quality_distill` trains (reference analog: the scorer a
  * curation service runs on its LIVE feed after the offline
  * train/eval loop blesses a checkpoint).
  *
  * The model is a frozen [[TextOps.DistillModel]]: integer
  * micro-weights plus the train-time scaler bounds, so the stream
  * score of a document is BIT-IDENTICAL to what the batch training
  * frame scored for it (the spec pins this) — a gate whose serving
  * path drifts from its training path silently re-biases the corpus.
  *
  * Stateless map-only work on the micro-batch plan: no watermark, no
  * state store, scales with ingest rate. Compose ahead of
  * CurateStream's fingerprint dedup when both gates are wanted.
  */
object DistillGateStream {

  /** `docs` must carry `text` (plus any passthrough columns); emits
    * admitted docs with their `pq`/`p` scores attached. */
  def gate(docs: DataFrame, m: TextOps.DistillModel): DataFrame =
    TextOps.distillScore(docs, m).filter(col("admitted"))
}
