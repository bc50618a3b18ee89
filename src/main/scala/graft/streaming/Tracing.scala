package graft.streaming

import scala.collection.concurrent.TrieMap

/** Correlation/trace context — the reference's distributed-tracing
  * module (/root/reference/src/tracing_context.rs: trace_id + span_id
  * + parent span, minted at the operation root, children per stage,
  * carried rust → python → warehouse so one failing record's journey
  * is reconstructable from logs). Spark-first the carriers differ —
  * a pipeline root span, a child span per micro-batch merge, and a
  * per-RECORD correlation id that rides the data plane as a column —
  * but the contract is the same: from any alert or metric you can
  * walk back to the wire record that induced it.
  */
final case class TraceContext(
    traceId: String,
    spanId: String,
    parentSpanId: Option[String],
    operation: String) {
  /** tracing_context.rs:49 `to_log_string`. */
  def logString: String =
    s"[trace_id=$traceId span_id=$spanId op=$operation]"
}

/** Context factory; the id generator is injectable so specs mint
  * deterministic ids (tracing_context.rs uses uuid v4). */
class Tracing(
    newId: () => String =
      () => java.util.UUID.randomUUID().toString.replace("-", "").take(16)) {

  /** Root context for a whole pipeline (new_root analog). */
  def root(operation: String): TraceContext =
    TraceContext(newId(), newId(), None, operation)

  /** Child span inside the same trace (child analog). */
  def child(parent: TraceContext, operation: String): TraceContext =
    TraceContext(parent.traceId, newId(), Some(parent.spanId), operation)
}

/** One failed merge: the batch's span (same traceId as the pipeline
  * root), the smallest record correlation id in the batch (the
  * deterministic representative — for a poison-record batch it IS
  * the poison record's id), the batch id and failure time. */
final case class FailureTrace(
    ctx: TraceContext,
    firstRecordTrace: Option[String],
    batchId: Long,
    atMillis: Long)

/** The failing batch's spans, by pipeline — what connects a merge
  * failure to the alert it raises and the metric it labels. The
  * merge sink records here (see [[CdcStream.mergeIntoTraced]]); the
  * alert sweep and metrics scrape read. */
class TraceRegistry {

  private val failures = TrieMap.empty[String, FailureTrace]

  def recordFailure(pipeline: String, f: FailureTrace): Unit =
    failures.put(pipeline, f)

  def lastFailure(pipeline: String): Option[FailureTrace] =
    failures.get(pipeline)

  def clear(pipeline: String): Unit = failures.remove(pipeline)
}
