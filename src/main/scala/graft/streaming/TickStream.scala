package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Timer-driven managed work: Structured Streaming's rate source as
  * the scheduler (the reference runs its replication ticks and
  * cleanup.py sweeps on timers owned by the pipeline manager;
  * Spark-side the query scheduler IS the timer, so a tick loop gets
  * checkpointed cadence, the scoped lag listener, and the breaker
  * for free, exactly like the merge pipelines).
  *
  * The checkpoint persists ONLY the schedule position — a tick
  * carries no data — so everything `work` does must be exactly-once
  * or idempotent under ITS OWN transactional medium: a
  * [[TableFollower.tick]] is guarded by the destination manifest txn,
  * a [[graft.sources.VersionedTable.maintain]] pass is data-identical
  * by construction. A redelivered or skipped tick is therefore
  * harmless (the next one converges), which is why the rate source's
  * at-least-once delivery needs no further guard here.
  *
  * Breaker/retry contract mirrors [[CdcStream.mergeInto]]: transient
  * failures burn retry attempts inside one breaker observation; an
  * exhausted retry counts as ONE breaker failure, and an open breaker
  * fails ticks fast until the probe succeeds.
  */
object TickStream {

  def ticks(spark: SparkSession, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: Option[CircuitBreaker] = None,
      attempts: Int = 1)(work: () => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: Dataset[Row], _: Long) =>
        def run(): Unit = Retry.withBackoff(attempts)(work())
        breaker.fold(run())(_.protect(run()))
      }
      .start()
}
