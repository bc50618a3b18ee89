package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StructField, StructType}

/** Streaming schema-evolution self-heal — the destination-side "add
  * missing columns, then retry" semantic of the reference
  * (/root/reference/src/schema_cache.rs; docs/data_flow.md §7),
  * applied BEFORE the merge instead of as an error-path retry: by the
  * time the target consumes a micro-batch, its schema and the batch's
  * are already reconciled, so the sink never throws on drift.
  *
  * Rules, per micro-batch (target schema wins on conflicts, exactly
  * like a warehouse destination):
  *  1. columns new in the batch widen the target
  *     (`ALTER TABLE ADD COLUMN` analog);
  *  2. columns the batch lacks are filled with typed NULLs;
  *  3. columns present in both but differently typed are cast to the
  *     target's type;
  *  4. the result is projected in target column order, so positional
  *     writers line up.
  */
object SchemaEvolution {

  /** Reconcile `batch` against the target's current schema, widening
    * the target first. Pure plan surgery — no data moves here. */
  def heal(target: EvolvingCdcTarget, batch: DataFrame): DataFrame = {
    val current = target.schema.getOrElse(StructType(Nil))
    val newCols = batch.schema.fields.toSeq
      .filterNot(f => current.exists(_.name.equalsIgnoreCase(f.name)))
    if (newCols.nonEmpty) target.addColumns(newCols)
    val widened = target.schema.getOrElse(StructType(Nil))
    val aligned = widened.fields.foldLeft(batch) { (df, f) =>
      batch.schema.find(_.name.equalsIgnoreCase(f.name)) match {
        case None => df.withColumn(f.name, lit(null).cast(f.dataType))
        case Some(b) if b.dataType != f.dataType =>
          df.withColumn(f.name, col(f.name).cast(f.dataType))
        case Some(_) => df
      }
    }
    aligned.select(widened.fieldNames.toSeq.map(col): _*)
  }

  /** Micro-batched merge of RAW JSON change records (the
    * pgoutput/wire-payload analog — where schema drift actually comes
    * from) into an evolving target. Each batch's schema is inferred
    * from its own payloads, healed against the target, then merged —
    * a mid-stream batch that gains a column widens the target and
    * keeps flowing instead of failing the sink.
    *
    * Breaker/retry order mirrors [[CdcStream.mergeInto]]: retries
    * burn INSIDE the breaker, so only an exhausted retry counts as a
    * breaker failure. The heal sits inside the retry too — it is
    * idempotent (a re-run finds no new columns), and a target whose
    * widen itself failed transiently re-heals on the retry. */
  def mergeEvolvingJson(
      raw: Dataset[String],
      target: EvolvingCdcTarget,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: Option[CircuitBreaker] = None,
      mergeAttempts: Int = 1): StreamingQuery =
    raw.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[String], batchId: Long) =>
        if (!batch.isEmpty) {
          val parsed = batch.sparkSession.read.json(batch)
          def run(): Unit = Retry.withBackoff(mergeAttempts) {
            target.merge(batchId, heal(target, parsed))
          }
          breaker.fold(run())(_.protect(run()))
        }
      }
      .start()
}

/** A merge destination whose schema can widen over the life of the
  * stream — the JDBC/warehouse `ALTER TABLE ADD COLUMN` surface
  * behind the same distributed-Dataset contract as [[CdcTarget]]. */
trait EvolvingCdcTarget extends Serializable {
  /** Current target schema; None before the first batch creates it. */
  def schema: Option[StructType]

  /** Widen the target with new columns (existing rows read as NULL —
    * the warehouse ADD COLUMN semantic). */
  def addColumns(newCols: Seq[StructField]): Unit

  /** Consume a batch already aligned to [[schema]]. */
  def merge(batchId: Long, rows: DataFrame): Unit
}

/** In-memory evolving target for specs: records every widen and every
  * merged batch; rejects a batch whose schema disagrees with the
  * current target schema (a real warehouse write would too — the spec
  * point is that healed batches never trip this). The collect() is
  * the test-only materialization of tiny batches. */
class InMemoryEvolvingTarget extends EvolvingCdcTarget {
  @volatile private var current: Option[StructType] = None
  private val widens = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
  private val merged =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Map[String, Any]])]()

  override def schema: Option[StructType] = current

  override def addColumns(newCols: Seq[StructField]): Unit = synchronized {
    widens.add(newCols.map(_.name))
    current = Some(StructType(
      current.map(_.fields).getOrElse(Array.empty[StructField]) ++ newCols))
  }

  override def merge(batchId: Long, rows: DataFrame): Unit = {
    val want = current.getOrElse(
      throw new IllegalStateException("merge before first addColumns"))
    require(rows.schema.fieldNames.sameElements(want.fieldNames),
      s"unhealed batch: ${rows.schema.fieldNames.mkString(",")} vs " +
        s"target ${want.fieldNames.mkString(",")}")
    val names = want.fieldNames.toSeq
    merged.add(batchId -> rows.collect().toSeq
      .map(r => names.map(n => n -> r.getAs[Any](n)).toMap))
  }

  def widenLog: Seq[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    widens.asScala.toSeq
  }

  def mergedRows: Seq[(Long, Seq[Map[String, Any]])] = {
    import scala.jdk.CollectionConverters._
    merged.asScala.toSeq
  }
}
