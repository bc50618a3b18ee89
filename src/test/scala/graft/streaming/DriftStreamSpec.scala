package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.operators.QualityOps
import graft.streaming.LagListener.{Danger, Ok, Warning}

case class DriftEvent(ts: Timestamp, event_type: String, value: Double)

class DriftStreamSpec extends SparkSpec {

  private def events =
    graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"))

  /** Batch dq_drift rows as (type -> (psi, drifted)). */
  private def batchDrift: Map[String, (Double, Int)] =
    SparkEntry.queries("dq_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getInt(5))).toMap

  test("stream PSI over the current slice is bit-identical to dq_drift") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val split = lit(QualityOps.driftSplit).cast("timestamp")
    val baseline = DriftStream.baselineOf(
      events.filter(col("ts") < split), QualityOps.driftBinWidth)
    val gate = new DriftStream(baseline)
    val cur = events.filter(col("ts") >= split).as[DriftEvent].collect()
      .sortBy(e => e.ts.getTime)
    val input = MemoryStream[DriftEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        gate.observeBatch(batch, QualityOps.driftBinWidth, id)
        // Spark re-delivers the last micro-batch on failure/restart:
        // the gate must treat a repeated batchId as a no-op (the
        // accumulated histogram is add-only in-memory state)
        gate.observeBatch(batch, QualityOps.driftBinWidth, id)
      }
      .queryName("drift_gate").start()
    try {
      // three micro-batches — accumulation must be batch-cut-invariant
      val k = cur.length / 3
      input.addData(cur.take(k).toSeq: _*)
      q.processAllAvailable()
      input.addData(cur.slice(k, 2 * k).toSeq: _*)
      q.processAllAvailable()
      input.addData(cur.drop(2 * k).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = batchDrift
    val got = gate.psi
    assert(got.keySet == batch.keySet, "type alphabets diverged")
    got.foreach { case (t, p) =>
      assert(p == batch(t)._1, s"$t: stream psi $p != batch ${batch(t)._1}")
      // the gate's Warning band IS the batch drifted flag
      assert((gate.tierOf(p) != Ok) == (batch(t)._2 == 1),
        s"$t: tier band disagrees with batch drifted flag")
    }
  }

  test("tier bands: stable Ok, drifting Warning, collapsed Danger") {
    // hand-built histograms: identical ⇒ PSI ~ 0 (Ok); mass shifted
    // one bin over ⇒ Warning; all mass teleported to a new bin ⇒
    // Danger. Bands are the industry 0.1 / 0.25 cuts.
    val base = Map(("t", 0L) -> 80L, ("t", 1L) -> 20L)
    val same = new DriftStream(base)
    same.observe(Seq(("t", 0L, 80L), ("t", 1L, 20L)))
    assert(same.tierOf(same.psi("t")) == Ok)
    val shifted = new DriftStream(base)
    shifted.observe(Seq(("t", 0L, 65L), ("t", 1L, 35L)))
    assert(shifted.tierOf(shifted.psi("t")) == Warning)
    val collapsed = new DriftStream(base)
    collapsed.observe(Seq(("t", 5L, 100L)))
    assert(collapsed.tierOf(collapsed.psi("t")) == Danger)
  }
}
