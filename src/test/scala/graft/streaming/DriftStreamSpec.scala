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

  test("a restarted gate resumes PSI exactly where the last committed " +
      "batch left it (durable store; re-delivery still a no-op)") {
    val s = spark
    import s.implicits._
    val url = "jdbc:derby:memory:driftstate1;create=true"
    val split = lit(QualityOps.driftSplit).cast("timestamp")
    val baseline = DriftStream.baselineOf(
      events.filter(col("ts") < split), QualityOps.driftBinWidth)
    val cur = events.filter(col("ts") >= split).as[DriftEvent].collect()
      .sortBy(e => e.ts.getTime)
    val k = cur.length / 3
    def slice(i: Int) = (i match {
      case 0 => cur.take(k)
      case 1 => cur.slice(k, 2 * k)
      case _ => cur.drop(2 * k)
    }).toSeq.toDF()

    // the uninterrupted reference run (in-memory gate, all 3 batches)
    val ref = new DriftStream(baseline)
    (0 to 2).foreach(i =>
      ref.observeBatch(slice(i), QualityOps.driftBinWidth, i.toLong))

    // durable run: batches 0,1 → CRASH (instance dropped) → restart
    // on the same database → batch 1 RE-DELIVERED (restart replays
    // the last micro-batch) must be a no-op via the reloaded durable
    // marker → batch 2
    val g1 = new DriftStream(baseline, store = Some(new DriftStateStore(url)))
    g1.observeBatch(slice(0), QualityOps.driftBinWidth, 0L)
    g1.observeBatch(slice(1), QualityOps.driftBinWidth, 1L)
    val g2 = new DriftStream(baseline, store = Some(new DriftStateStore(url)))
    assert(g2.psi == g1.psi, "restart must reload the accumulated cells")
    g2.observeBatch(slice(1), QualityOps.driftBinWidth, 1L) // re-delivery
    assert(g2.psi == g1.psi, "re-delivered batch must be a durable no-op")
    g2.observeBatch(slice(2), QualityOps.driftBinWidth, 2L)
    assert(g2.psi == ref.psi,
      "crash-restart run must end bit-identical to the uninterrupted run")
  }

  test("end-to-end durable gate: file-source stream + checkpoint + " +
      "store survive a full process restart with PSI continuity") {
    // the integration the direct-call restart spec can't prove: a
    // REAL streaming query (file source, the replayable-source shape
    // CdcStreamSpec's restart test uses), foreachBatch feeding the
    // durable gate, the query killed, and a SECOND incarnation (new
    // gate instance, same Derby db, same checkpoint) resuming — PSI
    // must end bit-identical to one uninterrupted in-memory run.
    val s = spark
    import s.implicits._
    val url = "jdbc:derby:memory:driftstate3;create=true"
    val split = lit(QualityOps.driftSplit).cast("timestamp")
    val baseline = DriftStream.baselineOf(
      events.filter(col("ts") < split), QualityOps.driftBinWidth)
    val cur = events.filter(col("ts") >= split).as[DriftEvent].collect()
      .sortBy(e => e.ts.getTime)
    val k = cur.length / 2

    val srcDir = java.nio.file.Files.createTempDirectory("graft_drift_src")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_drift_ckpt").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[DriftEvent]].schema
    def writeFile(name: String, rows: Seq[DriftEvent]): Unit =
      java.nio.file.Files.writeString(srcDir.resolve(name), rows.map(e =>
        s"""{"ts":"${e.ts}","event_type":"${e.event_type}","value":${e.value}}""")
        .mkString("\n"))
    def drain(gate: DriftStream): Unit = {
      val q = s.readStream.schema(schema).json(srcDir.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            gate.observeBatch(batch, QualityOps.driftBinWidth, id)
        }
        .start()
      q.awaitTermination(60000); ()
    }

    writeFile("a.json", cur.take(k).toSeq)
    val g1 = new DriftStream(baseline, store = Some(new DriftStateStore(url)))
    drain(g1)
    // process "crashes"; the collector lands more data while down
    writeFile("b.json", cur.drop(k).toSeq)
    val g2 = new DriftStream(baseline, store = Some(new DriftStateStore(url)))
    assert(g2.psi == g1.psi, "reborn gate must warm-load the cells")
    drain(g2) // same checkpoint: only file b flows

    val ref = new DriftStream(baseline)
    ref.observe(DriftStream.histogram(cur.toSeq.toDF(),
      QualityOps.driftBinWidth).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(g2.psi == ref.psi,
      "restarted streaming run must end bit-identical to one " +
        s"uninterrupted fold: ${g2.psi} vs ${ref.psi}")
  }

  test("a failed state commit fails the batch without any durable or " +
      "in-memory effect (retry then applies cleanly)") {
    val s = spark
    import s.implicits._
    val url = "jdbc:derby:memory:driftstate2;create=true"
    val broken = new DriftStateStore(url) {
      var fail = true
      override def commitBatch(batchId: Long,
          cells: Iterable[(String, Long, Long)]): Unit = {
        if (fail) sys.error("backend unavailable")
        super.commitBatch(batchId, cells)
      }
    }
    val gate = new DriftStream(Map(("t", 0L) -> 10L), store = Some(broken))
    val batch = Seq(("t", 5.0), ("t", 15.0)).toDF("event_type", "value")
    intercept[RuntimeException](gate.observeBatch(batch, 10, 0L))
    assert(gate.psi("t") == new DriftStream(Map(("t", 0L) -> 10L)).psi("t"),
      "failed commit must leave no in-memory effect")
    broken.fail = false
    gate.observeBatch(batch, 10, 0L) // Spark's re-delivery of batch 0
    val fresh = new DriftStream(Map(("t", 0L) -> 10L),
      store = Some(new DriftStateStore(url)))
    assert(fresh.psi == gate.psi, "retried batch must land exactly once")
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
