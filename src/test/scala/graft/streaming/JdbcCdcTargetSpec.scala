package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The [[CdcTarget]] contract proven against a real database (embedded
  * Derby), not the in-memory map: out-of-order rows, redelivered
  * batches, and tombstone guards are absorbed by the warehouse-side
  * landing→staging→MERGE SQL. */
class JdbcCdcTargetSpec extends SparkSpec {

  private val derbyOpts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def ap(uid: Long, id: Long, t: Long, v: Double,
      del: Boolean = false) =
    CdcApplied(uid, id, new Timestamp(t), v, del)

  test("guarded MERGE absorbs out-of-order rows, redelivery, and stale pre-delete") {
    val s = spark
    import s.implicits._
    val target = new JdbcCdcTarget(
      "jdbc:derby:memory:jdbctgt1;create=true", "events_tgt", derbyOpts)

    target.merge(0, Seq(ap(1, 2, 2000, 2.0), ap(2, 3, 1500, 5.0)).toDS())
    assert(target.snapshot(1L).event_id == 2)
    assert(target.snapshot(2L).value == 5.0)

    // batch 1: a STALE row for key 1 (older sequence, late data) and a
    // newer delete for key 2 — the database's guard must reject the
    // first and apply the second
    val b1 = Seq(ap(1, 0, 500, 9.9), ap(2, 4, 2500, 0.0, del = true))
    target.merge(1, b1.toDS())
    val snap = target.snapshot
    assert(snap(1L).event_id == 2 && snap(1L).value == 2.0,
      "stale row regressed newer state")
    assert(!snap.contains(2L), "newer delete must tombstone the key")

    // redelivery of batch 1 (the at-least-once restart replay): same
    // end state, no duplicate-key or merge-cardinality error
    target.merge(1, b1.toDS())
    assert(target.snapshot == snap, "redelivered batch changed state")

    // the tombstone is retained (not removed), so a stale pre-delete
    // row arriving later is still rejected by the sequence guard
    target.merge(2, Seq(ap(2, 1, 1000, 8.8)).toDS())
    assert(!target.snapshot.contains(2L),
      "stale pre-delete row resurrected a deleted key")

    assert(target.landingRows == 0, "landing table not purged after merge")
  }

  test("landing dedupe keeps latest-per-key when a batch carries duplicates") {
    val s = spark
    import s.implicits._
    // mergeInto dedupes before the target, but the target's own rn=1
    // landing dedupe must hold for direct (non-stream) loads too
    val target = new JdbcCdcTarget(
      "jdbc:derby:memory:jdbctgt2;create=true", "events_tgt", derbyOpts)
    target.merge(0,
      Seq(ap(1, 1, 1000, 1.0), ap(1, 5, 5000, 5.0), ap(1, 3, 3000, 3.0)).toDS())
    assert(target.snapshot(1L).event_id == 5 && target.snapshot(1L).value == 5.0)
  }

  test("mergeInto streams micro-batches end-to-end into Derby") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
      CdcEvent(id, new Timestamp(t), uid, tpe, v)

    val target = new JdbcCdcTarget(
      "jdbc:derby:memory:jdbctgt3;create=true", "events_tgt", derbyOpts)
    val input = MemoryStream[CdcEvent]
    val checkpoint = Files.createTempDirectory("graft_jdbc_ckpt").toString
    // data lands BEFORE start: AvailableNow snapshots the available
    // offsets at query start, so later addData may never be processed
    input.addData(
      ev(1, 1000, 1, "click", 1.0), ev(2, 2000, 1, "view", 2.0),
      ev(3, 1500, 2, "signup", 5.0), ev(4, 2500, 3, "error", 0.0))
    val q = CdcStream.mergeInto(input.toDS(), target, checkpoint,
      Trigger.AvailableNow())
    q.processAllAvailable()
    q.awaitTermination(30000)

    val snap = target.snapshot
    assert(snap(1L).event_id == 2, "upsert should keep latest per key")
    assert(snap(2L).event_id == 3)
    assert(!snap.contains(3L), "latest DELETE must tombstone the key")
    assert(target.landingRows == 0)
  }
}
