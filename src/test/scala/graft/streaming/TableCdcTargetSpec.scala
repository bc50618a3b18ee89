package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.VersionedTable

/** The [[CdcTarget]] contract proven against the transactional file
  * table: the same out-of-order / redelivery / stale-pre-delete
  * scenarios JdbcCdcTargetSpec runs against Derby, absorbed here by
  * the copy-on-write merge + manifest txn ids. */
class TableCdcTargetSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ap(uid: Long, id: Long, t: Long, v: Double,
      del: Boolean = false) =
    CdcApplied(uid, id, new Timestamp(t), v, del)

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cdctable").toString

  private def byKey(t: TableCdcTarget): Map[Long, CdcApplied] =
    t.snapshot.as[CdcApplied].collect().map(r => r.user_id -> r).toMap

  test("copy-on-write merge absorbs out-of-order, redelivery, stale pre-delete") {
    val root = freshRoot()
    val target = new TableCdcTarget(spark, root)

    target.merge(0, Seq(ap(1, 2, 2000, 2.0), ap(2, 3, 1500, 5.0)).toDS())
    assert(byKey(target)(1L).event_id == 2 && byKey(target)(2L).value == 5.0)

    // stale row for key 1 + newer delete for key 2
    val b1 = Seq(ap(1, 0, 500, 9.9), ap(2, 4, 2500, 0.0, del = true))
    target.merge(1, b1.toDS())
    val snap = byKey(target)
    assert(snap(1L).event_id == 2 && snap(1L).value == 2.0,
      "stale row regressed newer state")
    assert(!snap.contains(2L), "newer delete must tombstone the key")

    // redelivery of batch 1: the manifest txn makes it a whole-batch
    // no-op — version count must not advance either
    val vBefore = VersionedTable.versions(root).size
    target.merge(1, b1.toDS())
    assert(byKey(target) == snap, "redelivered batch changed state")
    assert(VersionedTable.versions(root).size == vBefore,
      "redelivered batch committed a new version")

    // tombstone retained: stale pre-delete row cannot resurrect
    target.merge(2, Seq(ap(2, 1, 1000, 8.8)).toDS())
    assert(!byKey(target).contains(2L),
      "stale pre-delete row resurrected a deleted key")
  }

  test("in-batch duplicates dedupe to latest-per-key") {
    val target = new TableCdcTarget(spark, freshRoot())
    target.merge(0,
      Seq(ap(1, 1, 1000, 1.0), ap(1, 5, 5000, 5.0), ap(1, 3, 3000, 3.0)).toDS())
    val snap = byKey(target)
    assert(snap(1L).event_id == 5 && snap(1L).value == 5.0)
  }

  test("mergeInto streams micro-batches end-to-end into the table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
      CdcEvent(id, new Timestamp(t), uid, tpe, v)

    val root = freshRoot()
    val target = new TableCdcTarget(spark, root)
    val input = MemoryStream[CdcEvent]
    val checkpoint = Files.createTempDirectory("graft_tbl_ckpt").toString
    val q = CdcStream.mergeInto(input.toDS(), target, checkpoint)
    try {
      input.addData(ev(1, 1000, 1, "update", 1.0), ev(2, 2000, 2, "update", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 3000, 1, "update", 3.0), ev(4, 4000, 2, "error", 0.0))
      q.processAllAvailable()
      val snap = byKey(target)
      assert(snap.keySet == Set(1L) && snap(1L).value == 3.0,
        s"stream merge end state wrong: $snap")
      // every micro-batch landed as its own atomic overwrite version
      assert(VersionedTable.versions(root).nonEmpty)
      assert(VersionedTable.committedTxns(root).nonEmpty)
    } finally q.stop()
  }
}
