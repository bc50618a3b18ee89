package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class CdcDemuxSpec extends SparkSpec {

  private def ev(tbl: String, id: Long, t: Long, uid: Long, tpe: String,
      v: Double) = TableCdcEvent(tbl, id, new Timestamp(t), uid, tpe, v)

  test("one multiplexed stream routes each table to its own merge target") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[TableCdcEvent]
    val orders = new InMemoryCdcTarget
    val users = new InMemoryCdcTarget
    val unrouted = new AtomicLong(0)
    val q = CdcDemux.mergeInto(input.toDS(),
      Map("orders" -> orders, "users" -> users),
      Files.createTempDirectory("graft_demux").toString,
      Trigger.ProcessingTime("50 milliseconds"), unrouted.addAndGet)

    input.addData(
      // commit-order interleaving, exactly like one replication slot
      ev("orders", 1, 1000, 1, "click", 1.0),
      ev("users", 2, 1500, 1, "signup", 5.0),
      ev("orders", 3, 2000, 1, "view", 2.0),   // newer for orders key 1
      ev("users", 4, 2500, 2, "error", 0.0),   // delete for users key 2
      ev("audit", 5, 3000, 9, "click", 3.0))   // no registered target
    try q.processAllAvailable() finally q.stop()

    // each target sees only its table, deduped to latest-per-key
    assert(orders.snapshot.keySet == Set(1L))
    assert(orders.snapshot(1L).event_id == 3,
      "orders must keep the newer of its two key-1 events")
    assert(users.snapshot.keySet == Set(1L))
    assert(users.snapshot(1L).event_id == 2)
    // the users DELETE landed as a tombstone, not in users' live
    // snapshot, and never leaked into orders
    assert(!users.snapshot.contains(2L))
    assert(unrouted.get() == 1, "the unregistered table's event is counted")
    // both targets merged the same batch ids (one slot, one schedule)
    assert(orders.batchesMerged == users.batchesMerged)
  }

  test("per-table sequence guards stay independent across the demux") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[TableCdcEvent]
    val a = new InMemoryCdcTarget
    val b = new InMemoryCdcTarget
    val q = CdcDemux.mergeInto(input.toDS(), Map("a" -> a, "b" -> b),
      Files.createTempDirectory("graft_demux2").toString,
      Trigger.ProcessingTime("50 milliseconds"))

    try {
      input.addData(ev("a", 10, 5000, 7, "click", 1.0),
        ev("b", 11, 1000, 7, "click", 2.0))
      q.processAllAvailable()
      // a LATE event for table b, key 7 — newer than b's state even
      // though table a's key 7 is far ahead: the guard is per (table, key)
      input.addData(ev("b", 12, 2000, 7, "view", 3.0),
        ev("a", 13, 1500, 7, "view", 9.0)) // stale for a: must be rejected
      q.processAllAvailable()
    } finally q.stop()

    assert(a.snapshot(7L).event_id == 10, "a's newer state must survive")
    assert(b.snapshot(7L).event_id == 12, "b must advance independently")
  }
}
