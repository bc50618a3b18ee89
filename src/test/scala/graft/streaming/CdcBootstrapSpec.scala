package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.ReplicationState._

class CdcBootstrapSpec extends SparkSpec {

  private def derby(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def snap(uid: Long, id: Long, t: Long, v: Double) =
    CdcApplied(uid, id, new Timestamp(t), v, is_deleted = false)

  private def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, tpe, v)

  test("snapshot copy then stream: phases walk init→ready, overlap reconciles") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val registry = new ReplicationStateStore(derby("boot1"))
    val target = new InMemoryCdcTarget

    // snapshot at copy time: keys 1..3; key 3's change raced the copy
    // (the snapshot already reflects event 30)
    CdcBootstrap.copy("public.events", Seq(
      snap(1, 10, 1000, 1.0), snap(2, 20, 2000, 2.0),
      snap(3, 30, 3000, 3.0)).toDS(), target, registry)
    assert(registry.get("public.events").contains(FinishedCopy))
    assert(target.snapshot.keySet == Set(1L, 2L, 3L))

    val input = MemoryStream[CdcEvent]
    val q = CdcBootstrap.stream("public.events", input.toDS(), target,
      registry, Files.createTempDirectory("boot1").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    assert(registry.get("public.events").contains(Ready))
    try {
      input.addData(
        ev(30, 3000, 3, "view", 3.0),  // redelivered: snapshot has it
        ev(25, 2500, 2, "view", 9.9),  // STALE vs snapshot? no — newer
        ev(5, 500, 1, "click", 0.5),   // stale vs snapshot: rejected
        ev(40, 4000, 4, "signup", 4.0)) // brand-new key
      q.processAllAvailable()
    } finally q.stop()

    val end = target.snapshot
    assert(end(1L).event_id == 10, "pre-snapshot event must not regress key 1")
    assert(end(2L).event_id == 25, "newer change must advance key 2")
    assert(end(3L).event_id == 30, "racing redelivery must be idempotent")
    assert(end(4L).event_id == 40, "new key must stream in")
  }

  test("streaming refuses a table whose copy never finished; errored copy recorded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val registry = new ReplicationStateStore(derby("boot2"))
    val failing = new CdcTarget {
      override def merge(id: Long, rows: org.apache.spark.sql.Dataset[CdcApplied])
        : Unit = throw new RuntimeException("warehouse down")
    }
    intercept[RuntimeException] {
      CdcBootstrap.copy("public.orders", Seq(snap(1, 10, 1000, 1.0)).toDS(),
        failing, registry)
    }
    registry.get("public.orders") match {
      case Some(Errored(reason)) => assert(reason.contains("warehouse down"))
      case other => fail(s"expected Errored, got $other")
    }

    val input = MemoryStream[CdcEvent]
    val err = intercept[IllegalArgumentException] {
      CdcBootstrap.stream("public.orders", input.toDS(),
        new InMemoryCdcTarget, registry,
        Files.createTempDirectory("boot2").toString)
    }
    assert(err.getMessage.contains("errored"))

    // a crash-restarted registry still refuses: the phase is durable
    val reborn = new ReplicationStateStore(derby("boot2"))
    assert(reborn.get("public.orders").exists(_.isInstanceOf[Errored]))
  }
}
