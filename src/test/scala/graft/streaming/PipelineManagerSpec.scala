package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class PipelineManagerSpec extends SparkSpec {

  private def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, tpe, v)

  test("two concurrent CDC pipelines merge independently with scoped metrics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val mgr = new PipelineManager(s)
    val inA = MemoryStream[CdcEvent]; val inB = MemoryStream[CdcEvent]
    val tgtA = new InMemoryCdcTarget; val tgtB = new InMemoryCdcTarget
    val pa = mgr.startCdc("src_a", inA.toDS(), tgtA,
      Files.createTempDirectory("graft_pm_a").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    val pb = mgr.startCdc("src_b", inB.toDS(), tgtB,
      Files.createTempDirectory("graft_pm_b").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      inA.addData(ev(1, 1000, 1, "click", 1.0), ev(2, 2000, 1, "view", 2.0))
      inB.addData(ev(3, 1000, 7, "signup", 5.0))
      pa.query.processAllAvailable(); pb.query.processAllAvailable()

      assert(tgtA.snapshot(1L).event_id == 2 && !tgtA.snapshot.contains(7L),
        "pipeline A merged B's data or missed its own")
      assert(tgtB.snapshot(7L).event_id == 3 && !tgtB.snapshot.contains(1L),
        "pipeline B merged A's data or missed its own")

      // scoped listeners: rows attribute to their own pipeline
      val deadline = System.currentTimeMillis() + 30000
      while ((pa.listener.totalRows < 2 || pb.listener.totalRows < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(pa.listener.totalRows >= 2 && pb.listener.totalRows >= 1)

      val h = mgr.health
      assert(h.keySet == Set("src_a", "src_b"))
      assert(h.values.forall(_.breakerState == CircuitBreaker.Closed))

      intercept[IllegalArgumentException] {
        mgr.startCdc("src_a", inA.toDS(), tgtA,
          Files.createTempDirectory("graft_pm_dup").toString)
      }
    } finally mgr.stopAll()
    assert(mgr.health.isEmpty, "stopAll must release every pipeline")
  }
}
