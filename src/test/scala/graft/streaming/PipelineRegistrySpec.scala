package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class PipelineRegistrySpec extends SparkSpec {

  private def derby(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def ev(id: Long, t: Long, uid: Long, tpe: String, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, tpe, v)

  private def spec(name: String, enabled: Boolean = true) =
    PipelineSpec(name, source = s"mem://$name", target = s"tgt://$name",
      checkpoint = Files.createTempDirectory(s"graft_reg_$name").toString,
      enabled = enabled)

  test("reconcile converges the manager to the registry's desired state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val reg = new PipelineRegistry(derby("pipereg1"), "pipes1")
    val mgr = new PipelineManager(s)
    val ins = scala.collection.mutable.Map.empty[String, MemoryStream[CdcEvent]]
    val tgts = scala.collection.mutable.Map.empty[String, InMemoryCdcTarget]
    def build(p: PipelineSpec) = {
      val in = ins.getOrElseUpdate(p.name, MemoryStream[CdcEvent])
      val tgt = tgts.getOrElseUpdate(p.name, new InMemoryCdcTarget)
      (in.toDS(), tgt: CdcTarget)
    }
    try {
      // empty table → nothing to do
      val r0 = reg.reconcile(mgr)(build)
      assert(r0.started.isEmpty && r0.stopped.isEmpty && r0.failed.isEmpty)

      // two rows inserted → both start
      reg.upsert(spec("pipe_a")); reg.upsert(spec("pipe_b"))
      val r1 = reg.reconcile(mgr)(build)
      assert(r1.started == Seq("pipe_a", "pipe_b"), r1.toString)
      assert(mgr.get("pipe_a").exists(_.query.isActive))
      assert(mgr.get("pipe_b").exists(_.query.isActive))

      // a steady-state tick is a no-op (running pipelines untouched)
      val r2 = reg.reconcile(mgr)(build)
      assert(r2.started.isEmpty && r2.stopped.isEmpty, r2.toString)

      // the started pipeline actually merges
      ins("pipe_a").addData(ev(1, 1000, 1, "click", 1.0))
      mgr.get("pipe_a").get.query.processAllAvailable()
      assert(tgts("pipe_a").snapshot(1L).event_id == 1)

      // disable one → next tick stops exactly it
      reg.disable("pipe_b")
      val r3 = reg.reconcile(mgr)(build)
      assert(r3.stopped == Seq("pipe_b") && r3.started.isEmpty, r3.toString)
      assert(mgr.get("pipe_b").isEmpty)
      assert(mgr.get("pipe_a").exists(_.query.isActive))

      // a failing build lands in `failed` without blocking the fleet
      reg.upsert(spec("pipe_bad"))
      val r4 = reg.reconcile(mgr) { p =>
        if (p.name == "pipe_bad") sys.error("no such source")
        else build(p)
      }
      assert(r4.failed.keySet == Set("pipe_bad"), r4.toString)
      assert(mgr.get("pipe_a").exists(_.query.isActive))
    } finally mgr.stopAll()
  }

  test("desired state survives a driver restart: a fresh manager reconverges") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val url = derby("pipereg2")
    val reg = new PipelineRegistry(url, "pipes2")
    reg.upsert(spec("durable_pipe"))
    reg.upsert(spec("disabled_pipe", enabled = false))

    // "crash": a brand-new registry handle + manager on the same db
    val reg2 = new PipelineRegistry(url, "pipes2")
    assert(reg2.list().map(p => p.name -> p.enabled).toMap ==
      Map("durable_pipe" -> true, "disabled_pipe" -> false))
    val mgr = new PipelineManager(s)
    try {
      val r = reg2.reconcile(mgr) { _ =>
        (MemoryStream[CdcEvent].toDS(), new InMemoryCdcTarget: CdcTarget)
      }
      assert(r.started == Seq("durable_pipe"), r.toString)
      assert(mgr.get("durable_pipe").exists(_.query.isActive))
      assert(mgr.get("disabled_pipe").isEmpty)
    } finally mgr.stopAll()
  }

  test("config validation rejects bad rows at registration, and removal stops on the next tick") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val reg = new PipelineRegistry(derby("pipereg3"), "pipes3")
    intercept[IllegalArgumentException] { reg.upsert(spec("bad name!")) }
    intercept[IllegalArgumentException] {
      reg.upsert(spec("ok").copy(source = "  "))
    }
    intercept[IllegalArgumentException] { reg.disable("never_registered") }
    assert(reg.list().isEmpty, "rejected rows must not land")

    reg.upsert(spec("short_lived"))
    val mgr = new PipelineManager(s)
    try {
      reg.reconcile(mgr) { _ =>
        (MemoryStream[CdcEvent].toDS(), new InMemoryCdcTarget: CdcTarget)
      }
      assert(mgr.get("short_lived").exists(_.query.isActive))
      reg.remove("short_lived")
      val r = reg.reconcile(mgr)(_ => sys.error("nothing should build"))
      assert(r.stopped == Seq("short_lived"), r.toString)
      assert(mgr.names.isEmpty)
    } finally mgr.stopAll()
  }
}
