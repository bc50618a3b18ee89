package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The durable drift gate wired into the managed fleet (VERDICT r11
  * item 7): a registry row reconciles into a pipeline whose
  * [[DriftGate]] is provisioned like its breaker and lag listener —
  * observed per micro-batch inside the merge query, swept into alerts
  * under `<pipeline>:drift:<type>` — and a crash-rebuilt manager over
  * the same durable store resumes PSI exactly, no bespoke wiring. */
class DriftGateCompositionSpec extends SparkSpec {

  private def ev(id: Long, t: Long, uid: Long, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, "click", v)

  test("registry → gated pipeline → crash-restart: PSI resumes, tiers sweep") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val registry = new PipelineRegistry("jdbc:derby:memory:graftgatereg;create=true")
    val storeUrl = "jdbc:derby:memory:graftgatestore;create=true"
    val checkpoint = Files.createTempDirectory("graft_gate_ckpt").toString
    registry.upsert(PipelineSpec("gated", "mem://events", "mem://target",
      checkpoint, enabled = true))

    // frozen baseline: all mass in bucket 0; the live stream lands in
    // bucket 9, so accumulated PSI must cross the Danger band
    val baseline = Map(("click", 0L) -> 100L)
    def buildGate() = DriftGate(
      new DriftStream(baseline, store = Some(new DriftStateStore(storeUrl))),
      binWidth = 10)

    val input = MemoryStream[CdcEvent]
    val target = new InMemoryCdcTarget

    val mgr = new PipelineManager(s)
    val g1 = buildGate()
    val rep = registry.reconcileGated(mgr)(_ => (input.toDS(), target, Some(g1)))
    assert(rep.started == Seq("gated") && rep.failed.isEmpty)
    val psiAfterTwo =
      try {
        input.addData(ev(1, 1000, 1, 95.0), ev(2, 2000, 2, 96.0))
        mgr.get("gated").get.query.processAllAvailable()
        assert(target.snapshot.size == 2, "merge target must still apply")
        val p = g1.stream.psi("click")
        assert(p == DriftStream.psiOf(baseline, Map(("click", 9L) -> 2L))("click"),
          "gate PSI must match the operator arithmetic on the observed cells")
        assert(g1.stream.tierOf(p) == LagListener.Danger)

        // the fleet sweep pages the gate under a pipeline-scoped key
        val seen = ArrayBuffer.empty[AlertManager.Alert]
        val alerts = new AlertManager(seen += _, sustainMillis = 0)
        mgr.sweep(alerts)
        assert(seen.exists(a => a.pipeline == "gated:drift:click" &&
          a.tier == LagListener.Danger),
          s"drift tier did not reach the alert sweep: $seen")
        p
      } finally mgr.stopAll()

    // crash: fresh gate + manager over the SAME durable store and
    // checkpoint — the reloaded histogram resumes PSI exactly
    val g2 = buildGate()
    assert(g2.stream.psi("click") == psiAfterTwo,
      "restart lost the accumulated histogram")
    val mgr2 = new PipelineManager(s)
    val rep2 = registry.reconcileGated(mgr2)(_ => (input.toDS(), target, Some(g2)))
    assert(rep2.started == Seq("gated"))
    try {
      input.addData(ev(3, 3000, 3, 97.0))
      mgr2.get("gated").get.query.processAllAvailable()
      assert(g2.stream.psi("click") ==
        DriftStream.psiOf(baseline, Map(("click", 9L) -> 3L))("click"),
        "post-restart PSI must accumulate on top of the reloaded cells")
    } finally mgr2.stopAll()
  }
}
