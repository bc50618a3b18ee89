package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.ChangeIngest

/** The full reference user story composed end to end from the public
  * surfaces: wire-format change records (the Kafka topic's file
  * stand-in) → registry-provisioned pipeline → canonical decode →
  * guarded MERGE into a real warehouse table (embedded Derby) —
  * provision with an INSERT, converge with a reconcile tick,
  * decommission with a disable. Every piece is spec-tested alone;
  * this proves they compose without glue code. */
class IngestToWarehouseSpec extends SparkSpec {

  private val derbyOpts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def rec(id: Long, ts: String, uid: Long, tpe: String,
      v: Double): String =
    s"""{"table":"events","event_id":$id,"ts":"$ts","user_id":$uid,""" +
      s""""event_type":"$tpe","value":$v}"""

  test("wire records flow through a registry-provisioned pipeline into Derby") {
    val s = spark
    import s.implicits._
    val wireDir = Files.createTempDirectory("graft_e2e_wire").toString
    Files.write(Paths.get(wireDir, "b0.jsonl"), (Seq(
      rec(1, "2024-01-01 00:00:00", 1, "click", 1.0),
      rec(2, "2024-01-01 00:00:05", 1, "view", 2.5),
      rec(3, "2024-01-01 00:00:00", 2, "error", 0.0), // tombstone op
      "junk line the decoder must drop"
    ).mkString("\n") + "\n").getBytes("UTF-8"))

    val reg = new PipelineRegistry(
      "jdbc:derby:memory:e2ereg;create=true", "pipes_e2e")
    val mgr = new PipelineManager(s)
    val target = new JdbcCdcTarget(
      "jdbc:derby:memory:e2etgt;create=true", "events_e2e", derbyOpts)
    reg.upsert(PipelineSpec("wire_to_wh", source = wireDir,
      target = "jdbc:derby:memory:e2etgt", checkpoint =
        Files.createTempDirectory("graft_e2e_ckpt").toString,
      enabled = true))
    try {
      val r = reg.reconcile(mgr) { p =>
        // the builder resolves the spec's opaque descriptors: the
        // source is the wire directory, the target the warehouse.
        // TableCdcEvent → CdcEvent: this pipeline consumes the one
        // routed table (CdcDemux is the multi-table form)
        val events = ChangeIngest.readJsonFiles(s, p.source)
          .filter(_.table == "events")
          .map(e => CdcEvent(e.event_id, e.ts, e.user_id,
            e.event_type, e.value))
        (events, target: CdcTarget)
      }
      assert(r.started == Seq("wire_to_wh"), r.toString)
      mgr.get("wire_to_wh").get.query.processAllAvailable()

      // uid 1 → latest (event 2); uid 2 → tombstoned (error op)
      val snap = target.snapshot
      assert(snap.keySet == Set(1L), s"snapshot was $snap")
      assert(snap(1L).event_id == 2 && snap(1L).value == 2.5)

      // a second landed file is picked up by the SAME running
      // pipeline — but a stale row must not regress the merge
      Files.write(Paths.get(wireDir, "b1.jsonl"), (Seq(
        rec(0, "2023-12-31 23:59:59", 1, "click", 9.9), // stale
        rec(4, "2024-01-01 00:01:00", 3, "signup", 7.0)
      ).mkString("\n") + "\n").getBytes("UTF-8"))
      mgr.get("wire_to_wh").get.query.processAllAvailable()
      val snap2 = target.snapshot
      assert(snap2(1L).event_id == 2 && snap2(1L).value == 2.5,
        "stale wire record regressed warehouse state")
      assert(snap2(3L).value == 7.0)

      // decommission via the registry, not the manager
      reg.disable("wire_to_wh")
      val r2 = reg.reconcile(mgr)(_ => sys.error("nothing should build"))
      assert(r2.stopped == Seq("wire_to_wh"), r2.toString)
      assert(mgr.names.isEmpty)
    } finally mgr.stopAll()
  }
}
