package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.VersionedTable

/** Evolving pipelines under the managed fleet: a registry row
  * reconciles into a [[PipelineManager.startEvolving]] pipeline —
  * raw JSON healed per batch into a schema-widening lakehouse
  * target, with the same scoped listener/breaker/sweep surface as
  * fixed-schema pipelines — and a crash-reconverged fleet reboots the
  * pipeline against the target's restart-reloaded schema. The
  * reference manages drift-prone sources through the same
  * desired-state machinery as any other pipeline (the self-heal is a
  * destination property, schema_cache.rs). */
class EvolvingPipelineCompositionSpec extends SparkSpec {

  test("registry → evolving pipeline → drift widens → crash-reconverge keeps schema") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val registry =
      new PipelineRegistry("jdbc:derby:memory:graftevoreg;create=true")
    val root = Files.createTempDirectory("graft_evo_fleet").toString
    val checkpoint = Files.createTempDirectory("graft_evo_fleet_ck").toString
    registry.upsert(PipelineSpec("evo", "mem://raw", root,
      checkpoint, enabled = true))

    val input = MemoryStream[String]
    val t1 = new TableEvolvingCdcTarget(spark, root, numPartitions = 4)

    val mgr = new PipelineManager(s)
    val rep = registry.reconcileEvolving(mgr)(_ => (input.toDS(), t1))
    assert(rep.started == Seq("evo") && rep.failed.isEmpty)
    try {
      input.addData("""{"user_id":1,"event_id":1,"ts":1000,"v":1.5}""")
      mgr.get("evo").get.query.processAllAvailable()
      // drifted batch widens the managed target mid-stream
      input.addData("""{"user_id":2,"event_id":2,"ts":2000,"note":"n2"}""")
      mgr.get("evo").get.query.processAllAvailable()
      assert(t1.schema.get.fieldNames.toSet ==
        Set("user_id", "event_id", "ts", "v", "note"),
        "managed pipeline did not heal the drifted batch")
      // the managed pipeline reports health like any other
      assert(mgr.health.contains("evo"))
    } finally mgr.stopAll()

    // crash: fresh manager + fresh target over the same root,
    // checkpoint, and registry — one reconcile tick reconverges, and
    // the reborn target serves every column the stream ever gained
    val t2 = new TableEvolvingCdcTarget(spark, root, numPartitions = 4)
    assert(t2.schema.get.fieldNames.toSet ==
      Set("user_id", "event_id", "ts", "v", "note"),
      "restarted target forgot the evolved schema")
    val mgr2 = new PipelineManager(s)
    val rep2 = registry.reconcileEvolving(mgr2)(_ => (input.toDS(), t2))
    assert(rep2.started == Seq("evo"))
    try {
      input.addData(
        """{"user_id":1,"event_id":9,"ts":9000,"v":9.5,"note":"n9"}""")
      mgr2.get("evo").get.query.processAllAvailable()
      val snap = t2.snapshot.collect()
        .map(r => r.getAs[Long]("user_id") -> r).toMap
      assert(snap(1L).getAs[Double]("v") == 9.5 &&
        snap(1L).getAs[String]("note") == "n9" &&
        snap(2L).getAs[String]("note") == "n2" &&
        snap(2L).getAs[Any]("v") == null,
        s"post-restart merge wrong: $snap")

      // a disabled row converges to a stop on the next tick
      registry.disable("evo")
      val rep3 = registry.reconcileEvolving(mgr2)(_ => (input.toDS(), t2))
      assert(rep3.stopped == Seq("evo"), s"disable did not stop: $rep3")
      assert(!mgr2.get("evo").exists(_.query.isActive))
    } finally mgr2.stopAll()

    // manifest-level witness: the schema travelled with the commits
    val v = VersionedTable.versions(root).last
    assert(VersionedTable.manifestSchema(spark, root, v)
      .exists(_.fieldNames.toSet ==
        Set("user_id", "event_id", "ts", "v", "note")))
  }

  test("breaker opens on a persistently failing evolving target") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val failing = new EvolvingCdcTarget {
      @volatile private var cur: Option[org.apache.spark.sql.types.StructType] = None
      def schema: Option[org.apache.spark.sql.types.StructType] = cur
      def addColumns(n: Seq[org.apache.spark.sql.types.StructField]): Unit =
        cur = Some(org.apache.spark.sql.types.StructType(
          cur.map(_.fields).getOrElse(Array.empty) ++ n))
      def merge(id: Long, rows: org.apache.spark.sql.DataFrame): Unit =
        throw new RuntimeException("sink down")
    }
    val input = MemoryStream[String]
    val mgr = new PipelineManager(s)
    val breaker = new CircuitBreaker(failureThreshold = 1)
    val p = mgr.startEvolving("evobad", input.toDS(), failing,
      Files.createTempDirectory("graft_evo_bad").toString, breaker = breaker)
    try {
      input.addData("""{"user_id":1,"event_id":1,"ts":1,"v":1.0}""")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        p.query.processAllAvailable()
      }
      assert(breaker.state != CircuitBreaker.Closed,
        "exhausted merge failure must trip the managed breaker")
    } finally mgr.stopAll()
  }
}
