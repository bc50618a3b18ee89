package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.ReplicationState._

/** The reference's orchestration loop composes the pipeline runner
  * with the durable state store (pipeline_manager.rs drives the
  * table lifecycle persisted by store/redis_store.rs). Prove the
  * Spark-side components compose the same way: a pipeline walks its
  * table through the registry as it starts/syncs/fails, and a
  * crash-restarted registry still knows where every table was. */
class LifecycleCompositionSpec extends SparkSpec {

  private def ev(id: Long, t: Long, uid: Long, v: Double) =
    CdcEvent(id, new Timestamp(t), uid, "click", v)

  test("a managed pipeline's lifecycle lands in the durable registry across restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val url = "jdbc:derby:memory:graftlifecycle;create=true"
    val store = new ReplicationStateStore(url)
    val mgr = new PipelineManager(s)
    val input = MemoryStream[CdcEvent]
    val target = new InMemoryCdcTarget

    // init → data_sync before the stream starts
    store.update("public.events", Init, Some("wh.events"))
    store.update("public.events", DataSync)
    val p = mgr.startCdc("events_pipe", input.toDS(), target,
      Files.createTempDirectory("graft_lc").toString,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      input.addData(ev(1, 1000, 1, 1.0), ev(2, 2000, 2, 2.0))
      p.query.processAllAvailable()
      assert(target.snapshot.size == 2, "backfill must land before Ready")
      store.update("public.events", FinishedCopy)
      store.update("public.events", Ready)
      assert(store.ready == Set("public.events"))

      // health stays consultable alongside the registry
      assert(mgr.health("events_pipe").breakerState == CircuitBreaker.Closed)
    } finally mgr.stopAll()

    // a failure path records Errored with its reason
    store.update("public.broken", Errored("merge failed: target down"))

    // crash restart: a fresh registry instance over the same database
    // resumes with the full picture
    val reborn = new ReplicationStateStore(url)
    assert(reborn.get("public.events").contains(Ready))
    assert(reborn.mapping("public.events").contains("wh.events"))
    assert(reborn.get("public.broken")
      .contains(Errored("merge failed: target down")))
  }
}
