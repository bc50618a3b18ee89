package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live-tunable budgets for a managed maintenance pipeline — the
  * desired-state analog of the reference's cleanup configuration
  * (cleanup.py's retention/compaction knobs): stored on the
  * [[PipelineRegistry]] row as an opaque descriptor string, re-read
  * per maintenance pass, so an operator retunes a LIVE table's
  * budgets with one UPDATE — no restart, no redeploy.
  *
  * `keepLast` defaults to the reader-safe window (see
  * [[PipelineManager.startMaintenance]]'s grace note). */
final case class MaintenanceConfig(
    pk: String,
    targetBytesPerPart: Long = 1L << 30,
    maxFilesPerPart: Int = 1,
    keepLast: Int = 20) {
  require(pk.nonEmpty, "pk must name the table's merge key column")
  require(targetBytesPerPart > 0, "targetBytesPerPart must be positive")
  require(keepLast >= 1, "keepLast must retain at least the head version")

  /** Registry-row descriptor form (the `target` column). */
  def encode: String =
    s"pk=$pk;bytes=$targetBytesPerPart;files=$maxFilesPerPart;keep=$keepLast"
}

object MaintenanceConfig {
  /** Parse the registry-row descriptor; unknown keys are ignored so a
    * newer writer's descriptor still drives an older reconciler. */
  def decode(s: String): MaintenanceConfig = {
    val kv = s.split(";").iterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k.trim -> v.trim }.toMap
    MaintenanceConfig(
      pk = kv.getOrElse("pk",
        throw new IllegalArgumentException(
          s"maintenance descriptor '$s' lacks pk=<column>")),
      targetBytesPerPart = kv.get("bytes").map(_.toLong).getOrElse(1L << 30),
      maxFilesPerPart = kv.get("files").map(_.toInt).getOrElse(1),
      keepLast = kv.get("keep").map(_.toInt).getOrElse(20))
  }
}

/** Multi-pipeline orchestration — the pipeline-manager analog
  * (/root/reference/src/pipeline_manager.rs runs one decode→buffer→
  * merge pipeline per registered source database and the monitors
  * watch all of them): each named pipeline is a streaming CDC merge
  * with its OWN scoped lag listener and circuit breaker, and
  * `health` reports per-pipeline status the way the reference's
  * health endpoint aggregates per-source state.
  *
  * Spark-first shape: pipelines are independent StreamingQuery
  * instances sharing one session (one scheduler, shared executors);
  * per-pipeline listeners are bound to their query id because Spark
  * listeners are session-global.
  */
class PipelineManager(spark: SparkSession, stopTimeoutMillis: Long = 30000) {

  // Bound query.stop(): the default stopTimeout=0 waits indefinitely,
  // which would let one wedged pipeline block a whole reconcile tick.
  // A timed-out stop throws, and `stop` below keeps the registration
  // so the next tick retries instead of orphaning a running query.
  spark.conf.set("spark.sql.streaming.stopTimeout", s"${stopTimeoutMillis}ms")

  final case class Pipeline(
      name: String,
      query: StreamingQuery,
      listener: LagListener,
      breaker: CircuitBreaker,
      drift: Option[DriftGate] = None)

  private val pipelines = TrieMap.empty[String, Pipeline]

  /** Start a named CDC merge pipeline. Fails if the name is live;
    * restarting a DEAD name first releases its listener (listeners
    * are session-global — a replaced pipeline's listener would
    * otherwise stay registered forever). Synchronized so concurrent
    * same-name starts cannot both pass the liveness check and orphan
    * a running query. */
  /** The shared register/start/bind sequence of every start* entry
    * point: liveness check, dead-registration listener release, query
    * start with listener cleanup on a throwing builder, post-start
    * id binding (the id exists only after start(); progress events
    * are delivered async after a batch completes, so binding here
    * precedes the first event in practice — an unscoped listener
    * would merely over-count a batch from a sibling pipeline in that
    * window). One body, not three — a fix to the leak/error path
    * applies everywhere. */
  private def register(name: String, warnBatchMillis: Long,
      dangerBatchMillis: Long, breaker: CircuitBreaker,
      drift: Option[DriftGate])(
      start: LagListener => StreamingQuery): Pipeline = synchronized {
    require(!pipelines.get(name).exists(_.query.isActive),
      s"pipeline '$name' is already running")
    pipelines.remove(name).foreach(old =>
      spark.streams.removeListener(old.listener))
    val listener = new LagListener(warnBatchMillis, dangerBatchMillis)
    spark.streams.addListener(listener)
    val query =
      try start(listener)
      catch { case e: Throwable =>
        spark.streams.removeListener(listener); throw e
      }
    listener.bindTo(query.id)
    val p = Pipeline(name, query, listener, breaker, drift)
    pipelines.put(name, p)
    p
  }

  def startCdc(
      name: String,
      events: Dataset[CdcEvent],
      target: CdcTarget,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000,
      drift: Option[DriftGate] = None): Pipeline =
    register(name, warnBatchMillis, dangerBatchMillis, breaker, drift)(_ =>
      CdcStream.mergeInto(events, target, checkpoint, trigger,
        breaker = Some(breaker), drift = drift))

  /** Start a named MULTI-TABLE demux pipeline (one replication slot →
    * many table targets, the reference's per-source worker shape) —
    * same listener/breaker scoping as [[startCdc]], routed through
    * [[CdcDemux.mergeInto]]. */
  def startDemux(
      name: String,
      events: Dataset[TableCdcEvent],
      targets: Map[String, CdcTarget],
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      onUnrouted: Long => Unit = _ => (),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000): Pipeline =
    register(name, warnBatchMillis, dangerBatchMillis, breaker, None)(_ =>
      CdcDemux.mergeInto(events, targets, checkpoint, trigger,
        onUnrouted, breaker = Some(breaker)))

  /** Start a named EVOLVING pipeline — raw JSON change records merged
    * through [[SchemaEvolution.mergeEvolvingJson]]'s per-batch heal
    * into a schema-widening target. The reference's manager runs
    * drifting pipelines under the same monitors as fixed-schema ones
    * (schema self-heal is a destination property, not a pipeline
    * kind — schema_cache.rs); here likewise: same scoped lag
    * listener, breaker, and sweep surface as [[startCdc]]. */
  def startEvolving(
      name: String,
      raw: Dataset[String],
      target: EvolvingCdcTarget,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000): Pipeline =
    register(name, warnBatchMillis, dangerBatchMillis, breaker, None)(_ =>
      SchemaEvolution.mergeEvolvingJson(raw, target, checkpoint, trigger,
        breaker = Some(breaker)))

  /** Start a named REPLICATION pipeline — a [[TableFollower]] ticked
    * by [[TickStream]] under the same scoped listener/breaker/sweep
    * surface as the merge pipelines: replication joins the fleet's
    * desired-state loop instead of living in an operator's crontab.
    * Cursor state is entirely in the destination manifests, so a
    * crash-reconverged pipeline resumes exactly; a misused
    * destination (foreign txns, identity drift the follower refuses)
    * throws per tick, burns the breaker, and pages through the sweep
    * like a dead sink would. */
  def startFollower(
      name: String,
      follower: TableFollower,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000): Pipeline =
    register(name, warnBatchMillis, dangerBatchMillis, breaker, None)(_ =>
      TickStream.ticks(spark, checkpoint, trigger, Some(breaker)) { () =>
        follower.tick(); ()
      })

  /** Start a named table-MAINTENANCE pipeline: one
    * [[graft.sources.VersionedTable.maintain]] pass per tick
    * (byte-budget rescale check → partition-scoped compaction →
    * retention expiry → vacuum), managed like every other pipeline.
    * Each pass is data-identical, so tick redelivery is free.
    *
    * Idle ticks are CHEAP: a pass only runs when the table's head
    * version moved since the last one — maintenance work (file
    * counts, partition bytes) can only change with a commit, so a
    * quiet table costs one versions() listing per tick instead of an
    * O(table file count) stat walk per second.
    *
    * `keepLast` is the READER grace: vacuum only reclaims dirs
    * referenced by no retained version, so the retained window must
    * outlast the longest in-flight reader — including a concurrent
    * writer's read-merge-write pass over the same table. The default
    * (20) is sized for a merge pipeline running beside this loop;
    * keepLast=1 is safe ONLY on a quiesced table (with a live writer
    * it lets vacuum reclaim dirs an in-flight merge is still reading
    * — FileNotFound mid-merge, proven in ManagedFollowerSpec). */
  def startMaintenance(
      name: String,
      root: String,
      pk: String,
      targetBytesPerPart: Long = 1L << 30,
      maxFilesPerPart: Int = 1,
      keepLast: Int = 20,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000): Pipeline =
    startMaintenanceFrom(name, root,
      () => MaintenanceConfig(pk, targetBytesPerPart, maxFilesPerPart,
        keepLast),
      checkpoint, trigger, breaker, warnBatchMillis, dangerBatchMillis)

  /** [[startMaintenance]] with LIVE budgets: `config` is re-read at
    * every maintenance pass (not at start), so budgets stored in a
    * desired-state table ([[PipelineRegistry.reconcileMaintenance]])
    * take effect on the next pass after an operator's UPDATE — the
    * registry row is the tuning surface, exactly as the reference's
    * config table drives its cleanup job. Passes only run when the
    * table's head moved, so the config read costs nothing on idle
    * ticks. */
  def startMaintenanceFrom(
      name: String,
      root: String,
      config: () => MaintenanceConfig,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      breaker: CircuitBreaker = new CircuitBreaker(),
      warnBatchMillis: Long = 10000,
      dangerBatchMillis: Long = 30000): Pipeline =
    register(name, warnBatchMillis, dangerBatchMillis, breaker, None) { _ =>
      var lastHead = -1
      TickStream.ticks(spark, checkpoint, trigger, Some(breaker)) { () =>
        val head = graft.sources.VersionedTable.versions(root)
          .lastOption.getOrElse(-1)
        if (head != lastHead && head >= 0) {
          val cfg = config()
          val rep = graft.sources.VersionedTable.maintain(spark, root,
            cfg.pk, cfg.targetBytesPerPart, cfg.maxFilesPerPart,
            cfg.keepLast)
          // Advance past maintain's OWN commits only (rescale and
          // compaction land at most one version each; expire/vacuum
          // never commit). A head beyond that is a foreign writer's
          // commit that landed DURING the pass — leave lastHead at
          // the pre-pass head so the next tick runs another pass
          // instead of silently skipping that commit's maintenance
          // (a then-quiet table would otherwise never be compacted).
          val own = (if (rep.rescaled.isDefined) 1 else 0) +
            (if (rep.compacted.nonEmpty) 1 else 0)
          val after = graft.sources.VersionedTable.versions(root)
            .lastOption.getOrElse(head)
          lastHead = if (after > head + own) head else after
        }
      }
    }

  def get(name: String): Option[Pipeline] = pipelines.get(name)

  /** Names of every registered pipeline (live or dead — pair with
    * `get(_).exists(_.query.isActive)` for liveness). */
  def names: Set[String] = pipelines.keySet.toSet

  /** Per-pipeline health, every registered pipeline included. */
  def health: Map[String, Health.Report] =
    pipelines.view.mapValues(p => Health.check(p.listener, p.breaker)).toMap

  /** Observe every registered pipeline's current lag tier into the
    * alert manager — the reference's periodic update_status sweep
    * (alert_manager.rs:113). Call on a monitor cadence; sustained-state
    * windows, escalation, and recovery live in [[AlertManager]]. */
  def sweep(alerts: AlertManager): Unit =
    pipelines.foreach { case (name, p) =>
      alerts.update(name, p.listener.health)
      // a provisioned drift gate pages through the same sweep, keyed
      // <pipeline>:drift:<event_type> so fleet gates stay distinct
      p.drift.foreach(_.stream.sweep(alerts, scope = name))
    }

  /** [[sweep]] over the full health status (not just lag): an Open
    * breaker pages as Danger and a HalfOpen one as Warning even when
    * the lag tier is clean — the sink-down case — and each non-Ok
    * observation carries the correlation id of the pipeline's last
    * recorded merge failure, so the page names the wire record that
    * induced it (tracing_context.rs's promise, alert-side). */
  def sweep(alerts: AlertManager, traces: TraceRegistry): Unit =
    pipelines.foreach { case (name, p) =>
      val tier = Health.check(p.listener, p.breaker).status match {
        case Health.Healthy => LagListener.Ok
        case Health.Degraded => LagListener.Warning
        case Health.Unhealthy => LagListener.Danger
      }
      val trace =
        if (tier == LagListener.Ok) None
        else traces.lastFailure(name).flatMap(_.firstRecordTrace)
      alerts.update(name, tier, trace)
      p.drift.foreach(_.stream.sweep(alerts, scope = name))
    }

  /** Stop one pipeline and release its listener. The registration is
    * removed only AFTER `query.stop()` succeeds: if stop throws (e.g.
    * the bounded stopTimeout fires), the still-running query must stay
    * in the manager so a later reconcile tick retries it — removing
    * first would orphan a live query and leak its session-global
    * listener for the driver's lifetime. */
  def stop(name: String): Unit = pipelines.get(name).foreach { p =>
    p.query.stop()
    pipelines.remove(name)
    spark.streams.removeListener(p.listener)
  }

  /** Best-effort shutdown: one refusing query must not leave the
    * rest running; failed stops keep their registrations (see stop). */
  def stopAll(): Unit = pipelines.keys.foreach { n =>
    try stop(n) catch { case scala.util.control.NonFatal(_) => () }
  }
}
