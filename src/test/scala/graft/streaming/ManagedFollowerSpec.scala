package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.VersionedTable

/** Replication and table maintenance as MANAGED fleet pipelines
  * (TickStream: the rate source as the scheduler):
  *  (a) a registry row provisions a follower pipeline; replication
  *      converges, a crash-reconverged manager resumes from the
  *      destination manifests alone, and a registry disable
  *      decommissions it like any merge pipeline;
  *  (b) a poisoned destination (foreign txn) makes ticks throw,
  *      opens the breaker after its threshold, and surfaces as
  *      Unhealthy through the same health map as a dead sink;
  *  (c) a managed maintenance pipeline rescales a growing table from
  *      its byte budget without any operator call;
  *  (d) maintenance budgets live on the registry row and are re-read
  *      per pass — an operator UPDATE retunes the live pipeline with
  *      no restart (VERDICT r13 item 6).
  */
class ManagedFollowerSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val P = 8

  private def ap(uid: Long, id: Long, t: Long, v: Double) =
    CdcApplied(uid, id, new Timestamp(t), v, is_deleted = false)

  private def freshRoot(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def awaitUntil(deadlineMillis: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMillis
    while (!cond) {
      assert(System.currentTimeMillis() < end, "condition not met in time")
      Thread.sleep(100)
    }
  }

  test("registry-provisioned replication: converge, crash, reconverge") {
    val src = freshRoot("mf-src"); val dst = freshRoot("mf-dst")
    val ckpt = freshRoot("mf-ckpt")
    val upstream = new PartitionedTableCdcTarget(spark, src, P)
    upstream.merge(0, (1L to 20L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())

    val reg = new PipelineRegistry(
      "jdbc:derby:memory:mfreg;create=true", "pipes_mf")
    reg.upsert(PipelineSpec("mf_follow", source = src,
      target = dst, checkpoint = ckpt, enabled = true))
    def build(p: PipelineSpec) =
      new TableFollower(spark, p.source, p.target, "user_id", P)

    val mgr1 = new PipelineManager(s)
    assert(reg.reconcileFollower(mgr1)(build).started == Seq("mf_follow"))
    val probe = new TableFollower(spark, src, dst, "user_id", P)
    awaitUntil()(VersionedTable.versions(dst).nonEmpty &&
      probe.cursor == VersionedTable.versions(src).last)
    assert(probe.snapshot.count() == 20)

    // crash the driver-side query; a new manager reconciles from the
    // registry row and the follower resumes from the dst manifests
    mgr1.get("mf_follow").get.query.stop()
    upstream.merge(1, Seq(ap(5, 100, 90000, 5.5)).toDS())
    val mgr2 = new PipelineManager(s)
    assert(reg.reconcileFollower(mgr2)(build).started == Seq("mf_follow"))
    awaitUntil()(probe.cursor == VersionedTable.versions(src).last)
    assert(probe.snapshot.as[CdcApplied].collect()
      .find(_.user_id == 5L).exists(_.value == 5.5))

    // decommission through the registry
    reg.disable("mf_follow")
    assert(reg.reconcileFollower(mgr2)(_ => sys.error("nothing to build"))
      .stopped == Seq("mf_follow"))
    assert(mgr2.names.isEmpty)
  }

  test("a poisoned destination opens the breaker and pages Unhealthy") {
    val src = freshRoot("mf-src2"); val dst = freshRoot("mf-dst2")
    val upstream = new PartitionedTableCdcTarget(spark, src, P)
    upstream.merge(0, (1L to 5L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    val follower = new TableFollower(spark, src, dst, "user_id", P)
    follower.tick()
    // poison: a plain CdcTarget-style txn on the followed destination
    VersionedTable.commitPartitions(Map.empty, dst, batchId = 3)
    upstream.merge(1, Seq(ap(2, 100, 90000, 2.2)).toDS())

    val mgr = new PipelineManager(s)
    val breaker = new CircuitBreaker(failureThreshold = 1)
    mgr.startFollower("mf_poison", follower, freshRoot("mf-ckpt2"),
      breaker = breaker)
    try {
      awaitUntil()(breaker.state == CircuitBreaker.Open)
      assert(mgr.health("mf_poison").status == Health.Unhealthy)
    } finally mgr.stopAll()
  }

  test("managed maintenance rescales a growing table from its budget") {
    val root = freshRoot("mf-maint")
    val target = new PartitionedTableCdcTarget(spark, root, 4)
    target.merge(0, (1L to 50L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    // ceil(total/4): the seed table sits exactly AT budget (floor
    // division would put it one byte over and trigger immediately)
    val budget = VersionedTable.parts(root).values.flatten.map { rel =>
      val w = Files.walk(java.nio.file.Paths.get(root, rel))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator.asScala.filter(Files.isRegularFile(_))
          .map(Files.size(_)).sum
      } finally w.close()
    }.sum / 4 + 1

    val mgr = new PipelineManager(s)
    // keepLast is the reader grace (maintain's scaladoc): with a
    // writer merging CONCURRENTLY with 1s maintenance ticks,
    // keepLast=1 lets vacuum reclaim dirs the in-flight merge is
    // still reading (proven: FileNotFound mid-merge) — retention must
    // outlast the longest concurrent reader, exactly the Delta VACUUM
    // retention rule
    mgr.startMaintenance("mf_keep", root, "user_id",
      targetBytesPerPart = budget, keepLast = 20,
      checkpoint = freshRoot("mf-ckpt3"))
    try {
      // under budget: quiescent
      Thread.sleep(1500)
      assert(VersionedTable.partCount(root).contains(4))
      // grow 100x (tiny files are mostly footer, so the growth must
      // dominate the per-file overhead): the NEXT maintenance tick
      // must rescale on its own
      target.merge(1, (51L to 5000L)
        .map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
      awaitUntil()(VersionedTable.partCount(root).exists(_ > 4))
      assert(new PartitionedTableCdcTarget(spark, root).snapshot
        .count() == 5000, "maintenance changed table data")
    } finally mgr.stopAll()
  }

  test("registry-row budgets retune a LIVE maintenance pipeline") {
    val root = freshRoot("mf-tune")
    val target = new PartitionedTableCdcTarget(spark, root, 4)
    target.merge(0, (1L to 40L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())

    val reg = new PipelineRegistry(
      "jdbc:derby:memory:mftune;create=true", "pipes_tune")
    // generous budgets: nothing to do (files ≤ 5 per partition,
    // byte budget unbounded)
    val lax = MaintenanceConfig("user_id",
      targetBytesPerPart = Long.MaxValue, maxFilesPerPart = 5,
      keepLast = 20)
    val ckpt = freshRoot("mf-ckpt4")
    reg.upsert(PipelineSpec("mf_tune", source = root,
      target = lax.encode, checkpoint = ckpt, enabled = true))
    val mgr = new PipelineManager(s)
    assert(reg.reconcileMaintenance(mgr).started == Seq("mf_tune"))
    try {
      target.merge(1, Seq(ap(2, 100, 90000, 2.2)).toDS())
      Thread.sleep(2500) // passes run; lax budgets find nothing to do
      val quiet = VersionedTable.versions(root).last
      assert(VersionedTable.committedKinds(root)
        .forall(_ != VersionedTable.KindMaintenance),
        "lax budgets must not compact")

      // the operator retunes the ROW only — no reconcile, no restart:
      // always-over file budget (the forcing convention) makes the
      // very next pass compact
      reg.upsert(PipelineSpec("mf_tune", source = root,
        target = lax.copy(maxFilesPerPart = 0).encode,
        checkpoint = ckpt, enabled = true))
      target.merge(2, Seq(ap(3, 101, 90001, 3.3)).toDS())
      awaitUntil()(VersionedTable.committedKinds(root)
        .contains(VersionedTable.KindMaintenance))
      assert(VersionedTable.versions(root).last > quiet + 1,
        "the retuned pass must have committed a compaction")
      assert(new PartitionedTableCdcTarget(spark, root).snapshot
        .count() == 40, "maintenance changed table data")
    } finally mgr.stopAll()
  }

  test("a registry row provisions a DERIVED view; crash reconverges it") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val src = freshRoot("mf-dsrc"); val dst = freshRoot("mf-ddst")
    val ckpt = freshRoot("mf-dckpt")
    val upstream = new PartitionedTableCdcTarget(spark, src, P)
    upstream.merge(0, (1L to 20L).map(k =>
      ap(k, k, 1000 + k, if (k % 2 == 0) k.toDouble else -k.toDouble)).toDS())

    // the deployment's transform catalog: the registry row names the
    // derivation (rows are strings), the build closure resolves it —
    // reconcileFollower needs no new surface for derived views
    val catalog: Map[String, DataFrame => DataFrame] = Map(
      "positives_scored" -> (df => df.filter(col("value") > 0)
        .select(col("user_id"), (col("value") * 2).as("score"))))
    val reg = new PipelineRegistry(
      "jdbc:derby:memory:mfdreg;create=true", "pipes_mfd")
    reg.upsert(PipelineSpec("mf_view", source = src,
      target = s"$dst|positives_scored", checkpoint = ckpt, enabled = true))
    def build(p: PipelineSpec) = {
      val Array(root, name) = p.target.split('|')
      new TableFollower(spark, p.source, root, "user_id", P, catalog(name))
    }
    def viewRows(): Map[Long, Double] =
      VersionedTable.read(spark, dst).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("score")).toMap

    val mgr1 = new PipelineManager(s)
    try {
      assert(reg.reconcileFollower(mgr1)(build).started == Seq("mf_view"))
      awaitUntil()(VersionedTable.versions(dst).nonEmpty &&
        VersionedTable.read(spark, dst).count() == 10)
      assert(viewRows() == (2L to 20L by 2).map(k => k -> k * 2.0).toMap)

      // crash; a filter-crossing update lands while down; a fresh
      // manager reconciles from the row and the view reconverges
      mgr1.get("mf_view").get.query.stop()
      upstream.merge(1, Seq(ap(2, 100, 90000, -2.0),
        ap(3, 101, 90001, 3.0)).toDS())
      val mgr2 = new PipelineManager(s)
      try {
        assert(reg.reconcileFollower(mgr2)(build).started == Seq("mf_view"))
        awaitUntil()(!viewRows().contains(2L) && viewRows().contains(3L))
        assert(viewRows()(3L) == 6.0)
      } finally mgr2.stopAll()
    } finally mgr1.stopAll()
  }
}
