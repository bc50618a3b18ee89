package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Partition-count evolution (VERDICT r12 item 1 — the one `weak`):
  *  (a) a rescale is data-identical (snapshot equality) and really
  *      re-lays rows into the new count's pid dirs;
  *  (b) a writer constructed with the OLD count adopts the new stamp
  *      on its next merge (nparts is table state);
  *  (c) a merge STRADDLING a rescale (staged under the old count,
  *      committing after the new stamp landed) restages instead of
  *      merging wrong-layout dirs — the PartitionCountChanged seam;
  *  (d) rescale rebases on racing merges (real threads): the writer
  *      always wins, final state equals the sequential oracle;
  *  (e) the byte-budget trigger fires only over budget and derives a
  *      power-of-two count that brings the mean back under it;
  *  (f) an evolving table's manifest schema survives its rescale;
  *  (g) the change feed across a rescale emits ZERO phantom changes,
  *      and a follower crosses the boundary with a metadata-only tick.
  */
class RescaleSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ap(uid: Long, id: Long, t: Long, v: Double,
      del: Boolean = false) =
    CdcApplied(uid, id, new Timestamp(t), v, del)

  private def freshRoot(): String =
    Files.createTempDirectory("graft-rescale").toString

  private def byKey(df: org.apache.spark.sql.DataFrame): Map[Long, CdcApplied] =
    df.as[CdcApplied].collect().map(r => r.user_id -> r).toMap

  private def pidOf(uid: Long, p: Int): Int =
    s.range(1).select(pmod(hash(lit(uid)), lit(p))).first().getInt(0)

  /** Every row physically sits in the pid dir its key hashes to under
    * count `p` — the layout-integrity witness. */
  private def assertLayout(root: String, p: Int): Unit =
    VersionedTable.parts(root).foreach { case (label, dirs) =>
      dirs.foreach { rel =>
        val uids = spark.read.parquet(Paths.get(root, rel).toString)
          .select("user_id").collect().map(_.getLong(0))
        uids.foreach { uid =>
          assert(pidOf(uid, p) == label.toInt,
            s"key $uid sits in pid=$label but hashes to ${pidOf(uid, p)} " +
              s"under P=$p")
        }
      }
    }

  test("rescale is data-identical and re-lays rows under the new count") {
    val root = freshRoot()
    val target = new PartitionedTableCdcTarget(spark, root, 4)
    target.merge(0, (1L to 40L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    target.merge(1, Seq(ap(7, 100, 99999, 7.7)).toDS())
    val before = byKey(target.snapshot)
    assertLayout(root, 4)

    val v = VersionedTable.rescalePartitions(spark, root, "user_id", 16)
    assert(v == VersionedTable.versions(root).last)
    assert(VersionedTable.partCount(root).contains(16),
      "rescale must re-stamp the manifest count")
    assert(VersionedTable.parts(root).keySet.size > 4,
      "40 keys over 16 partitions must populate more than the old 4")
    assert(byKey(target.snapshot) == before, "rescale changed table data")
    assertLayout(root, 16)

    // old dirs are vacuumable debris once the old version expires
    VersionedTable.expire(root, keepLast = 1)
    assert(VersionedTable.vacuum(root, graceMillis = 0).nonEmpty,
      "the pre-rescale layout must become reclaimable")
    assert(byKey(target.snapshot) == before, "vacuum touched live data")
  }

  test("a writer constructed with the old count adopts the new stamp") {
    val root = freshRoot()
    new PartitionedTableCdcTarget(spark, root, 4)
      .merge(0, (1L to 30L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    VersionedTable.rescalePartitions(spark, root, "user_id", 8)

    // reborn writer still configured with P=4: the manifest wins
    val stale = new PartitionedTableCdcTarget(spark, root, 4)
    stale.merge(1, Seq(ap(5, 100, 90000, 5.5)).toDS())
    assert(VersionedTable.partCount(root).contains(8),
      "a post-rescale merge must not regress the stamp")
    val snap = byKey(stale.snapshot)
    assert(snap.size == 30 && snap(5L).value == 5.5)
    assertLayout(root, 8)
  }

  test("a merge straddling a rescale restages under the new count") {
    val root = freshRoot()
    new PartitionedTableCdcTarget(spark, root, 4)
      .merge(0, (1L to 30L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())

    // the guard itself: stale-count dirs must be refused, not merged
    val staged = VersionedTable.stagePartitioned(
      Seq(ap(3, 200, 95000, 3.3)).toDS().toDF()
        .withColumn(VersionedTable.PidCol, VersionedTable.keyPid("user_id", 4)),
      root, VersionedTable.PidCol)
    VersionedTable.rescalePartitions(spark, root, "user_id", 8)
    intercept[VersionedTable.PartitionCountChanged] {
      VersionedTable.commitPartitions(staged, root, batchId = 99,
        nParts = Some(4))
    }

    // the writer-side recovery: rescale lands INSIDE the merge's
    // stage→commit window (deterministic via the test seam); the
    // merge must restage under the new stamp and land correctly
    var fired = false
    PartitionedMerge.merge(spark, root, batchId = 1,
      Seq(ap(7, 300, 97000, 7.7)).toDS().toDF(),
      pk = "user_id", seqCols = Seq("ts", "event_id"),
      cols = Seq("user_id", "event_id", "ts", "value", "is_deleted"),
      configuredP = 8, migrateFlat = true,
      beforeCommit = () => if (!fired) {
        fired = true
        VersionedTable.rescalePartitions(spark, root, "user_id", 16)
      })
    assert(fired, "the race window seam never ran")
    assert(VersionedTable.partCount(root).contains(16))
    val snap = byKey(new PartitionedTableCdcTarget(spark, root).snapshot)
    assert(snap.size == 30 && snap(7L).value == 7.7,
      s"straddling merge lost data: ${snap.get(7L)}")
    assertLayout(root, 16)
  }

  test("rescale rebases on racing merges: the writer always wins") {
    val root = freshRoot()
    val target = new PartitionedTableCdcTarget(spark, root, 4)
    target.merge(0, (1L to 60L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    val batches = (1 to 6).map { b =>
      b.toLong -> (1L to 10L).map(i => ap(b * 10L + i, 1000L * b + i,
        50000L * b + i, b * 100.0 + i))
    }
    val writer = new Thread(() => {
      batches.foreach { case (id, rows) => target.merge(id, rows.toDS()) }
    })
    writer.start()
    var p = 4
    try {
      while (writer.isAlive) {
        p = if (p == 4) 8 else 4 // flip the layout under the writer
        VersionedTable.rescalePartitions(spark, root, "user_id", p,
          maxAttempts = 50)
      }
    } finally writer.join()
    val got = byKey(target.snapshot)
    // sequential oracle on a quiet table
    val quiet = freshRoot()
    val t2 = new PartitionedTableCdcTarget(spark, quiet, 4)
    t2.merge(0, (1L to 60L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    batches.foreach { case (id, rows) => t2.merge(id, rows.toDS()) }
    assert(got == byKey(t2.snapshot),
      "concurrent rescale diverged from sequential merges")
    assertLayout(root, VersionedTable.partCount(root).get)
  }

  test("the byte-budget trigger fires over budget, derives a 2^k count") {
    val root = freshRoot()
    new PartitionedTableCdcTarget(spark, root, 4)
      .merge(0, (1L to 200L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    def total: Long = VersionedTable.parts(root).values.flatten.map { rel =>
      val w = Files.walk(Paths.get(root, rel))
      try w.iterator.asScala.filter(Files.isRegularFile(_))
        .map(Files.size(_)).sum
      finally w.close()
    }.sum

    // generous budget: under it, no-op
    assert(VersionedTable.rescaleIfNeeded(spark, root, "user_id",
      targetBytesPerPart = total).isEmpty)
    assert(VersionedTable.partCount(root).contains(4))

    // budget of total/10: mean over 4 partitions exceeds it → rescale
    // to the smallest power-of-two multiple of 4 with mean ≤ budget
    val Some((oldP, newP)) = VersionedTable.rescaleIfNeeded(
      spark, root, "user_id", targetBytesPerPart = total / 10)
    assert(oldP == 4 && newP == 16, s"derived $oldP -> $newP (want 4 -> 16)")
    assert(VersionedTable.partCount(root).contains(16))
    // quiescence against the NEW measured total (at this toy scale the
    // per-file parquet footer overhead dominates, so the rescale
    // itself grew the byte total — production partitions dwarf it):
    // a budget the current mean satisfies must be a no-op
    assert(VersionedTable.rescaleIfNeeded(spark, root, "user_id",
      targetBytesPerPart = total / 16 + 1).isEmpty)
  }

  test("an evolving table's manifest schema survives its rescale") {
    val root = freshRoot()
    val target = new TableEvolvingCdcTarget(spark, root, numPartitions = 4)
    target.addColumns(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", LongType), StructField("v", DoubleType)))
    target.merge(0, (1L to 20L).map(k => (k, k, 1000 + k, k / 2.0))
      .toDF("user_id", "event_id", "ts", "v"))
    target.addColumns(Seq(StructField("note", StringType)))
    target.merge(1, Seq((21L, 21L, 9000L, 21.0, "n21"))
      .toDF("user_id", "event_id", "ts", "v", "note"))

    VersionedTable.rescalePartitions(spark, root, "user_id", 8)
    val schema = VersionedTable.manifestSchema(spark, root,
      VersionedTable.versions(root).last)
    assert(schema.map(_.fieldNames.toSet)
      .contains(Set("user_id", "event_id", "ts", "v", "note")),
      s"rescale dropped the manifest schema: $schema")
    val snap = target.snapshot.collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(snap.size == 21 && snap(21L).getAs[String]("note") == "n21" &&
      snap(1L).getAs[Any]("note") == null,
      "pre-widen NULL semantics broke across the rescale")

    // a reborn evolving writer reloads schema AND count from the table
    val reborn = new TableEvolvingCdcTarget(spark, root, numPartitions = 4)
    assert(reborn.schema.map(_.fieldNames.toSet)
      .contains(Set("user_id", "event_id", "ts", "v", "note")))
    reborn.merge(2, Seq((1L, 99L, 99000L, 1.9, "n1"))
      .toDF("user_id", "event_id", "ts", "v", "note"))
    assert(VersionedTable.partCount(root).contains(8))
  }

  test("maintain: rescale preempts compaction, then compaction resumes") {
    val root = freshRoot()
    val s2 = spark; import s2.implicits._
    val staged = VersionedTable.stagePartitioned(
      (1L to 400L).toDF("user_id")
        .withColumn(VersionedTable.PidCol, VersionedTable.keyPid("user_id", 4)),
      root, VersionedTable.PidCol)
    VersionedTable.commitPartitions(staged, root, batchId = 0,
      nParts = Some(4))
    val before = VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSet

    // pass 1, generous byte budget + always-over file budget
    // (CompactionSpec's forcing convention): no rescale, compaction
    // fires
    val m1 = VersionedTable.maintain(spark, root, "user_id",
      targetBytesPerPart = Long.MaxValue, maxFilesPerPart = 0,
      vacuumGraceMillis = 0) // quiesced table: immediate reclaim is safe
    assert(m1.rescaled.isEmpty && m1.compacted.nonEmpty, m1.toString)
    assert(m1.expired.nonEmpty && m1.vacuumed.nonEmpty,
      s"retention must reclaim the pre-compaction layout: $m1")

    // pass 2, tiny byte budget, file budget still always-over: the
    // rescale fires and PREEMPTS compaction (everything compaction
    // would rewrite was just rewritten)
    val m2 = VersionedTable.maintain(spark, root, "user_id",
      targetBytesPerPart = 256, maxFilesPerPart = 0,
      vacuumGraceMillis = 0)
    assert(m2.rescaled.exists(_._1 == 4) && m2.compacted.isEmpty,
      m2.toString)
    assert(VersionedTable.partCount(root).contains(m2.rescaled.get._2))
    assert(VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSet == before,
      "maintenance changed table data")
    assertLayout(root, m2.rescaled.get._2)
  }

  test("zero phantom changes across a rescale; follower crosses cheaply") {
    val root = freshRoot(); val dst = freshRoot()
    val target = new PartitionedTableCdcTarget(spark, root, 4)
    target.merge(0, (1L to 30L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    val follower = new TableFollower(spark, root, dst, "user_id", 4)
    follower.tick()

    val vBefore = VersionedTable.versions(root).last
    VersionedTable.rescalePartitions(spark, root, "user_id", 8)
    val vAfter = VersionedTable.versions(root).last
    assert(VersionedTable.changes(spark, root, vBefore, vAfter, "user_id")
      .isEmpty, "a data-identical rescale fabricated changes")

    val dstParts = VersionedTable.parts(dst)
    assert(follower.tick().isDefined, "the rescale version must tick")
    assert(follower.cursor == vAfter)
    assert(VersionedTable.parts(dst) == dstParts,
      "a phantom-free window moved destination data")
    // and replication keeps working across the boundary
    target.merge(1, Seq(ap(3, 500, 99000, 3.5)).toDS())
    assert(follower.tick().isDefined)
    assert(byKey(follower.snapshot) == byKey(
      VersionedTable.read(spark, root)))
  }
}
