package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Table→table replication over the change feed:
  *  (a) each tick converges the destination to the source snapshot,
  *      with the manifest-txn cursor making replays whole-batch
  *      no-ops and a fresh follower (crash-restart) resuming from the
  *      destination's own manifests;
  *  (b) an upstream compaction advances the cursor with a
  *      metadata-only commit (no data motion, no divergence);
  *  (c) a true row removal propagates — including a partition whose
  *      every key was deleted (the dropParts seam);
  *  (d) an upstream schema widen replicates: the destination's
  *      manifest schema follows the source's;
  *  (e) an expired-cursor follower auto-re-bootstraps. */
class TableFollowerSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val P = 8

  private def ap(uid: Long, id: Long, t: Long, v: Double,
      del: Boolean = false) =
    CdcApplied(uid, id, new Timestamp(t), v, del)

  private def freshRoot(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def byKey(df: org.apache.spark.sql.DataFrame): Map[Long, CdcApplied] =
    df.as[CdcApplied].collect().map(r => r.user_id -> r).toMap

  test("ticks converge, replays no-op, a reborn follower resumes") {
    val src = freshRoot("tf-src"); val dst = freshRoot("tf-dst")
    val upstream = new PartitionedTableCdcTarget(spark, src, P)
    val follower = new TableFollower(spark, src, dst, "user_id", P)

    assert(follower.tick().isEmpty, "empty source must not tick")

    upstream.merge(0, (1L to 30L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    assert(follower.tick().isDefined)
    assert(byKey(follower.snapshot) == byKey(VersionedTable.read(spark, src)))

    // two upstream batches, ONE tick: the window coalesces
    upstream.merge(1, Seq(ap(5, 100, 90000, 5.5)).toDS())
    upstream.merge(2, Seq(ap(31, 101, 90001, 31.0)).toDS())
    val w = follower.tick()
    assert(w.isDefined && follower.tick().isEmpty,
      "caught-up follower must not tick again")
    assert(byKey(follower.snapshot) == byKey(VersionedTable.read(spark, src)))

    // crash-restart: a FRESH follower's cursor comes from the
    // destination's manifests; nothing re-applies
    val reborn = new TableFollower(spark, src, dst, "user_id", P)
    val vBefore = VersionedTable.versions(dst).size
    assert(reborn.cursor == VersionedTable.versions(src).last)
    assert(reborn.tick().isEmpty)
    assert(VersionedTable.versions(dst).size == vBefore)

    // and it keeps following
    upstream.merge(3, Seq(ap(7, 102, 95000, 7.7)).toDS())
    assert(reborn.tick().isDefined)
    assert(byKey(reborn.snapshot)(7L).value == 7.7)
  }

  test("upstream compaction advances the cursor without data motion") {
    val src = freshRoot("tf-src2"); val dst = freshRoot("tf-dst2")
    val upstream = new PartitionedTableCdcTarget(spark, src, P)
    val follower = new TableFollower(spark, src, dst, "user_id", P)
    upstream.merge(0, (1L to 20L).map(k => ap(k, k, 1000 + k, k.toDouble)).toDS())
    follower.tick()
    val partsBefore = VersionedTable.parts(dst)

    assert(VersionedTable.compactPartitions(spark, src,
      maxFilesPerPart = 0).nonEmpty)
    assert(follower.tick().isDefined, "compaction version must tick")
    assert(VersionedTable.parts(dst) == partsBefore,
      "a data-identical upstream window moved destination data")
    assert(follower.cursor == VersionedTable.versions(src).last)
    assert(byKey(follower.snapshot) == byKey(VersionedTable.read(spark, src)))
  }

  test("row removal propagates, including a fully-emptied partition") {
    val src = freshRoot("tf-src3"); val dst = freshRoot("tf-dst3")
    def stage(rows: Seq[(Long, Double)]): Map[String, String] =
      VersionedTable.stagePartitioned(
        rows.toDF("id", "v").withColumn("pid", pmod(hash(col("id")), lit(P))),
        src, "pid")
    // key 1 sits alone in its partition: deleting it EMPTIES the pid
    val lonely = 1L
    val others = (2L to 12L).map(k => k -> k.toDouble)
    VersionedTable.commitPartitions(
      stage((lonely -> 1.0) +: others), src, batchId = 0)
    val follower = new TableFollower(spark, src, dst, "id", P)
    follower.tick()
    assert(follower.snapshot.count() == 12)

    // overwrite upstream WITHOUT the lonely key and with one update
    VersionedTable.commitPartitions(
      stage(others.map { case (k, v) => if (k == 2L) k -> 2.5 else k -> v }),
      src, batchId = 1, overwriteAll = true)
    follower.tick()
    val got = follower.snapshot.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(!got.contains(lonely), "deleted key resurrected in the follower")
    assert(got(2L) == 2.5 && got.size == 11)
  }

  test("schema widen replicates; expired cursor re-bootstraps") {
    val src = freshRoot("tf-src4"); val dst = freshRoot("tf-dst4")
    val upstream = new TableEvolvingCdcTarget(spark, src, numPartitions = P)
    upstream.addColumns(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", LongType), StructField("v", DoubleType)))
    upstream.merge(0, (1L to 10L).map(k => (k, k, 1000 + k, k / 2.0))
      .toDF("user_id", "event_id", "ts", "v"))
    val follower = new TableFollower(spark, src, dst, "user_id", P)
    follower.tick()

    upstream.addColumns(Seq(StructField("note", StringType)))
    upstream.merge(1, Seq((11L, 11L, 9000L, 11.0, "n11"))
      .toDF("user_id", "event_id", "ts", "v", "note"))
    follower.tick()
    val dstSchema = VersionedTable.manifestSchema(spark, dst,
      VersionedTable.versions(dst).last)
    assert(dstSchema.map(_.fieldNames.toSet)
      .contains(Set("user_id", "event_id", "ts", "v", "note")),
      s"widen did not replicate: $dstSchema")
    val snap = follower.snapshot.collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(snap(11L).getAs[String]("note") == "n11" &&
      snap(1L).getAs[Any]("note") == null)

    // expire the cursor version upstream → the next tick re-bootstraps
    upstream.merge(2, Seq((1L, 99L, 99000L, 1.9, "n1"))
      .toDF("user_id", "event_id", "ts", "v", "note"))
    VersionedTable.expire(src, keepLast = 1)
    assert(follower.tick().isDefined, "expired cursor must re-bootstrap")
    assert(follower.snapshot.collect().map(r =>
      r.getAs[Long]("user_id") -> r).toMap
      .apply(1L).getAs[String]("note") == "n1")
    assert(follower.tick().isEmpty)
  }
}
