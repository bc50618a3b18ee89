package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Table→table incremental replication over the change feed — the
  * lakehouse-native analog of the reference's source→warehouse
  * replication loop (pipeline_manager.rs: consume the change stream,
  * apply keyed merges, track replication state): a downstream table
  * FOLLOWS an upstream [[VersionedTable]] by applying
  * [[VersionedTable.changes]] windows, one commit per tick.
  *
  * The cursor design is the point: the follower commits each window
  * `(from, head]` into the destination with `txn = head` (the SOURCE
  * version number), so
  *  - exactly-once is the destination's existing manifest-txn guard —
  *    a replayed window is a whole-batch no-op;
  *  - the cursor IS `max(committedTxns(dst))` — there is no separate
  *    state store to keep consistent, and a crash anywhere leaves
  *    either the old cursor (window re-applies, guarded) or the new
  *    one (window done): the apply and the cursor write are the same
  *    atomic manifest link.
  *
  * Data motion is O(changed partitions) per tick (the change feed's
  * pruning) + O(touched destination partitions) for the merge — never
  * O(table). The source's manifest SCHEMA rides each commit, so an
  * upstream widen replicates downstream with the same metadata-only
  * semantics. If the cursor version has been expired upstream
  * (retention shorter than follower lag), the tick auto-re-bootstraps
  * from the full snapshot under the same txn guard — heavy but
  * correct, and the operator sees it in the returned window.
  *
  * Single follower per destination root (the txn-cursor reads every
  * destination txn as a source version).
  */
class TableFollower(spark: SparkSession, srcRoot: String, dstRoot: String,
    pk: String, numPartitions: Int = 32) {
  require(numPartitions > 0, "numPartitions must be positive")

  private val Pid = VersionedTable.PidCol

  /** Last source version applied to the destination (0 = nothing). */
  def cursor: Int =
    VersionedTable.committedTxns(dstRoot).foldLeft(0L)(math.max).toInt

  /** Destination-manifest partition count wins over the constructor
    * (table state, as in the CDC targets). */
  private def effP: Int =
    VersionedTable.partCount(dstRoot).getOrElse(numPartitions)

  private def withPid(df: DataFrame, p: Int): DataFrame =
    df.withColumn(Pid, pmod(hash(col(pk)), lit(p)))

  /** Apply everything committed upstream since the last tick. Returns
    * the applied (fromVersion, headVersion) window, or None when the
    * destination is already caught up. */
  def tick(): Option[(Int, Int)] = {
    val srcVersions = VersionedTable.versions(srcRoot)
    val head = srcVersions.lastOption.getOrElse(return None)
    val from = cursor
    if (head <= from) return None
    val p = effP
    val schemaDdl = VersionedTable
      .manifestSchema(spark, srcRoot, head).map(_.toDDL)
    val bootstrap = from == 0 || !srcVersions.contains(from)
    if (bootstrap) {
      // initial sync, or the cursor version was expired upstream:
      // full snapshot, overwrite commit, same txn guard
      val snap = withPid(VersionedTable.readAt(spark, srcRoot, head), p)
      val staged = VersionedTable.stagePartitioned(snap, dstRoot, Pid)
      VersionedTable.commitPartitions(staged, dstRoot, batchId = head,
        overwriteAll = true, schemaDdl = schemaDdl, nParts = Some(p))
    } else {
      // persist: the pruned diff job otherwise re-runs for the empty
      // check, the touched-pid collect, AND the staged write — at the
      // design point each re-run re-reads every changed src partition
      val delta = VersionedTable.changes(spark, srcRoot, from, head, pk)
        .persist()
      try {
        if (delta.isEmpty) {
          // a data-identical upstream window (e.g. compaction): advance
          // the cursor with a metadata-only commit — untouched
          // partitions carry verbatim, no data moves
          VersionedTable.commitPartitions(Map.empty, dstRoot, batchId = head,
            schemaDdl = schemaDdl)
        } else {
          val withP = withPid(delta, p)
          val touched = withP.select(Pid).distinct().collect()
            .map(_.getInt(0)).toSet // bounded by the partition count
          val parts = VersionedTable.parts(dstRoot)
          val existing: DataFrame = {
            val dirs = touched.toSeq.sorted
              .flatMap(k => parts.getOrElse(k.toString, Nil))
              .map(rel => java.nio.file.Paths.get(dstRoot, rel).toString)
            if (dirs.isEmpty) withP.drop("_change_type").limit(0)
            else {
              val reader = VersionedTable
                .manifestSchema(spark, srcRoot, head)
                .map(spark.read.schema(_)).getOrElse(spark.read)
              withPid(reader.parquet(dirs: _*), p)
            }
          }
          // replace-or-drop by pk: every changed key's old row leaves,
          // upserts (insert/update post-images) come back in
          val merged = existing
            .join(withP.select(col(pk)), Seq(pk), "left_anti")
            .unionByName(withP.filter(col("_change_type") =!= "delete")
              .drop("_change_type"))
          val staged = VersionedTable.stagePartitioned(merged, dstRoot, Pid)
          // a touched partition with NO surviving rows (every key
          // deleted) stages nothing — drop its label explicitly or the
          // old dir would ride the manifest and resurrect the rows
          val emptied = touched.map(_.toString) -- staged.keySet
          VersionedTable.commitPartitions(staged, dstRoot, batchId = head,
            schemaDdl = schemaDdl, dropParts = emptied, nParts = Some(p))
        }
      } finally delta.unpersist()
    }
    Some((from, head))
  }

  /** The destination as of its latest commit. */
  def snapshot: DataFrame = VersionedTable.read(spark, dstRoot)
}
