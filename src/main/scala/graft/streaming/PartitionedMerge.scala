package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.VersionedTable

/** THE partition-scoped guarded lakehouse merge — one body shared by
  * [[PartitionedTableCdcTarget]] (fixed CdcApplied schema) and
  * [[TableEvolvingCdcTarget]] (evolving schema): VERDICT r12 item 3 —
  * the two targets had drifted into parallel implementations of the
  * same merge; the fixed-schema path is now a parametrization
  * (pk/seqCols/cols/readSchema) of this core, not a second copy.
  *
  * Semantics (unchanged from both callers):
  *  1. redelivery fast-path before any staging (manifest txn guard);
  *  2. partition count resolved from TABLE state ([[VersionedTable
  *     .partCount]]), the constructor count only seeding fresh tables;
  *  3. touched pids from one distinct over the micro-batch (bounded
  *     by the partition count — a control-plane frame);
  *  4. read ONLY the touched partitions, union the batch, keep
  *     latest-per-key under the lexicographic `seqCols` order;
  *  5. stage in one partitioned write, publish via
  *     [[VersionedTable.commitPartitions]] — untouched dirs carried
  *     verbatim, write amplification O(touched), not O(table).
  *
  * Rescale safety (r13): a [[VersionedTable.rescalePartitions]]
  * landing between step 2's layout read and step 5's commit means the
  * staged dirs were hashed under a DEAD count — the commit throws
  * [[VersionedTable.PartitionCountChanged]] and the outer loop here
  * restages under the count now stamped on the manifest (the orphaned
  * dirs are vacuum debris). Without the loop the writer would either
  * corrupt the layout (unguarded) or wedge (guard with no retry).
  *
  * @param beforeCommit test seam: runs between staging and commit so
  *   specs can interleave a rescale deterministically into the race
  *   window; production callers leave the no-op default
  */
private[streaming] object PartitionedMerge {

  private val Pid = VersionedTable.PidCol

  def merge(spark: SparkSession, root: String, batchId: Long,
      rows: DataFrame, pk: String, seqCols: Seq[String], cols: Seq[String],
      configuredP: Int, readSchema: Option[StructType] = None,
      schemaDdl: Option[String] = None, migrateFlat: Boolean = false,
      beforeCommit: () => Unit = () => ()): Unit = {
    // redelivery fast-path: skip BEFORE staging any data (the txn
    // check inside commitPartitions still guards the race window)
    if (VersionedTable.committedTxns(root).contains(batchId)) return
    var attempt = 0
    while (true) {
      attempt += 1
      val p = VersionedTable.partCount(root).getOrElse(configuredP)
      val parts = VersionedTable.parts(root)
      val flatLegacy = migrateFlat && parts.isEmpty &&
        VersionedTable.versions(root).nonEmpty
      val batch = rows.withColumn(Pid, VersionedTable.keyPid(pk, p)).persist()
      try {
        val touched: Set[Int] =
          if (flatLegacy) (0 until p).toSet
          else batch.select(Pid).distinct().collect().map(_.getInt(0)).toSet
        if (touched.isEmpty) return // empty batch: merging nothing is a no-op
        val existing: DataFrame =
          if (flatLegacy)
            // migration: read the whole flat snapshot once; the commit
            // below is a full partitioned rewrite (overwriteAll)
            VersionedTable.read(spark, root)
              .withColumn(Pid, VersionedTable.keyPid(pk, p))
          else {
            // partition files live under pid= dirs (the column is the
            // dir, not a parquet column) — recompute it on read; it is
            // a pure function of the key, so the recomputation is exact
            val dirs = touched.toSeq.sorted
              .flatMap(k => parts.getOrElse(k.toString, Nil))
              .map(rel => Paths.get(root, rel).toString)
            if (dirs.isEmpty) batch.limit(0)
            else readSchema.map(spark.read.schema(_)).getOrElse(spark.read)
              .parquet(dirs: _*)
              .withColumn(Pid, VersionedTable.keyPid(pk, p))
          }
        val merged = existing.unionByName(batch)
          .groupBy(pk)
          .agg(max_by(
            struct((cols :+ Pid).map(col): _*),
            struct(seqCols.map(col): _*)).as("r"))
          .select("r.*")
        val staged = VersionedTable.stagePartitioned(merged, root, Pid)
        beforeCommit()
        try {
          VersionedTable.commitPartitions(staged, root, batchId,
            overwriteAll = flatLegacy, schemaDdl = schemaDdl,
            nParts = Some(p))
          return
        } catch {
          case e: VersionedTable.PartitionCountChanged =>
            if (attempt >= 5) throw e
          // a rescale raced this merge: loop restages under the count
          // now stamped on the manifest
        }
      } finally batch.unpersist()
    }
  }
}
