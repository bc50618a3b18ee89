package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import graft.streaming.{CdcApplied, PartitionedTableCdcTarget, TableCdcTarget}

/** Scale evidence for the partition-scoped lakehouse merge (VERDICT
  * r11 item 1's "rewrite bytes ∝ batch size, not table size"):
  * replays the SAME constant-size update batches against the
  * copy-on-write target and the partitioned target at growing table
  * sizes, measuring bytes physically written per commit (the write-
  * once data layout makes that an exact walk of `data/`).
  *
  * Partition count scales with the table (the 100 TB sizing rule in
  * PartitionedTableCdcTarget's scaladoc: hold per-partition bytes
  * near a constant budget, here ~800 keys/partition standing in for
  * ~1 GB) — under that rule the partitioned rewrite cost per batch is
  * touched-partitions × constant, i.e. ∝ batch, while copy-on-write
  * is ∝ table by construction.
  *
  * Usage: runMain graft.LakehouseScale [out.json]
  */
object LakehouseScale {

  private def ap(uid: Long, id: Long, t: Long, v: Double) =
    CdcApplied(uid, id, new Timestamp(t), v, is_deleted = false)

  private def dataBytes(root: String): Long = {
    val d = Paths.get(root, "data")
    if (!Files.isDirectory(d)) return 0L
    val w = Files.walk(d)
    try w.iterator.asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
    finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SCALE_LAKEHOUSE_r12.json")
    val spark = Engine.session("graft-lakehouse-scale")
    import spark.implicits._

    val updateKeys = 32 // constant CDC batch size across every table
    val updateBatches = 5
    val rng = new scala.util.Random(42)

    val rows = Seq.newBuilder[String]
    // 30× across the legs: COW must grow ∝ table while the
    // partitioned rewrite converges to touched-partitions × the
    // constant per-partition budget (≈ flat once P ≫ batch keys —
    // the first leg has P < batch, i.e. every partition touched,
    // deliberately included as the degenerate floor)
    for (tableKeys <- Seq(10000, 30000, 100000, 300000)) {
      val p = math.max(16, tableKeys / 800) // constant per-partition budget
      val cowRoot = Files.createTempDirectory(s"lh_cow_$tableKeys").toString
      val partRoot = Files.createTempDirectory(s"lh_part_$tableKeys").toString
      val cow = new TableCdcTarget(spark, cowRoot)
      val part = new PartitionedTableCdcTarget(spark, partRoot, p)

      val load = (1L to tableKeys.toLong)
        .map(k => ap(k, k, 1000L + k, k.toDouble))
      cow.merge(0, load.toDS()); part.merge(0, load.toDS())

      var cowTotal = 0L; var partTotal = 0L
      for (b <- 1 to updateBatches) {
        val batch = Seq.fill(updateKeys)(
          rng.nextInt(tableKeys).toLong + 1L)
          .distinct
          .map(k => ap(k, 1000000L * b + k, 10000000L * b + k, -k.toDouble))
        val cow0 = dataBytes(cowRoot); val part0 = dataBytes(partRoot)
        cow.merge(b.toLong, batch.toDS())
        part.merge(b.toLong, batch.toDS())
        cowTotal += dataBytes(cowRoot) - cow0
        partTotal += dataBytes(partRoot) - part0
      }
      val cowAvg = cowTotal / updateBatches
      val partAvg = partTotal / updateBatches
      println(s"[lakehouse-scale] rows=$tableKeys P=$p " +
        s"cow=$cowAvg B/batch part=$partAvg B/batch " +
        f"ratio=${cowAvg.toDouble / partAvg}%.1f")
      rows += s"""{"table_rows":$tableKeys,"partitions":$p,""" +
        s""""batch_keys":$updateKeys,"cow_bytes_per_batch":$cowAvg,""" +
        s""""part_bytes_per_batch":$partAvg,""" +
        f""""cow_over_part":${cowAvg.toDouble / partAvg}%.2f}"""

      // equality witness: the two forms must agree after every replay
      val a = cow.snapshot.orderBy("user_id").collect().toSeq
      val b = part.snapshot.orderBy("user_id").collect().toSeq
      require(a == b, s"COW and partitioned snapshots diverged at $tableKeys")
    }
    val json =
      s"""{"metric":"lakehouse_rewrite_bytes","unit":"bytes_per_batch","update_keys":$updateKeys,"tables":[${rows.result().mkString(",")}]}"""
    println(json)
    Files.write(Paths.get(out), (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
