package graft.operators

import graft.SparkSpec

/** Pins the r15 lineage-truncation helper that replaced the bare
  * eager reliable `.checkpoint()` at every operator call site: both
  * modes must (a) return the same rows, (b) truncate lineage (the
  * stage re-enters the plan as an RDD scan, so downstream plans stop
  * re-embedding the subtree), and (c) in reliable mode actually write
  * directory-backed checkpoint files (the executor-loss posture the
  * conf buys). */
class CkptSpec extends SparkSpec {
  import spark.implicits._

  private def frame() =
    spark.range(0, 1000).toDF("id")
      .selectExpr("id", "id % 7 AS k")
      .groupBy("k").count()

  private def isRddScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.startsWith("LogicalRDD"))

  test("local mode (default): same rows, lineage truncated, no files") {
    val before = frame().as[(Long, Long)].collect().toSet
    val staged = frame().transform(Ckpt.stage)
    assert(isRddScan(staged), "stage() must truncate lineage to an RDD scan")
    assert(staged.as[(Long, Long)].collect().toSet === before)
  }

  test("reliable mode: same rows, lineage truncated, files on disk") {
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val staged = frame().transform(Ckpt.stage)
      assert(isRddScan(staged))
      assert(staged.as[(Long, Long)].collect().toSet ===
        frame().as[(Long, Long)].collect().toSet)
      import scala.jdk.CollectionConverters._
      val dir = spark.sparkContext.getCheckpointDir.get
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(
        new java.net.URI(dir).getPath))
      val n = try files.iterator().asScala.size finally files.close()
      assert(n > 1, "reliable mode must write checkpoint files")
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }
}
