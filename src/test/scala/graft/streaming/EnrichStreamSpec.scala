package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class EnrichEvent(event_id: Long, user_id: Long, value: Double)
case class UserDim(user_id: Long, segment: String)

class EnrichStreamSpec extends SparkSpec {

  test("each micro-batch joins the dimension as of that batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val dimPath = Files.createTempDirectory("graft_dim").toString
    Seq(UserDim(1, "bronze"), UserDim(2, "silver")).toDF()
      .write.mode("overwrite").parquet(dimPath)

    val seen = mutable.ArrayBuffer.empty[(Long, Long, String)]
    val in = MemoryStream[EnrichEvent]
    val q = in.toDF().writeStream
      .foreachBatch(EnrichStream.enrichSink(dimPath, "user_id") {
        (batch, _) =>
          seen ++= batch
            .selectExpr("event_id", "user_id", "segment")
            .collect()
            .map(r => (r.getLong(0), r.getLong(1),
              Option(r.getString(2)).getOrElse("<none>")))
      })
      .start()
    try {
      // batch 1 against dim v1: user 1 = bronze, user 3 unmatched
      in.addData(EnrichEvent(10, 1, 1.0), EnrichEvent(11, 3, 2.0))
      q.processAllAvailable()
      assert(seen.toSet == Set((10L, 1L, "bronze"), (11L, 3L, "<none>")))

      // dim updated between batches: user 1 promoted, user 3 appears
      Seq(UserDim(1, "gold"), UserDim(3, "bronze")).toDF()
        .write.mode("overwrite").parquet(dimPath)

      // batch 2 must see dim v2 — a plan-time static join would still
      // serve v1's file listing here
      seen.clear()
      in.addData(EnrichEvent(12, 1, 3.0), EnrichEvent(13, 3, 4.0))
      q.processAllAvailable()
      assert(seen.toSet == Set((12L, 1L, "gold"), (13L, 3L, "bronze")))
    } finally q.stop()
  }

  test("enrichment adds no shuffle to the micro-batch (dim broadcasts)") {
    val s = spark
    import s.implicits._

    val dimPath = Files.createTempDirectory("graft_dim2").toString
    Seq(UserDim(1, "bronze")).toDF().write.mode("overwrite").parquet(dimPath)

    var shuffles = -1
    val sink = EnrichStream.enrichSink(dimPath, "user_id") { (batch, _) =>
      val plan = batch.queryExecution.executedPlan.toString
      shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
      batch.collect()
    }
    // drive the sink directly with a batch frame — the join shape is
    // identical (foreachBatch hands over exactly such a frame)
    sink(Seq(EnrichEvent(1, 1, 1.0)).toDF(), 0L)
    assert(shuffles == 0,
      s"enrichment join shuffles the stream side ($shuffles exchanges)")
  }
}
