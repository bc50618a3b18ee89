package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.SparkSpec

/** A mid-stream batch that gains a column must widen the target and
  * keep flowing — the reference destination's "add missing columns and
  * retry" (schema_cache.rs), proven here as heal-before-merge. */
class SchemaEvolutionSpec extends SparkSpec {

  test("a mid-stream batch gaining a column widens the target and self-heals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val target = new InMemoryEvolvingTarget
    val input = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft_evo_ckpt").toString
    val q = SchemaEvolution.mergeEvolvingJson(input.toDS(), target, checkpoint,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      // v1 payloads: (event_id, user_id, v)
      input.addData(
        """{"event_id":1,"user_id":10,"v":1.5}""",
        """{"event_id":2,"user_id":11,"v":2.5}""")
      q.processAllAvailable()
      assert(target.schema.get.fieldNames.toSet ==
        Set("event_id", "user_id", "v"))

      // v2 payloads: +props (new), -v (dropped) — the drifted batch
      // must widen the target and fill v with NULL, not fail the sink
      input.addData(
        """{"event_id":3,"user_id":12,"props":"a=1"}""")
      q.processAllAvailable()
      assert(target.schema.get.fieldNames.toSet ==
        Set("event_id", "user_id", "v", "props"))
      assert(target.widenLog.last == Seq("props"))

      val (_, lastRows) = target.mergedRows.last
      assert(lastRows.head("props") == "a=1")
      assert(lastRows.head("v") == null, "dropped column must fill as NULL")
      assert(lastRows.head("event_id") == 3L)

      // v3: v returns as an INT payload — cast to the target's DOUBLE
      // (target schema wins on type conflicts)
      input.addData(
        """{"event_id":4,"user_id":13,"v":7,"props":"b=2"}""")
      q.processAllAvailable()
      val (_, v3Rows) = target.mergedRows.last
      assert(v3Rows.head("v") == 7.0)
      assert(target.schema.get("v").dataType == DoubleType)
      assert(target.schema.get("event_id").dataType == LongType)
      assert(target.schema.get("props").dataType == StringType)

      // no spurious widens: exactly the initial create + props
      assert(target.widenLog.map(_.toSet) ==
        Seq(Set("event_id", "user_id", "v"), Set("props")))
    } finally q.stop()
  }
}
