package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType,
  IntegerType, LongType, StringType}

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

  test("canWiden sanctions exactly the lossless containment chain") {
    import SchemaEvolution.canWiden
    // the chain
    assert(canWiden(IntegerType, LongType))
    assert(canWiden(IntegerType, DecimalType(10, 0)))
    assert(canWiden(LongType, DecimalType(20, 0)))
    assert(canWiden(FloatType, DoubleType))
    assert(canWiden(DecimalType(10, 2), DecimalType(12, 2)))
    assert(canWiden(DecimalType(10, 2), DecimalType(13, 4)))
    // narrowings and non-containments stay on the cast path
    assert(!canWiden(LongType, IntegerType))
    assert(!canWiden(LongType, DecimalType(18, 0)), "18 digits < long's 19")
    assert(!canWiden(DoubleType, FloatType))
    assert(!canWiden(DoubleType, LongType))
    assert(!canWiden(LongType, DoubleType), "53-bit mantissa loses longs")
    assert(!canWiden(DecimalType(10, 2), DecimalType(10, 4)),
      "scale growth that eats integer digits truncates")
    assert(!canWiden(StringType, LongType) && !canWiden(LongType, StringType))
    assert(!canWiden(LongType, LongType), "same type is not a widen")
  }

  test("type drift on an existing column promotes the target in place") {
    val s = spark
    import s.implicits._
    val target = new InMemoryEvolvingTarget
    target.merge(0, SchemaEvolution.heal(target,
      Seq((1L, 7)).toDF("event_id", "cnt")))
    assert(target.schema.get("cnt").dataType == IntegerType)

    // cnt arrives as LONG beyond int range: the target retypes and
    // the value lands intact — no ANSI overflow, no silent narrowing
    target.merge(1, SchemaEvolution.heal(target,
      Seq((2L, 9999999999L)).toDF("event_id", "cnt")))
    assert(target.schema.get("cnt").dataType == LongType)
    assert(target.retypeLog == Seq("cnt" -> "BIGINT"))
    assert(target.mergedRows.last._2.head("cnt") == 9999999999L)

    // a later narrower batch still casts UP to the widened type
    target.merge(2, SchemaEvolution.heal(target,
      Seq((3L, 5)).toDF("event_id", "cnt")))
    assert(target.schema.get("cnt").dataType == LongType)
    assert(target.mergedRows.last._2.head("cnt") == 5L)
  }

  test("a vendor that refuses ALTER COLUMN declines the widen and the " +
      "heal falls back to cast-to-target") {
    val s = spark
    import s.implicits._
    // Derby permits SET DATA TYPE only for VARCHAR length growth —
    // the numeric chain is refused, widenColumn returns false, and
    // in-range values keep flowing through the old cast path (an
    // out-of-range value would fail the ANSI cast loudly, which is
    // the honest outcome when the store cannot hold it)
    val target = new JdbcEvolvingCdcTarget(
      "jdbc:derby:memory:evowiden;create=true", "evw", pk = "event_id",
      seqCols = Seq("seq"))
    target.addColumns(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("seq", LongType),
      org.apache.spark.sql.types.StructField("cnt", IntegerType)))
    assert(!target.widenColumn("cnt", LongType),
      "Derby must refuse a numeric SET DATA TYPE")
    assert(target.schema.get("cnt").dataType == IntegerType,
      "a declined widen must not retype the cache")

    target.merge(0, SchemaEvolution.heal(target,
      Seq((1L, 1L, 42L)).toDF("event_id", "seq", "cnt")))
    assert(target.snapshot(1L)("cnt") == 42,
      "in-range long must cast down and merge")
    assert(target.schema.get("cnt").dataType == IntegerType)
  }

  test("drifted JSON stream self-heals into Derby via real ALTER TABLE") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val target = new JdbcEvolvingCdcTarget(
      "jdbc:derby:memory:evotgt1;create=true", "evo_tgt",
      connOptions = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val input = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft_evo_jdbc").toString
    val q = SchemaEvolution.mergeEvolvingJson(input.toDS(), target, checkpoint,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      // v1 payloads create the base tables from the inferred schema
      input.addData(
        """{"user_id":1,"event_id":1,"ts":1000,"v":1.5}""",
        """{"user_id":2,"event_id":2,"ts":1500,"v":2.5}""")
      q.processAllAvailable()
      assert(target.snapshot(1L)("v") == 1.5)

      // v2 gains props and drops v: ALTER TABLE fires on all three
      // tables; the full-row image replaces v with the healed NULL
      input.addData(
        """{"user_id":1,"event_id":3,"ts":3000,"props":"a=1"}""")
      q.processAllAvailable()
      val afterEvolve = target.snapshot
      assert(afterEvolve(1L)("props") == "a=1")
      assert(afterEvolve(1L)("v") == null,
        "full-row image must replace dropped columns with NULL")
      assert(afterEvolve(2L)("props") == null,
        "pre-evolution rows must read the new column as NULL")

      // a stale image (older seq) must not regress the evolved row,
      // and the guard must survive schema widening
      input.addData(
        """{"user_id":1,"event_id":0,"ts":500,"v":9.9}""")
      q.processAllAvailable()
      val afterStale = target.snapshot
      assert(afterStale(1L)("event_id") == 3L && afterStale(1L)("v") == null,
        "stale image regressed evolved state")
    } finally q.stop()
  }

  test("a restarted evolving target reloads the EVOLVED schema from " +
      "the database and keeps merging without re-CREATE") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val url = "jdbc:derby:memory:evotgt2;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

    // first incarnation: base schema + one evolution land durably
    val t1 = new JdbcEvolvingCdcTarget(url, "evo_tgt2", connOptions = opts)
    val in1 = MemoryStream[String]
    val q1 = SchemaEvolution.mergeEvolvingJson(in1.toDS(), t1,
      Files.createTempDirectory("graft_evo_restart1").toString,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      in1.addData("""{"user_id":1,"event_id":1,"ts":1000,"v":1.5}""")
      q1.processAllAvailable()
      in1.addData("""{"user_id":2,"event_id":2,"ts":2000,"props":"x"}""")
      q1.processAllAvailable()
    } finally q1.stop()

    // process "crashes"; the reborn target must NOT assume first-batch
    // (the old behavior re-ran CREATE TABLE — crashing every
    // redelivery — and would have forgotten the evolved 'props')
    val t2 = new JdbcEvolvingCdcTarget(url, "evo_tgt2", connOptions = opts)
    assert(t2.schema.isDefined, "restart must reload the schema cache")
    assert(t2.schema.get.fieldNames.toSet ==
      Set("user_id", "event_id", "ts", "v", "props"),
      s"evolved columns lost on restart: ${t2.schema.get.fieldNames.toSeq}")

    val in2 = MemoryStream[String]
    val q2 = SchemaEvolution.mergeEvolvingJson(in2.toDS(), t2,
      Files.createTempDirectory("graft_evo_restart2").toString,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      // a fresh row updates an existing key THROUGH the evolved
      // column list — silently dropping 'props' would null it here
      in2.addData(
        """{"user_id":1,"event_id":5,"ts":5000,"v":7.5,"props":"kept"}""")
      q2.processAllAvailable()
      val snap = t2.snapshot
      assert(snap(1L)("event_id") == 5L && snap(1L)("props") == "kept",
        s"restarted merge lost evolved columns: ${snap(1L)}")
      assert(snap(2L)("props") == "x", "pre-restart rows must survive")
    } finally q2.stop()
  }
}
