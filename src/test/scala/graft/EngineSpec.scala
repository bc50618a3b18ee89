package graft

/** Regression guard on the session contract — every operator, oracle,
  * and streaming spec assumes exactly this configuration (UTC
  * timestamp semantics, AQE, nanos-as-long parquet reads, the native
  * function registry). A silent drift here wobbles the whole
  * correctness gate, so pin it. */
class EngineSpec extends SparkSpec {

  test("session carries the scale + determinism config every op assumes") {
    val c = spark.conf
    assert(c.get("spark.sql.adaptive.enabled") == "true")
    assert(c.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c.get("spark.sql.session.timeZone") == "UTC",
      "oracle timestamp parity requires UTC")
    assert(c.get("spark.sql.legacy.parquet.nanosAsLong") == "true",
      "events.parquet TIMESTAMP(NANOS) reads depend on nanosAsLong")
    assert(c.get("spark.sql.shuffle.partitions") == Engine.cpus,
      "shuffle partitions must track the core count, not default 200")
    // ANSI stays ON (Spark 4 default): dec_quant's overflow-throws
    // contract and the decimal cast semantics assume it
    assert(c.get("spark.sql.ansi.enabled") == "true")
  }

  test("every graft native expression is registered and callable") {
    Seq("simhash64(array('a'))", "minhash128(array(1L, 2L, 3L))",
      "shingle_hash3(array('a','b','c'))",
      "shingle_poly3(array('a','b','c'))",
      "hyperplane_buckets(array(1.0f, 2.0f))",
      "hyperplane_buckets(array(1.0f, 2.0f), 11)",
      "dec_quant(array(1.0f))", "dec_dot(array(1L), array(2L))",
      // the surfaced Spark-internal Bloom pair (see GraftExtensions)
      "might_contain((SELECT bloom_filter_agg(h, 8L, 64L) " +
        "FROM (SELECT 1L AS h)), 1L)",
      "m61_uhash(7L, 3L, 11L)",
      "km_assign(array(1L), array(named_struct(" +
        "'cluster', 0L, 'n', 1L, 's_arr', array(1L))))")
      .foreach { call =>
        assert(spark.sql(s"SELECT $call AS r").collect().length == 1,
          s"$call failed")
      }
  }
}
