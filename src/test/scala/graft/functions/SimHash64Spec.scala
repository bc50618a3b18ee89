package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHash64Spec extends SparkSpec {

  private def toks = filter(split(col("text"), " "), x => x =!= lit(""))

  test("native simhash64 matches the relational 64-sum-buffer formulation") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
    val native = d.select(col("doc_id"), expr("simhash64(t)").as("sh"))

    val bitSums = (0 until 64).map(j =>
      sum(shiftright(xxhash64(col("tok")), j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    val relational = d.select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("sh"))

    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }

  test("simhash64 is registered for plain SQL and survives codegen") {
    val one = spark.sql(
      "SELECT simhash64(array('spark', 'spark', 'query')) AS h").head.getLong(0)
    val again = spark.sql(
      "SELECT simhash64(array('spark', 'spark', 'query')) AS h").head.getLong(0)
    assert(one == again)
    // empty array: all bit-sums are 0 (not > 0) => signature 0
    assert(spark.sql("SELECT simhash64(CAST(array() AS array<string>))")
      .head.getLong(0) == 0L)
  }

  test("near-identical token lists give near-zero hamming distance") {
    val s = spark
    import s.implicits._
    val h = Seq(
      (1L, Seq.fill(50)("alpha") ++ Seq("beta", "gamma", "delta")),
      (2L, Seq.fill(50)("alpha") ++ Seq("beta", "gamma", "epsilon")),
      (3L, Seq("zeta", "eta", "theta", "iota", "kappa")))
      .toDF("id", "t")
      .select(col("id"), expr("simhash64(t)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) < hamming(h(1L), h(3L)))
  }
}
