package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHash64Spec extends SparkSpec {

  private def toks = filter(split(col("text"), " "), x => x =!= lit(""))

  test("native simhash64 matches the (a*u+b) mod p sign-bit reference") {
    // independent BigInt reconstruction of the Carter–Wegman family
    // over real corpus tokens: poly-fold universe hash, 64 sign
    // bits from the seed literals, ties to 0 — the exact contract
    // the DuckDB oracles replay
    val P = BigInt(Mersenne61.P)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .limit(20)
    val native = docs.select(col("doc_id"), expr("simhash64(t)").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fold(str: String): Long = {
      var h = BigInt(0)
      str.codePoints().toArray.foreach(cp => h = (h * Mersenne61.B + cp) % P)
      h.toLong
    }
    val rows = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    rows.foreach { case (id, ts) =>
      val cnt = new Array[Int](64)
      ts.foreach { tok =>
        val u = fold(tok)
        val h1 = ((BigInt(SimHash64.seedsA(0)) * u +
          SimHash64.seedsB(0)) % P).toLong
        val h2 = ((BigInt(SimHash64.seedsA(1)) * u +
          SimHash64.seedsB(1)) % P).toLong
        (0 until 64).foreach { j =>
          val bit =
            if (j < 61) ((h1 >>> j) & 1L).toInt
            else ((h2 >>> (j - 61)) & 1L).toInt
          cnt(j) += 2 * bit - 1
        }
      }
      val expect = (0 until 64)
        .map(j => if (cnt(j) > 0) 1L << j else 0L).reduce(_ | _)
      assert(native(id) == expect, s"doc $id")
    }
    assert(SimHash64.seedsA.forall(a => a >= 1 && a < Mersenne61.P))
    assert(SimHash64.seedsB.forall(b => b >= 0 && b < Mersenne61.P))
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
