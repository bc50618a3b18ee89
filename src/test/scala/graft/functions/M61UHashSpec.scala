package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class M61UHashSpec extends SparkSpec {

  private val P = Mersenne61.P

  test("m61_uhash matches the BigInt (a*u+b) mod p reference with the " +
      "61-bit mask, including negative and huge u") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val us = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, P, P - 1,
      P + 1) ++ Seq.fill(50)(rnd.nextLong())
    val a = 987654321L
    val b = 123456789L
    val got = us.toDF("u")
      .select(col("u"), expr(s"m61_uhash(u, ${a}L, ${b}L)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    us.foreach { u =>
      val expect =
        ((BigInt(a) * BigInt(u & P) + b) % BigInt(P)).toLong
      assert(got(u) == expect, s"m61_uhash($u)")
      assert(got(u) >= 0 && got(u) < P, s"out of range for $u")
    }
  }

  test("m61_uhash rejects out-of-range seeds at analysis time") {
    // ADVICE r10: the function is publicly registered — a ∉ [1,p)
    // breaks mulMod's precondition and b near Long.MaxValue overflows
    // the h1+b sum, silently returning garbage if not rejected.
    def bad(sql: String): Unit = {
      val e = intercept[Exception](
        spark.sql(s"SELECT $sql FROM range(1)").collect())
      assert(e.getMessage.contains("m61_uhash seed"),
        s"expected seed-range rejection for $sql, got: ${e.getMessage}")
    }
    bad("m61_uhash(id, 0L, 5L)") // a = 0
    bad(s"m61_uhash(id, ${P}L, 5L)") // a = p
    bad("m61_uhash(id, -3L, 5L)") // a < 0
    bad("m61_uhash(id, 7L, -1L)") // b < 0
    bad(s"m61_uhash(id, 7L, ${Long.MaxValue}L)") // b ≥ p
    // in-range seeds still pass
    val ok = spark.sql(s"SELECT m61_uhash(id, 7L, ${P - 1}L) AS h FROM range(3)")
      .collect().map(_.getLong(0))
    assert(ok.forall(h => h >= 0 && h < P))
  }
}
