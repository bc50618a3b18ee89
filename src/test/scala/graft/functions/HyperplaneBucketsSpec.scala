package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HyperplaneBucketsSpec extends SparkSpec {

  test("hyperplane_buckets is registered, codegen-stable, and matches compute()") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.tabulate(64)(i => (i - 32) / 10.0f)),
      (3L, Array.fill(64)(-1.0f)))
    val df = vecs.toDF("id", "v")
    // SQL registration + whole-stage codegen path
    val got = df.selectExpr("id", "hyperplane_buckets(v) AS k")
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      // pure twin: same loop the generated code calls into
      val expect = HyperplaneBuckets.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        HyperplaneBuckets.PLANES)
        .toLongArray.toSeq
      assert(got(id) == expect, s"codegen/eval divergence for vec $id")
      assert(got(id).size == HyperplaneBuckets.TABLES)
      assert(got(id).forall(k => k >= 0 && k < (1L << HyperplaneBuckets.PLANES)),
        "key outside the sign-bit range")
    }
    // sign-flip symmetry: -v flips every plane sign except exact-zero
    // dots, so v and -v land in complementary buckets
    val flipped = df.select(col("id"),
        expr("transform(v, x -> -x)").cast("array<float>").as("v"))
      .selectExpr("id", "hyperplane_buckets(v) AS k")
      .as[(Long, Seq[Long])].collect().toMap
    val mask = (1L << HyperplaneBuckets.PLANES) - 1
    assert(flipped(1L) == got(1L).map(k => ~k & mask),
      "negation must complement the sign bits (no zero dots for vec 1)")
  }

  test("every width is a bit-prefix of the wide table (derived widths compose)") {
    // the r10 auto-scale contract: plane p of table t is row
    // (t·MAXPLANES + p) of ONE seeded draw, so a w-bit key is exactly
    // the top w bits of the 16-bit key — widening a corpus's keys
    // REFINES its buckets (every wide bucket nests inside a narrow
    // one), which is what makes the derived width safe to change
    // between corpus sizes without re-verifying the construction
    val s = spark
    import s.implicits._
    val df = Seq(
      Tuple1(Array.tabulate(64)(i => math.sin(i * 2.7).toFloat)),
      Tuple1(Array.tabulate(64)(i => (i % 7 - 3) / 4.0f)))
      .toDF("v")
    val keys = df.selectExpr(
      "hyperplane_buckets(v, 6) AS k6",
      "hyperplane_buckets(v, 11) AS k11",
      "hyperplane_buckets(v, 16) AS k16")
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()
    keys.foreach { case (k6, k11, k16) =>
      assert(k6 == k16.map(_ >>> 10), "6-bit keys must prefix 16-bit keys")
      assert(k11 == k16.map(_ >>> 5), "11-bit keys must prefix 16-bit keys")
    }
    // the registered width-6 table is bit-identical to every prior
    // round's draw (the historical sequence is emitted first)
    val rnd = new java.util.Random(HyperplaneBuckets.SEED)
    val historical = Array.fill(
      HyperplaneBuckets.TABLES * HyperplaneBuckets.PLANES)(
      Array.fill(HyperplaneBuckets.DIMS)(rnd.nextInt(2049) - 1024))
    assert(HyperplaneBuckets.weights.zip(historical)
      .forall { case (a, b) => a.sameElements(b) },
      "width-6 weights must reproduce the pre-r10 registered table")
  }

  test("derivePlanes holds bucket occupancy across corpus sizes") {
    import HyperplaneBuckets.{derivePlanes, MAXPLANES, PLANES, TARGET_BUCKET}
    assert(derivePlanes(0) == PLANES)
    assert(derivePlanes(512) == 6) // 2^6·8 = 512: boundary stays narrow
    assert(derivePlanes(513) == 7) // one past it widens
    assert(derivePlanes(2000) == 8)
    assert(derivePlanes(20000) == 12)
    assert(derivePlanes(Long.MaxValue) == MAXPLANES, "cap at the wide table")
    // the invariant the formula exists for: expected occupancy at the
    // derived width never exceeds the target (until the cap)
    Seq(100L, 1000L, 10000L, 100000L, 500000L).foreach { n =>
      val p = derivePlanes(n)
      assert(p == MAXPLANES || (1L << p) * TARGET_BUCKET >= n,
        s"occupancy above target at n=$n planes=$p")
      assert(p >= PLANES && p <= MAXPLANES)
    }
  }
}
