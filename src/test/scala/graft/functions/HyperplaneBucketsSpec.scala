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
}
