package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class DecDotSpec extends SparkSpec {

  test("dec_dot is bit-identical to the interpreted HOF formulation on real data") {
    val s = spark
    import s.implicits._
    // every vector paired with every other in a 60-vector sample plus
    // all self-pairs (the norm path) — compare raw double bits
    val e = Tables.embeddings(s, sf).filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding").as("v"))
    val pairs = e.select(col("vec_id").as("a_id"), col("v").as("av"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("v").as("bv")))
    val both = pairs.select(
      VectorMath.dotDec(col("av"), col("bv")).as("fast"),
      VectorMath.dotDecHof(col("av"), col("bv")).as("ref"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (fast, ref) =>
      assert(java.lang.Double.doubleToRawLongBits(fast) ==
        java.lang.Double.doubleToRawLongBits(ref),
        s"bit divergence: $fast vs $ref")
    }
  }

  test("dec_dot null semantics match the HOF: null element and length mismatch") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)), // clean
      (Array(1.0f, 2.0f), Array(3.0f))) // length mismatch
      .toDF("a", "b")
    val out = rows.select(
      VectorMath.dotDec(col("a"), col("b")).as("fast"),
      VectorMath.dotDecHof(col("a"), col("b")).as("ref")).collect()
    assert(!out(0).isNullAt(0) && out(0).getDouble(0) == out(0).getDouble(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1),
      "length mismatch must null both paths")
    // null element nulls the dot in both paths
    val withNull = s.sql(
      "SELECT dec_dot(dec_quant(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))), " +
        "dec_quant(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))) AS d")
    assert(withNull.head.isNullAt(0))
  }

  test("overflow and NaN edge semantics match the HOF under ANSI") {
    val s = spark
    import s.implicits._
    // |x| >= 1e4 overflows DECIMAL(12,8): the ANSI cast throws in the
    // HOF path and dec_quant must throw too (a silent null would
    // silently diverge from the erroring DuckDB oracle)
    val over = Seq((Array(99999.9f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    intercept[Exception] {
      over.select(VectorMath.dotDecHof(col("a"), col("b"))).collect()
    }
    intercept[Exception] {
      over.select(VectorMath.dotDec(col("a"), col("b"))).collect()
    }
    // NaN: the ANSI cast yields a null element → null dot in the HOF;
    // dec_quant nulls the same way
    val nan = Seq((Array(Float.NaN, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val hofRow = nan.select(VectorMath.dotDecHof(col("a"), col("b"))).head
    val fastRow = nan.select(VectorMath.dotDec(col("a"), col("b"))).head
    assert(hofRow.isNullAt(0) && fastRow.isNullAt(0),
      "NaN must null the dot on both paths")
  }

  test("dec_dot survives codegen and the interpreted path agrees") {
    val s = spark
    import s.implicits._
    val df = Seq((Array.fill(64)(0.123f), Array.fill(64)(-0.456f)))
      .toDF("a", "b")
    val viaSql = df.selectExpr("dec_dot(dec_quant(a), dec_quant(b)) AS d")
      .as[Double].head()
    val direct = {
      val qa = DecDot.quant(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.fill(64)(0.123f)))
      val qb = DecDot.quant(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.fill(64)(-0.456f)))
      DecDot.dot(qa, qb).doubleValue()
    }
    assert(java.lang.Double.doubleToRawLongBits(viaSql) ==
      java.lang.Double.doubleToRawLongBits(direct))
  }
}
