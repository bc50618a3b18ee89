package graft.functions

import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmAssignSpec extends SparkSpec {

  /** Reference semantics, computed independently with BigDecimal:
    * per dim x = n·d − s (unscaled scale-8), x → double via the
    * arbitrary-precision conversion, squared, HALF_UP to scale 6,
    * exact sum, → double, ÷ n²; argmin with first-wins ties. */
  private def refBest(dv: Array[Long], cs: Seq[(Long, Long, Array[Long])])
      : (Long, Double) = {
    val dists = cs.map { case (cluster, n, sArr) =>
      var acc = BigInteger.ZERO
      dv.indices.foreach { i =>
        val x = BigInteger.valueOf(n).multiply(BigInteger.valueOf(dv(i)))
          .subtract(BigInteger.valueOf(sArr(i)))
        val xd = new JBD(x, 8).doubleValue()
        val sq = JBD.valueOf(xd * xd).setScale(6, RoundingMode.HALF_UP)
        acc = acc.add(sq.unscaledValue)
      }
      val dist = new JBD(acc, 6).doubleValue() / (n * n).toDouble
      (cluster, dist)
    }
    dists.reduceLeft((a, b) => if (b._2 < a._2) b else a)
  }

  test("km_assign matches the BigDecimal reference on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val dims = 16
    val k = 5
    // centroids as plausible (sum, count) pairs
    val cs = (0 until k).map { c =>
      val n = 1L + rnd.nextInt(200)
      (c.toLong, n,
        Array.fill(dims)((rnd.nextGaussian() * n * 1e8).toLong))
    }
    val vecs = (0 until 200).map { v =>
      (v.toLong, Array.fill(dims)((rnd.nextGaussian() * 1e8).toLong))
    }
    val csLit = typedLit(cs.map { case (c, n, arr) => (c, n, arr.toSeq) })
    val out = vecs.toDF("vec_id", "dq").withColumn("cs", csLit)
      .selectExpr("vec_id", "km_assign(dq, cs) AS b")
      .select(col("vec_id"), col("b.cluster").as("cluster"),
        col("b.dist_sq").as("dist_sq"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    vecs.foreach { case (id, dv) =>
      val (wantC, wantD) = refBest(dv, cs)
      val (gotC, gotD) = out(id)
      assert(gotC == wantC && gotD == wantD,
        s"vec $id: got ($gotC, $gotD), want ($wantC, $wantD)")
    }
  }

  test("equidistant centroids break to the lowest cluster id in array order") {
    val s = spark
    import s.implicits._
    // two IDENTICAL centroids (ids 3 and 7): distances tie exactly
    val sArr = Seq(100000000L, -200000000L)
    val cs = Seq((3L, 2L, sArr), (7L, 2L, sArr))
    val out = Seq((0L, Seq(50000000L, 25000000L))).toDF("vec_id", "dq")
      .withColumn("cs", typedLit(cs))
      .selectExpr("km_assign(dq, cs) AS b")
      .select(col("b.cluster")).collect()
    assert(out(0).getLong(0) == 3L, "tie must keep the first (lowest) id")
  }

  test("dimension mismatch fails loudly instead of fabricating a distance") {
    val s = spark
    import s.implicits._
    val cs = Seq((0L, 1L, Seq(1L, 2L, 3L)))
    val ex = intercept[Exception] {
      Seq((0L, Seq(1L, 2L))).toDF("vec_id", "dq")
        .withColumn("cs", typedLit(cs))
        .selectExpr("km_assign(dq, cs) AS b").collect()
    }
    assert(ex.getMessage != null)
  }

  test("null elements and overflowing clusters fail loudly instead of " +
      "fabricating a distance") {
    val s = spark
    import s.implicits._
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse(c.getClass.getName)
    }
    // a null vector slot: previously read as 0, silently assigning a
    // wrong cluster — now IllegalArgumentException
    val e1 = intercept[Exception] {
      Seq(1).toDF("x").selectExpr(
        "km_assign(array(1L, CAST(NULL AS BIGINT)), " +
          "array(named_struct('cluster', 0L, 'n', 1L, " +
          "'s_arr', array(1L, 1L)))) AS b").collect()
    }
    assert(rootMsg(e1).contains("null element"), rootMsg(e1))
    // a giant-cluster n·d past long: previously wrapped into garbage —
    // now the Exact intrinsics throw
    val e2 = intercept[Exception] {
      Seq(1).toDF("x").selectExpr(
        "km_assign(array(999999999999L), " +
          "array(named_struct('cluster', 0L, 'n', 100000000L, " +
          "'s_arr', array(0L)))) AS b").collect()
    }
    assert(rootMsg(e2).toLowerCase.contains("overflow"), rootMsg(e2))
  }
}
