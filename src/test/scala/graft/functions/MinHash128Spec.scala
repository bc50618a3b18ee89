package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHash128Spec extends SparkSpec {

  test("native minhash128 matches the relational min(xxhash64(k, h)) formulation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq(11L, 22L, 33L, 44L)),
      (2L, Seq(11L, 22L, 33L)),
      (3L, Seq(99L))).toDF("doc_id", "s")

    val native = docs.select(col("doc_id"), expr("minhash128(s)").as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "m")))

    val relational = docs.select(col("doc_id"), explode(col("s")).as("h"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 127), k -> xxhash64(k, h))")).as(Seq("k", "v")))
      .groupBy("doc_id", "k").agg(min("v").as("m"))

    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }

  test("identical shingle sets produce identical signatures, supersets differ") {
    val s = spark
    import s.implicits._
    val sigs = Seq(
      (1L, Seq(5L, 6L, 7L)), (2L, Seq(7L, 6L, 5L)), (3L, Seq(5L, 6L, 7L, 8L)))
      .toDF("doc_id", "s")
      .select(col("doc_id"), expr("minhash128(s)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "order must not matter")
    assert(sigs(1L) != sigs(3L))
    // superset: every min can only go down
    assert(sigs(3L).zip(sigs(1L)).forall { case (sup, sub) => sup <= sub })
  }
}
