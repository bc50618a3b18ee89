package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShingleHash3Spec extends SparkSpec {

  test("hash-set cardinality matches the string-shingle construction on sf0.001") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("t"))
    val viaStrings = d.select(col("doc_id"), size(expr(
      """array_distinct(if(size(t) >= 3,
        |  transform(sequence(0, size(t) - 3), i ->
        |    concat(element_at(t, i + 1), ' ', element_at(t, i + 2), ' ',
        |           element_at(t, i + 3))), array()))"""
        .stripMargin.replaceAll("\n\\s*", " "))).as("n"))
    val viaHashes = d.select(col("doc_id"), size(expr("shingle_hash3(t)")).as("n"))
    assert(viaHashes.exceptAll(viaStrings).isEmpty &&
      viaStrings.exceptAll(viaHashes).isEmpty,
      "hashed shingle-set sizes diverge from string shingle-set sizes")
  }

  test("identical windows collapse, boundary shifts do not collide") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Seq("a", "b", "c", "a", "b", "c")),  // windows repeat
      (2L, Seq("ab", "c", "d")),                 // boundary variant 1
      (3L, Seq("a", "bc", "d")),                 // boundary variant 2
      (4L, Seq("a", "b")))                       // too short
      .toDF("id", "t")
      .select(col("id"), expr("shingle_hash3(t)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).size == 3) // windows abc,bca,cab,abc -> 3 distinct
    assert(rows(2L).size == 1 && rows(3L).size == 1)
    assert(rows(2L) != rows(3L), "token boundaries must affect the hash")
    assert(rows(4L).isEmpty)
  }
}
