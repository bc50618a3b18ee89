package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps
import graft.sources.Tables

case class RawDoc(doc_id: Long, text: String)

class DistillGateStreamSpec extends SparkSpec {

  test("streamed gate scores are bit-identical to the batch scorer " +
      "and admission matches the trained decision boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val model = TextOps.distillTrain(s, sf)
    val docs = Tables.documents(s, sf).select("doc_id", "text")
      .as[RawDoc].collect().toSeq

    val input = MemoryStream[RawDoc]
    val q = DistillGateStream.gate(input.toDF(), model)
      .select("doc_id", "pq", "p")
      .writeStream.format("memory").queryName("distill_gate")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = s.table("distill_gate")
        .select("doc_id", "pq").as[(Long, Long)].collect().toMap

      val batch = TextOps.distillScore(docs.toDF(), model)
        .select("doc_id", "pq", "admitted")
        .as[(Long, Long, Boolean)].collect()

      // every admitted batch doc came through the stream with the
      // SAME quarter-nano score; every rejected doc was held back
      batch.foreach { case (id, pq, admitted) =>
        if (admitted)
          assert(streamed.get(id).contains(pq),
            s"doc $id: stream score ${streamed.get(id)} != batch $pq")
        else
          assert(!streamed.contains(id), s"doc $id leaked past the gate")
      }
      assert(streamed.keySet == batch.filter(_._3).map(_._1).toSet)
      // the trained gate must actually discriminate on this corpus
      val nAdmitted = batch.count(_._3)
      assert(nAdmitted > 0 && nAdmitted < batch.length,
        s"degenerate gate: $nAdmitted of ${batch.length} admitted")
    } finally q.stop()
  }

  test("the frozen scaler clamps out-of-range stream docs instead of " +
      "extrapolating") {
    val s = spark
    import s.implicits._
    val model = TextOps.distillTrain(s, sf)
    // a doc far longer than anything in training: x2 >> mx2
    val monster = RawDoc(999999L,
      Seq.tabulate(5000)(i => s"w$i").mkString(" "))
    val row = TextOps.distillScore(Seq(monster).toDF(), model)
      .select("pq").head()
    val atMax = TextOps.distillScore(
      Seq(RawDoc(999998L, Seq.tabulate(model.mx2.toInt)(i => s"w$i")
        .mkString(" "))).toDF(), model)
      .select("pq").head()
    assert(row.getLong(0) == atMax.getLong(0),
      "scores past the scaler range must clamp to the range edge")
  }
}
