package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class AnomEvent(ts: Timestamp, event_type: String)

class AnomalyStreamSpec extends SparkSpec {

  private def at(hours: Int, i: Int) =
    new Timestamp(hours * 3600000L + i * 1000L)

  // baseline series: 4 quiet hours of 1 event + the spike hour of 16
  // gives mean 4, σ 6 (the ev_anomaly spec's hand-computed shape)
  private def burst(tpe: String, hour: Int, k: Int): Seq[AnomEvent] =
    (0 until k).map(i => AnomEvent(at(hour, i), tpe))

  private val history =
    (0 until 4).flatMap(burst("spiky", _, 1)) ++ burst("spiky", 4, 16) ++
      (0 until 5).flatMap(burst("flat", _, 2))

  test("closed streaming windows score exactly what the batch formula scores") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val baseline = AnomalyStream.baselineOf(history.toDF())
    val input = MemoryStream[AnomEvent]
    val q = AnomalyStream.zScores(input.toDF(), baseline)
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    try {
      input.addData(history: _*)
      // advance the watermark far enough to close every history hour
      input.addData(AnomEvent(at(20, 0), "spiky"))
      q.processAllAvailable()
      val got = s.table("anom_stream")
        .select("event_type", "window_start", "n_events", "z")
        .collect().map(_.toSeq).toSet
      // batch twin over the same frame with the same baseline —
      // only hours the watermark closed (start < 18h) are comparable
      val want = AnomalyStream.zScores(history.toDF(), baseline)
        .collect().map(_.toSeq).toSet
      assert(got == want,
        s"stream z-scores diverged: ${got.diff(want)} vs ${want.diff(got)}")
      // σ = 0 "flat" type never appears; the spike hour scores z = 2
      assert(got.forall(_.head == "spiky"))
      val spike = s.table("anom_stream")
        .filter(col("n_events") === 16).collect()
      assert(spike.length == 1 && spike(0).getAs[Double]("z") == 2.0)
    } finally q.stop()
  }

  test("sustained danger tier from the stream pages through AlertManager") {
    val s = spark
    import s.implicits._

    var now = 0L
    val alerts = scala.collection.mutable.Buffer.empty[AlertManager.Alert]
    val manager = new AlertManager(alerts += _, sustainMillis = 100,
      clock = () => now)

    val baseline = AnomalyStream.baselineOf(history.toDF())
    val scored = AnomalyStream.zScores(history.toDF(), baseline)
    val worst = AnomalyStream.worstByType(scored)
      .as[(String, Double)].collect().toSeq
    assert(worst.map(_._1) == Seq("spiky"), s"per-type reduction: $worst")

    AnomalyStream.observe(manager, worst) // episode opens, not sustained
    assert(alerts.isEmpty)
    now = 150 // past sustainMillis with the danger tier still present
    AnomalyStream.observe(manager, worst)
    assert(alerts.map(a => (a.pipeline, a.kind, a.tier)) ==
      Seq(("anomaly:spiky", AlertManager.Triggered, LagListener.Danger)))
    // recovery: a quiet batch returns the type to Ok
    AnomalyStream.observe(manager, Seq("spiky" -> 0.3))
    assert(alerts.last.kind == AlertManager.Recovered)
  }
}
