package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.HeavyHitterStream.{HhEvent, Hitter}

class HeavyHitterStreamSpec extends SparkSpec {

  test("MG summary keeps every true heavy hitter within the deficiency bound") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val k = 4
    // one skewed stream: users 1..3 are heavy, 100.. are a long tail
    // of singletons that forces constant MG eviction pressure
    val batch1 = (1 to 30).map(_ => HhEvent("click", 1)) ++
      (1 to 20).map(_ => HhEvent("click", 2)) ++
      (100L to 119L).map(u => HhEvent("click", u))
    val batch2 = (1 to 25).map(_ => HhEvent("click", 3)) ++
      (1 to 10).map(_ => HhEvent("click", 1)) ++
      (120L to 139L).map(u => HhEvent("click", u))

    val input = MemoryStream[HhEvent]
    val q = HeavyHitterStream.summarize(input.toDS(), k)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()

      // freshest summary row per (key, user) = the max-n emission
      val rows = s.table("hh_stream").as[Hitter].collect()
      val maxN = rows.map(_.n).max
      val summary = rows.filter(_.n == maxN)
        .map(h => h.user_id -> h.est).toMap

      val all = batch1 ++ batch2
      val exact = all.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      val n = all.size.toLong
      val bound = n / (k + 1)

      // (a) anything above the MG frequency threshold MUST be present
      exact.filter(_._2 > bound).keys.foreach { u =>
        assert(summary.contains(u),
          s"true heavy hitter $u (count ${exact(u)}) missing from $summary")
      }
      // (b) estimates never overcount and undercount by ≤ n/(k+1)
      summary.foreach { case (u, est) =>
        assert(est <= exact(u), s"MG overcounted $u: $est > ${exact(u)}")
        assert(est >= exact(u) - bound,
          s"MG deficiency for $u exceeds n/(k+1): $est vs ${exact(u)}")
      }
      // (c) state is genuinely bounded
      assert(summary.size <= k, s"summary exceeds k: $summary")
    } finally q.stop()
  }
}
