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

      // the documented consumer view: freshest row per (key, user),
      // est = 0 retractions dropped on read
      val rows = s.table("hh_stream").as[Hitter].collect()
      val freshest = rows.groupBy(h => (h.event_type, h.user_id))
        .view.mapValues(_.maxBy(_.n)).values.toSeq
      val summary = freshest.filter(_.est > 0)
        .map(h => h.user_id -> h.est).toMap

      // eviction retraction contract: any item whose freshest row is
      // NOT in the final summary must have been retracted (est = 0) —
      // no ghost heavy hitters survive in the freshest-row view
      val maxN = rows.map(_.n).max
      val live = rows.filter(r => r.n == maxN && r.est > 0)
        .map(_.user_id).toSet
      freshest.filterNot(h => live.contains(h.user_id)).foreach { h =>
        assert(h.est == 0L,
          s"evicted item ${h.user_id} ghosts with est=${h.est} at n=${h.n}")
      }
      assert(freshest.exists(_.est == 0L),
        "this stream forces evictions — at least one retraction expected")

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
