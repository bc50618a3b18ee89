package graft

/** Dev utility: print each registered query's planned shuffle count at
  * the spec SF, for auditing PlanAuditSpec budget pins.
  * `sbt "Test/runMain graft.ShuffleCount [name ...]"` */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-shufflecount")
    val sf = "/root/testdata/sf0.001"
    val shuffleRe =
      "Exchange (hash|range)partitioning|Exchange SinglePartition".r
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val txt = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      println(s"$name ${shuffleRe.findAllIn(txt).size}")
    }
    spark.stop()
  }
}
