package graft

/** Dev utility: print a registered query's full physical plan at the
  * spec SF, for auditing exchange placement when a shuffle-budget pin
  * surprises. `sbt "Test/runMain graft.PlanDump <name> [sfDir]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-plandump")
    val sf = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    args.headOption.foreach { name =>
      println(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
