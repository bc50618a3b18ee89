package graft

/** Dev tool: print the planned exchange count for every registered
  * query (or the ones named on the command line) at sf0.001 — the
  * numbers PlanAuditSpec pins. Usage:
  *   runMain graft.PlanCount [queryName...]
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    // Engine.session carries the nanos-timestamp + AQE config every
    // registered query assumes — a bare builder breaks events-table
    // plans at footer-read time
    val spark = Engine.session("graft-plancount")
    spark.sparkContext.setLogLevel("ERROR")
    val re = "Exchange (hash|range)partitioning|Exchange SinglePartition".r
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val txt = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val reused = "ReusedExchange".r.findAllIn(txt).size
      println(s"$n shuffles=${re.findAllIn(txt).size} reused=$reused")
    }
    spark.stop()
  }
}
