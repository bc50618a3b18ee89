package graft
/** Per-round benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR with a noop-format write (materializes every
  * column — `.count()` would let Catalyst prune the aggregates) after
  * one untimed warmup pass (JVM/codegen). Failures are fatal. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    def runOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOne) // warmup: JVM JIT + codegen cache + FS cache
    val results = names.map(n => n -> runOne(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
