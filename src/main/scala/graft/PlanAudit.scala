package graft
/** Dev tool: dumps formatted physical plans for the headline queries
  * so scan pushdown / join strategies / codegen spans can be audited
  * (SURVEY §5 commitments). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("plan-audit")
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q6_revenue_change", "q3_shipping_priority",
        "q5_local_supplier", "ev_sessionize", "dedup_minhash", "sim_topk_exact")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
