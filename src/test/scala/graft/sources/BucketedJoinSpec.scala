package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed fact tables join with zero exchanges") {
    val s = spark
    val tmp = Files.createTempDirectory("graft_bucket").toString
    Formats.writeBucketed(Tables.orders(s, sf), "orders_b",
      s"$tmp/orders_b", "o_custkey", 8)
    Formats.writeBucketed(
      Tables.customer(s, sf).select("c_custkey", "c_name"), "customer_b",
      s"$tmp/customer_b", "c_custkey", 8)
    // force the sort-merge path: a broadcast join would hide whether
    // the bucket layout actually removed the shuffle
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("orders_b")
        .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.orders(s, sf).count(),
        "every order matches exactly one customer")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
