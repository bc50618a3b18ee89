package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join and keys on (key, salt)") {
    val s = spark
    // a deliberately hot key: collapse most orders onto one customer
    val fact = Tables.orders(s, sf)
      .withColumn("custkey",
        when(col("o_orderkey") % 10 < 8, lit(1L))
          .otherwise(col("o_custkey")))
      .select("o_orderkey", "custkey", "o_totalprice")
    val dim = Tables.customer(s, sf)
      .select(col("c_custkey").as("custkey"), col("c_name"))

    val plain = fact.join(dim, Seq("custkey"))
    val salted = Skew.saltedJoin(fact, dim, "custkey", salts = 8)

    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    val p = plain.select(plain.columns.sorted.map(col).toSeq: _*)
    val q = salted.select(plain.columns.sorted.map(col).toSeq: _*)
    assert(q.exceptAll(p).isEmpty && p.exceptAll(q).isEmpty,
      "salting changed the join result")

    // the physical join must key on the salt, not bare custkey
    val joins = q.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.exists(_.leftKeys.exists(_.references.exists(
      _.name == "__salt"))), "salt missing from the physical join keys")
  }
}
