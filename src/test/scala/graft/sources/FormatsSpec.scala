package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Formats._

class FormatsSpec extends SparkSpec {

  test("csv/json/orc/parquet round-trip the nation table faithfully") {
    val nation = Tables.nation(spark, sf)
    val tmp = Files.createTempDirectory("graft_fmt").toString
    for (fmt <- Seq(Parquet, Csv, Json, Orc)) {
      val path = s"$tmp/${fmt.name}"
      write(nation, fmt, path)
      val back = read(spark, fmt, path)
        .select(nation.columns.map(col).toSeq: _*) // column order
      assert(back.count() == nation.count(), s"${fmt.name}: row count")
      assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty,
        s"${fmt.name}: content drift")
    }
  }

  test("partitioned parquet write prunes by partition directory") {
    val tmp = Files.createTempDirectory("graft_part").toString
    write(Tables.orders(spark, sf).withColumn("status", col("o_orderstatus")),
      Parquet, tmp, partitionBy = Seq("status"))
    val pruned = read(spark, Parquet, tmp).filter(col("status") === "O")
    // partition pruning shows up as a PartitionFilters entry, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("status"),
      s"expected partition pruning in plan:\n$plan")
    assert(pruned.count() ==
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count())
  }
}
