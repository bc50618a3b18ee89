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

  test("jdbc egress round-trips through an embedded Derby warehouse") {
    // Derby ships on Spark's classpath (metastore dependency) — an
    // in-JVM stand-in for the warehouse destination. Spark's
    // DerbyDialect handles the type mapping both ways.
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val nation = Tables.nation(spark, sf)
    writeJdbc(nation, url, "nation_egress", opts,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val back = readJdbc(spark, url, "nation_egress", opts)
      .select(nation.columns.map(col).toSeq: _*)
    assert(back.count() == nation.count(), "jdbc: row count")
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty,
      "jdbc: content drift")
    // appends accumulate — the default egress mode for incremental loads
    writeJdbc(nation, url, "nation_egress", opts)
    assert(readJdbc(spark, url, "nation_egress", opts).count() == 2 * nation.count())
  }

  test("binaryFile ingest reads raw files and feeds the multimodal decode") {
    val tmp = Files.createTempDirectory("graft_bin")
    Files.write(tmp.resolve("a.img"), "hello media".getBytes("UTF-8"))
    Files.write(tmp.resolve("b.img"), Array.fill[Byte](1300)(7))
    Files.write(tmp.resolve("skip.txt"), "not media".getBytes("UTF-8"))

    val files = readBinaryFiles(spark, tmp.toString, Some("*.img"))
    assert(files.count() == 2, "glob must prune non-matching files")
    assert(Seq("path", "modificationTime", "length", "content")
      .forall(files.columns.contains))

    // compose with the §G decode: id derived from the file name
    val s = spark
    import s.implicits._
    val feats = files
      .select(regexp_extract(input_file_name(), "([ab])\\.img$", 1).as("name"),
        col("content"))
      .as[(String, Array[Byte])]
      .map { case (name, bytes) =>
        graft.operators.MultimodalOps.decodeStub(
          graft.operators.MediaBlob(if (name == "a") 1L else 2L, bytes))
      }
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.n_bytes).toSeq == Seq(11L, 1300L))
    assert(feats(1).height == 3) // 1300 bytes / 640 + 1
  }

  test("compact rewrites a many-small-files table losslessly") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    val path = s"$tmp/orders"
    val orders = Tables.orders(spark, sf)
    // simulate a micro-batch sink's debris: 40 files for a tiny table
    orders.repartition(40).write.parquet(path)
    def parts = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts == 40, s"setup expected 40 files, got $parts")
    val rows = orders.count()
    val n = Formats.compact(spark, path, targetRowsPerFile = rows)
    assert(n == 1 && parts == 1, s"expected 1 compacted file, got $parts")
    val back = spark.read.parquet(path)
      .select(orders.columns.map(col).toSeq: _*)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty,
      "compaction changed the data")
    assert(!new java.io.File(s"${path}_compact_tmp").exists() &&
      !new java.io.File(s"${path}_compact_old").exists(),
      "compaction left debris directories")
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
