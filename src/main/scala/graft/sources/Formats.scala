package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Multi-format source/sink surface — the analog of the reference's
  * destination writers (/root/reference/etl-destination/src/
  * {snowflake,bigquery,iceberg}): one engine, pluggable egress.
  *
  * Columnar parquet is the primary format (pushdown + pruning);
  * csv/json cover interchange; jdbc covers warehouse egress. Writers
  * take an optional partition column — at 100 TB every table write
  * should be partitioned by its natural pruning key (date/tenant) so
  * downstream scans prune directories, and sized via
  * `maxRecordsPerFile` rather than repartition(1)-style funnels.
  */
object Formats {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Csv extends Format { val name = "csv" }
  case object Json extends Format { val name = "json" }
  case object Orc extends Format { val name = "orc" }

  def read(spark: SparkSession, fmt: Format, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r: DataFrameReader = spark.read.options(options)
    fmt match {
      // csv needs schema/header options to round-trip faithfully
      case Csv => r.option("header", "true").option("inferSchema", "true")
        .csv(path)
      case Json => r.json(path)
      case Orc => r.orc(path)
      case Parquet => r.parquet(path)
    }
  }

  def write(df: DataFrame, fmt: Format, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w0 = df.write.mode(mode)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    fmt match {
      case Csv => w.option("header", "true").csv(path)
      case Json => w.json(path)
      case Orc => w.orc(path)
      case Parquet => w.parquet(path)
    }
  }

  /** Bucketed parquet table write — the co-located-join primitive.
    * Two fact tables bucketed AND sorted on their join key with the
    * same bucket count join with ZERO exchanges (each bucket pair
    * joins locally): at 100 TB this turns the recurring fact-fact
    * shuffle into a one-time layout cost paid at ingest.
    * Requires a table catalog (`saveAsTable`); readers use
    * `spark.table(name)`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path).saveAsTable(table)

  /** Raw media ingest: Spark's `binaryFile` source reads each file as
    * one row (path, modificationTime, length, content) — the entry
    * point that feeds image/audio payloads into the §G multimodal
    * ops. `pathGlobFilter` pushes the extension filter into file
    * listing (files are never opened, let alone read), and
    * `maxBytesPerTrigger`-style batching is unnecessary: each file is
    * already its own row, so partitioning follows the file listing.
    * Cap per-file size upstream — a single row must fit in executor
    * memory. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** JDBC egress (warehouse destination analog). Partitioned reads
    * need (partitionColumn, lowerBound, upperBound, numPartitions)
    * in `options` or the whole table funnels through one task. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(options).format("jdbc")
      .option("url", url).option("dbtable", table).load()

  def writeJdbc(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Append): Unit =
    df.write.options(options).format("jdbc")
      .option("url", url).option("dbtable", table).mode(mode).save()

  /** Small-file compaction. Streaming sinks emit one file per
    * micro-batch per partition; after a week a busy table is millions
    * of KB-sized files and the FILE COUNT — not the byte count — is
    * what kills it at scale: driver-side listing, per-file open cost,
    * one scan task per tiny file. Rewrite the directory into
    * ceil(rows / targetRowsPerFile) files and swap it in. Returns the
    * resulting file count.
    *
    * The swap here is rename-based (write to a sibling tmp dir, move
    * the old dir away, move tmp in) — safe for this library's
    * single-writer batch context. A concurrent-reader deployment does
    * the same rewrite under a table format's atomic commit
    * (Iceberg/Delta rewrite-files); the data motion is identical. */
  def compact(spark: SparkSession, path: String,
      targetRowsPerFile: Long): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    val old = Paths.get(path.stripSuffix("/") + "_compact_old")
    val tmp = path.stripSuffix("/") + "_compact_tmp"
    // crash recovery BEFORE touching anything: a previous compact
    // that died between its two moves left the table at _compact_old
    // and no dir at `path` — restore it (the swap never destroyed
    // data, only displaced it); any leftover debris dirs from a died
    // run would otherwise fail this run's ATOMIC_MOVE with
    // FileAlreadyExists, making compact permanently un-re-runnable
    if (!Files.exists(Paths.get(path)) && Files.isDirectory(old))
      Files.move(old, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) rm(old.toFile)
    if (Files.exists(Paths.get(tmp))) rm(new java.io.File(tmp))
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L,
      (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    Files.move(Paths.get(path), old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path),
      StandardCopyOption.ATOMIC_MOVE)
    rm(old.toFile)
    nFiles
  }
}
