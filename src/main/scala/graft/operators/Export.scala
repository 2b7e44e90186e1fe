package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-directed export conversion + sinks — the reference's
  * `DataExtractor` surface (SURVEY §2.1 S9-S12, §2.6 F3/F4).
  *
  * The reference converts doc-at-a-time in Python
  * (`core/extractor.py:91-246`); here the whole conversion is a single
  * schema-directed projection built at plan time — every rule is a
  * Catalyst expression, so conversion of a 100 TB export stays inside
  * whole-stage codegen.
  */
object Export {

  /** ISO-8601 with microseconds + zone offset suffix, the reference's
    * export timestamp shape (`core/extractor.py:179-186`: naive ⇒
    * assume UTC, then convert to the target zone; fixture 5 expects
    * `2023-01-01T13:00:00+01:00`-style offsets, DST-aware).
    *
    * `date_format` renders in the *session* zone, so the instant is
    * first shifted by `to_utc_timestamp(c, sessionTz)` — the render
    * step adds the session offset back, leaving a correct wall-clock
    * in the requested zone whatever `spark.sql.session.timeZone` is.
    * (Under a UTC session — all repo entry points — the shift is a
    * no-op and output is unchanged.)
    */
  def isoTimestamp(c: Column, tz: String = "UTC"): Column = {
    val sessionTz =
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    val utcWall = to_utc_timestamp(c, sessionTz)
    if (tz == "UTC")
      concat(date_format(utcWall, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        lit("+00:00"))
    else {
      val shifted = from_utc_timestamp(utcWall, tz)
      // offset = wall-clock delta; casting a timestamp to long yields
      // epoch seconds, so this follows the zone's DST rules
      val offMin = ((from_utc_timestamp(c, tz).cast("long") - c.cast("long"))
        / 60).cast("long")
      val sign = when(offMin < 0, lit("-")).otherwise(lit("+"))
      val a = abs(offMin)
      concat(date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        sign, lpad((a / 60).cast("long").cast("string"), 2, "0"),
        lit(":"), lpad((a % 60).cast("long").cast("string"), 2, "0"))
    }
  }

  /** F3: one column → its JSON-compatible export form, by type
    * (`core/extractor.py:91-208`): timestamps → tz-aware ISO strings,
    * decimals → plain strings (precision-preserving, `:196-197`),
    * binary → hex (`:199-200`), arrays converted element-wise
    * (`:103-129`), structs recursed (`:235-241`), scalars pass through.
    */
  def convertValue(c: Column, dt: DataType, tz: String = "UTC"): Column =
    dt match {
      case TimestampType | TimestampNTZType => isoTimestamp(c, tz)
      case DateType         => date_format(c, "yyyy-MM-dd")
      case _: DecimalType   => c.cast(StringType)
      case BinaryType       => lower(hex(c))
      case ArrayType(et, _) => transform(c, x => convertValue(x, et, tz))
      case st: StructType   =>
        struct(st.fields.toSeq.map(f =>
          convertValue(c.getField(f.name), f.dataType, tz).as(f.name)): _*)
      case _                => c
    }

  /** F4: whole-DataFrame conversion — the export projection. */
  def convertForExport(df: DataFrame, tz: String = "UTC"): DataFrame =
    df.select(df.schema.fields.toSeq.map(f =>
      convertValue(col(f.name), f.dataType, tz).as(f.name)): _*)

  /** S9: gzip JSON export. Distributed JSON-lines by default (the
    * scalable shape); the reference writes a single gzip JSON *array*
    * (`core/extractor.py:248-359`), available via `singleFile = true`
    * (driver-side stream over `toLocalIterator` — exact parity, only
    * for human-scale exports).
    */
  def writeJsonGz(df: DataFrame, path: String, tz: String = "UTC",
                  singleFile: Boolean = false): Unit = {
    val converted = convertForExport(df, tz)
    if (!singleFile) {
      converted.write.mode("overwrite")
        .option("compression", "gzip").json(path)
    } else {
      val it = converted.toJSON.toLocalIterator()
      // explicit UTF-8 writer, NOT PrintWriter: PrintWriter swallows
      // I/O errors, silently truncating the export on disk-full
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(path)),
        java.nio.charset.StandardCharsets.UTF_8))
      try {
        out.write("[")
        var first = true
        while (it.hasNext) {
          if (!first) out.write(",")
          out.write("\n")
          out.write(it.next())
          first = false
        }
        out.write("\n]")
      } finally out.close()
    }
  }

  /** S10/S11: driver-side JSON file sink for small rendered artifacts
    * (hierarchical schema, sample docs).
    */
  def writeJsonFile(json: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)

  /** S12: stats table → CSV with QUOTE_ALL
    * (`views/schema_analysis_view.py:517-554`).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(path)

  /** Stage a DataFrame as a bucketed + sorted parquet table — the 100 TB
    * co-location move this library's SCALE notes lean on: two tables
    * bucketed the same way on the join/grouping key sort-merge join (or
    * aggregate) with NO exchange, because the on-disk layout already
    * satisfies the required hash partitioning. Registered as an
    * external table at `path` (bucket metadata lives in the session
    * catalog; `bucketBy` requires `saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the 100 TB lake-maintenance op: a
    * landing zone written by many streaming micro-batches / tasks
    * accumulates thousands of KB-sized parquet files, and scan
    * planning cost grows with file count, not data size. Rewrites
    * `inPath` to `outPath` in ~`targetFileBytes` files (from the
    * source's actual on-disk size), optionally sorted within
    * partitions by `sortCol` so parquet row-group min/max stats become
    * selective (data skipping — the poor man's Z-order for a single
    * key). Row content is preserved exactly (oracle-checked via
    * read-back).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long = 128L << 20,
              sortCol: Option[String] = None): Unit = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    // resolve the filesystem FROM the path: FileSystem.get(conf) is
    // the default FS and throws "Wrong FS" for s3a://…/abfs://… paths
    // — exactly the lake paths this op exists for
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    val shaped = sortCol match {
      // repartitionByRange + sortWithinPartitions: globally
      // range-clustered on the key, so each output file covers a
      // narrow key range and row-group stats prune hard
      case Some(c) => df.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(c)
      case None => df.repartition(nFiles)
    }
    shaped.write.mode("overwrite").parquet(outPath)
  }

  /** Hive-style partitioned parquet sink — the OTHER 100 TB layout
    * lever next to bucketing: a query filtering on the partition
    * column reads only matching directories (partition pruning happens
    * at planning, before any I/O — `PartitionFilters` in the scan
    * node, plan-spec'd). Partition by low-cardinality scan predicates
    * (date, source, format); bucket by join/group keys.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: String*): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
