package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north-star): image / audio
  * / video payloads ride as opaque `binary` columns with typed metadata
  * alongside. The Spark-side machinery — schema shape, format sniffing,
  * batch-partitioned processing — is real and tested; the actual media
  * DECODE step is a clearly marked deterministic STUB (this environment
  * has no image/audio libraries), structured so a real decoder drops
  * into [[mapBatches]] without touching the pipeline.
  */
object Multimodal {

  /** Magic-number format sniff over the first bytes of a binary column —
    * pure built-ins (hex + substring ladder), codegen-friendly.
    */
  def sniffFormat(bin: Column): Column = {
    val h = hex(bin)   // uppercase hex
    when(substring(h, 1, 6) === "FFD8FF", "jpeg")
      .when(substring(h, 1, 16) === "89504E470D0A1A0A", "png")
      .when(substring(h, 1, 8) === "52494646" &&
        substring(h, 17, 8) === "57415645", "wav")     // RIFF....WAVE
      .when(substring(h, 9, 8) === "66747970", "mp4")  // ....ftyp
      .otherwise("unknown")
  }

  /** Typed metadata projection for a binary media column: byte length,
    * sniffed format, content hash. The partition-friendly "catalog"
    * columns a 100 TB media lake is organized by.
    */
  def attachMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast(LongType))
      .withColumn("format", sniffFormat(col(binCol)))
      .withColumn("content_md5", md5(hex(col(binCol))))   // via hex: portable

  /** STUB image decode: deterministic fake dimensions derived from the
    * content hash — stands in for a real decoder's (width, height)
    * output so downstream resize/bucket logic is testable. Replace the
    * expression with a real codec via [[mapBatches]] in production.
    */
  def stubDecodeDims(bin: Column): (Column, Column) = {
    val h = md5(hex(bin))
    val w = (conv(substring(h, 1, 4), 16, 10).cast(IntegerType) % 1920 + 1)
      .cast(LongType)
    val ht = (conv(substring(h, 5, 4), 16, 10).cast(IntegerType) % 1080 + 1)
      .cast(LongType)
    (w, ht)
  }

  /** Batched per-partition processing — the Scala analogue of
    * `mapInPandas`: rows are fed to `f` in batches of `batchSize` (the
    * shape model-inference wants), results flattened back. Runs on
    * executors; `f` must be serializable.
    */
  def mapBatches(df: DataFrame, batchSize: Int, outSchema: StructType)(
      f: Seq[Row] => Seq[Row]): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => f(batch))
    }(enc)
  }

  /** Full media-meta pipeline over a constructed binary column (the
    * test tables carry no real media; documents' text bytes with a
    * per-row magic prefix exercise every sniff branch).
    */
  def mediaMeta(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val magic = when(col(idCol) % 4 === 0,
        unhex(lit("FFD8FFE0")))                       // jpeg
      .when(col(idCol) % 4 === 1, unhex(lit("89504E470D0A1A0A")))  // png
      .when(col(idCol) % 4 === 2,
        unhex(lit("524946460000000057415645")))       // RIFF....WAVE
      .otherwise(unhex(lit("00")))                    // unknown
    val withBin = df.select(col(idCol),
      concat(magic, encode(col(textCol), "UTF-8")).as("payload"))
    val meta = attachMeta(withBin, "payload")
    val (w, h) = stubDecodeDims(col("payload"))
    meta.select(col(idCol), col("byte_len"), col("format"),
        col("content_md5"), w.as("stub_width"), h.as("stub_height"))
      .orderBy(idCol)
  }
}
