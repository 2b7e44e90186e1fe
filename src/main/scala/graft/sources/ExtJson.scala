package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB Extended JSON v2 scalar decoders — the mongoexport wire
  * format's type wrappers (`{"$oid": …}`, `{"$date": {"$numberLong":
  * …}}`, `{"$numberDecimal": …}`, `{"$binary": {"base64", "subType"}}`,
  * …) parsed into typed Spark columns, closing the last
  * representational gap between [[Tables.loadJsonDocs]]' raw
  * JSON-lines mode and the BSON type fidelity the parquet fixtures
  * carry natively (reference `core/extractor.py` reads these types
  * off the live wire; with no mongod in the sandbox, mongoexport
  * files ARE the wire). Public format reference: the MongoDB
  * Extended JSON v2 specification (canonical mode wraps every
  * non-string scalar in a single-key object whose key names the BSON
  * type and whose value is a STRING — hence every leaf schema field
  * below is StringType and the decoder casts).
  *
  * Spark-first shape: schemas are plain `StructType` fragments for
  * `from_json` (struct field names may contain `$`, so no JSON-path
  * escaping is ever needed), decoders are pure built-in column
  * expressions (getField / cast / unbase64 / timestamp_millis) —
  * row-local, codegen-friendly, no UDFs; the decoded binary feeds the
  * existing F3 chain ([[graft.functions.BsonIds.uuidFromSubtype]],
  * [[graft.operators.Export.convertValue]]) unchanged.
  */
object ExtJson {

  // — from_json schema fragments (canonical mode) —

  /** `{"$oid": "<24 hex>"}` */
  val oidType: StructType =
    StructType(Seq(StructField("$oid", StringType)))

  /** Canonical `{"$date": {"$numberLong": "<epoch millis>"}}`. */
  val dateType: StructType = StructType(Seq(StructField("$date",
    StructType(Seq(StructField("$numberLong", StringType))))))

  /** Relaxed-mode `{"$date": "<ISO-8601>"}` (mongoexport default for
    * dates after the epoch).
    */
  val dateRelaxedType: StructType =
    StructType(Seq(StructField("$date", StringType)))

  /** `{"$numberDecimal": "123.45"}` (Decimal128) */
  val numberDecimalType: StructType =
    StructType(Seq(StructField("$numberDecimal", StringType)))

  /** `{"$numberLong": "123"}` (Int64) */
  val numberLongType: StructType =
    StructType(Seq(StructField("$numberLong", StringType)))

  /** `{"$numberInt": "123"}` (Int32) */
  val numberIntType: StructType =
    StructType(Seq(StructField("$numberInt", StringType)))

  /** `{"$numberDouble": "1.5"}` (Double; canonical also uses it for
    * "Infinity"/"NaN" — the cast maps those to null, the documented
    * lossy corner).
    */
  val numberDoubleType: StructType =
    StructType(Seq(StructField("$numberDouble", StringType)))

  /** `{"$binary": {"base64": "...", "subType": "<hex>"}}` */
  val binaryType: StructType = StructType(Seq(StructField("$binary",
    StructType(Seq(StructField("base64", StringType),
      StructField("subType", StringType))))))

  // — decoders (each takes the parsed wrapper struct column) —

  def oid(c: Column): Column = c.getField("$oid")

  def dateMillis(c: Column): Column =
    c.getField("$date").getField("$numberLong").cast(LongType)

  def date(c: Column): Column = timestamp_millis(dateMillis(c))

  def dateRelaxed(c: Column): Column =
    to_timestamp(c.getField("$date"))

  def numberDecimal(c: Column, precision: Int = 38,
                    scale: Int = 6): Column =
    c.getField("$numberDecimal").cast(DecimalType(precision, scale))

  def numberLong(c: Column): Column =
    c.getField("$numberLong").cast(LongType)

  def numberInt(c: Column): Column =
    c.getField("$numberInt").cast(IntegerType)

  def numberDouble(c: Column): Column =
    c.getField("$numberDouble").cast(DoubleType)

  def binary(c: Column): Column =
    unbase64(c.getField("$binary").getField("base64"))

  /** BSON binary subtype as an int (the wire carries it as hex, e.g.
    * "04" = standard UUID) — feeds
    * [[graft.functions.BsonIds.uuidFromSubtype]] directly.
    */
  def binarySubtype(c: Column): Column =
    conv(c.getField("$binary").getField("subType"), 16, 10)
      .cast(IntegerType)
}
