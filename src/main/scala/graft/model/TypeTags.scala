package graft.model

import org.apache.spark.sql.types._

/** The engine's inferred-type vocabulary.
  *
  * Mirrors the reference's BSON-ish type tags (reference:
  * `core/analyser.py:162-183`, `core/extractor.py:36-89`,
  * `core/shared.py:8-14`) re-expressed over Spark SQL types. Where the
  * reference infers a tag per *value* at runtime (doc-at-a-time
  * `isinstance` ladder), this engine derives the tag statically from the
  * column's Catalyst `DataType` — the honest equivalent for columnar,
  * schema-carrying sources (parquet). Per-value tagging still exists for
  * semi-structured JSON columns (see [[graft.functions.JsonTypeTag]]),
  * where a field genuinely can hold different types across rows.
  */
object TypeTags {

  val Null = "null"

  /** Static tag for a Catalyst type. bool-before-int ordering is moot here
    * (no Python bool-is-int ambiguity), but tag names match the reference
    * vocabulary so profile outputs are comparable.
    */
  def tagOf(dt: DataType): String = dt match {
    case BooleanType          => "bool"
    case ByteType | ShortType | IntegerType => "int32"
    case LongType             => "int64"
    case FloatType | DoubleType => "double"
    case _: DecimalType       => "decimal128"
    case StringType           => "str"
    case TimestampType | TimestampNTZType => "datetime"
    case DateType             => "date"
    case BinaryType           => "binary<generic>"
    case _: StructType        => "dict"
    case ArrayType(et, _)     => s"array<${tagOf(et)}>"
    case MapType(_, vt, _)    => s"map<${tagOf(vt)}>"
    case NullType             => Null
    case other                => s"unknown<${other.simpleString}>"
  }

  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  def isTemporal(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _                                           => false
  }
}
