package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TypeTags

/** Tag-vocabulary contract — the Spark-type analogue of the reference's
  * value→tag table (`tests/core/test_extractor.py:30-58`).
  */
class TypeTagsSpec extends AnyFunSuite {

  val cases: Seq[(DataType, String)] = Seq(
    BooleanType -> "bool",
    IntegerType -> "int32",
    ShortType -> "int32",
    LongType -> "int64",
    DoubleType -> "double",
    FloatType -> "double",
    DecimalType(38, 10) -> "decimal128",
    StringType -> "str",
    TimestampType -> "datetime",
    DateType -> "date",
    BinaryType -> "binary<generic>",
    NullType -> "null",
    ArrayType(IntegerType) -> "array<int32>",
    ArrayType(ArrayType(StringType)) -> "array<array<str>>",
    ArrayType(NullType) -> "array<null>",
    MapType(StringType, LongType) -> "map<int64>",
    StructType(Seq(StructField("a", IntegerType))) -> "dict",
  )

  cases.foreach { case (dt, expected) =>
    test(s"tagOf(${dt.simpleString}) == $expected") {
      assert(TypeTags.tagOf(dt) == expected)
    }
  }
}
