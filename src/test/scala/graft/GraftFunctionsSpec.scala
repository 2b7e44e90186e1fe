package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions: registered functions
  * usable from `spark.sql`.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("dot_product callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("json_explode callable from SQL as a generator") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT j.* FROM (SELECT '{"a": 1, "b": {"c": "x"}}' AS doc)
        | LATERAL VIEW json_explode(doc) j AS path, vstr, vnum, vtag
        |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(3))).toSet
    assert(rows == Set(("a", "int32"), ("b.c", "str")))
  }
}
