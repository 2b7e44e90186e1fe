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

  test("sq_dist_long / dot_long callable from SQL, exact integers") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sq_dist_long(array(1L, 5L), array(4L, 1L)) AS d, " +
        "dot_long(array(2L, 3L), array(10L, 100L)) AS p").head
    assert(r.getLong(0) == 25L && r.getLong(1) == 320L)
    // null element and length mismatch ⇒ null (zip_with semantics)
    val n = spark.sql(
      "SELECT sq_dist_long(array(1L), array(1L, 2L)) AS a, " +
        "dot_long(array(1L, NULL), array(1L, 2L)) AS b").head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("word_shingles callable from SQL, n as a literal") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val d = spark.sql("SELECT word_shingles('a b c d') AS s")
      .head.getSeq[String](0)
    assert(d == Seq("a b c", "b c d"))   // default n = 3
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

  test("misra_gries callable from SQL: candidate superset + exact n") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT misra_gries(k, 4) AS mg FROM (
        |  SELECT explode(array('a','a','a','b','b','c','d','e')) AS k)
        |""".stripMargin).head.getStruct(0)
    assert(r.getLong(0) == 8L)
    // a (3 > 8/5) must survive; the summary holds at most 4 keys
    val keys = r.getSeq[String](1)
    assert(keys.contains("a") && keys.size <= 4)
  }
}
