package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JsonProfiler

/** The native-variant profiling path: VariantExplode over real
  * `VariantType` columns must agree row-for-row with the JSON-bridge
  * flatten on equivalent input — the contract that lets
  * `varianttype=true` reads take the §2 profile without a second
  * StringType read.
  */
class VariantProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    """{"a": 1, "b": "x", "c": {"d": true, "e": 2.5}}""",
    """{"a": "mixed", "b": null, "arr": [1, 2, 3]}""",
    """{"a": 9999999999, "arr": [1, "s", null], "c": {"d": false}}""",
    """{"a": 7}""")

  test("variantTypeHistogram over parse_json variants equals " +
      "typeHistogram over the same JSON strings (per-value tags, " +
      "dotted paths, array unification, int32/int64 fit rule)") {
    val json = docs.toDF("doc")
    val bridge = JsonProfiler.typeHistogram(json, "doc").collect()
    // one variant column "doc" carrying each parsed document
    val variant = json.selectExpr("parse_json(doc) AS doc")
    val native = JsonProfiler
      .variantTypeHistogram(variant, Seq("doc")).collect()
    // bridge paths are rooted at "" (keys bare); native ones at the
    // column name — strip the root for comparison
    def norm(rows: Array[org.apache.spark.sql.Row],
             strip: String): Seq[(String, String, Long)] =
      rows.map { r =>
        val p = r.getString(0)
        val stripped = if (strip.nonEmpty && p.startsWith(strip + "."))
          p.substring(strip.length + 1) else p
        (stripped, r.getString(1), r.getLong(2))
      }.toSeq.sorted
    assert(norm(native, "doc") == norm(bridge, ""))
  }

  test("SQL-null variant rows tag null at the column path, matching " +
      "the bridge's coalesce(col, 'null') convention") {
    val df = Seq(Some("""{"x": 1}"""), None, None).toDF("doc")
      .selectExpr("parse_json(doc) AS v")
    val hist = JsonProfiler.variantTypeHistogram(df, Seq("v"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq.sorted
    assert(hist == Seq(("v", "null", 2L), ("v.x", "int32", 1L)))
  }

  test("multi-column union roots each variant column at its name") {
    val df = Seq(("""5""", """{"a": "s"}"""), ("""true""", """[]"""))
      .toDF("p", "q")
      .selectExpr("parse_json(p) AS p", "parse_json(q) AS q")
    val hist = JsonProfiler.variantTypeHistogram(df, Seq("p", "q"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq.sorted
    assert(hist == Seq(("p", "bool", 1L), ("p", "int32", 1L),
      ("q", "array<empty>", 1L), ("q.a", "str", 1L)))
  }
}
