package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JsonProfiler

/** Mixed-type JSON profiling — the reference's core semantic: a field
  * whose type varies per document (`core/analyser.py:162-183`,
  * type-inference table `tests/core/test_extractor.py:30-58`).
  */
class JsonProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Heterogeneous documents: `v` is int, str, double, bool, null,
    * missing; nested object; arrays uniform/mixed/empty.
    */
  lazy val df = Seq(
    """{"v": 1, "nest": {"a": "x"}, "arr": [1, 2]}""",
    """{"v": "two", "nest": {"a": 7}, "arr": [1, "s"]}""",
    """{"v": 2.5, "arr": []}""",
    """{"v": true, "big": 9999999999}""",
    """{"v": null}""",
    """{}""").toDF("doc")

  test("per-value type histogram carries the mixed types") {
    val h = JsonProfiler.typeHistogram(df, "doc").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(h(("v", "int32")) == 1)
    assert(h(("v", "str")) == 1)
    assert(h(("v", "double")) == 1)
    assert(h(("v", "bool")) == 1)
    assert(h(("v", "null")) == 1)
    assert(h(("big", "int64")) == 1)     // exceeds int32
    assert(h(("nest.a", "str")) == 1)    // object recursed, dotted path
    assert(h(("nest.a", "int32")) == 1)
    assert(h(("arr", "array<int32>")) == 1)
    assert(h(("arr", "array<mixed>")) == 1)
    assert(h(("arr", "array<empty>")) == 1)
    assert(h(("arr[]", "int32")) == 3)   // elements: 1,2 and 1
    assert(h(("arr[]", "str")) == 1)
  }

  test("profileStats: presence against document totals") {
    val s = JsonProfiler.profileStats(df, "doc").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("v").getLong(1) == 4)               // non-null presences
    assert(s("v").getDouble(2) == 2L * 100.0 / 6) // null + missing doc
    assert(s("big").getDouble(4) == 9999999999.0)
    assert(s("arr[]").isNullAt(2))               // element missing% undefined
  }

  test("profileStats totals count empty and null documents") {
    // null doc string and {} both contribute to the denominator via the
    // generator's root marker (no separate count() scan to agree with)
    val withNull = Seq(Some("""{"v": 1}"""), Some("{}"), None)
      .toDF("doc")
    val s = JsonProfiler.profileStats(withNull, "doc").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("v").getLong(1) == 1)
    assert(s("v").getDouble(2) == 2L * 100.0 / 3)
    assert(!s.contains(""))                       // marker filtered out
  }

  test("profileStats (fast default) ≡ built-in countDistinct plan") {
    val fast = JsonProfiler.profileStats(df, "doc").collect().toSeq
    val builtin = JsonProfiler.profileStatsBuiltin(df, "doc").collect().toSeq
    assert(fast == builtin)
  }

  test("flatSchema: deterministic most-frequent tag election") {
    val fs = JsonProfiler.flatSchema(df, "doc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // v: four tags with count 1 each -> lexically first wins: bool
    assert(fs("v") == "bool")
    assert(fs("big") == "int64")
  }

  test("array variants: dict elements, null-aware unification " +
      "(FIXTURES §3/§4)") {
    val docs = Seq(
      """{"items": [{"id": 1}, {"id": 2}]}""",   // array<dict>
      """{"xs": [1, null]}""",                   // null-aware -> array<int32>
      """{"ns": [null, null]}""").toDF("doc")    // array<null>
    val h = JsonProfiler.typeHistogram(docs, "doc").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(h(("items", "array<dict>")) == 1)
    assert(h(("items[].id", "int32")) == 2)      // dict elements recursed
    assert(h(("xs", "array<int32>")) == 1)
    assert(h(("xs[]", "int32")) == 1)
    assert(h(("xs[]", "null")) == 1)
    assert(h(("ns", "array<null>")) == 1)
  }

  test("raw JSON-lines collection: file → per-value profile end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_raw")
    val path = dir.toString + "/docs"
    // schemaless collection with a type-drifting field
    Seq("""{"k": 1}""", """{"k": "one"}""", """{"k": 2.5}""")
      .toDF("doc").write.mode("overwrite").text(path)
    val raw = graft.sources.Tables.loadJsonDocs(spark, path)
    val h = JsonProfiler.typeHistogram(raw, "doc").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(h(("k", "int32")) == 1)
    assert(h(("k", "str")) == 1)
    assert(h(("k", "double")) == 1)
    val fs = JsonProfiler.flatSchema(raw, "doc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fs("k") == "double")   // 3-way tie → lexically first
  }

  test("missing% undefined (null, not negative) for object-in-array " +
      "paths like a[].b") {
    val docs = Seq("""{"a": [{"b": 1}, {"b": 2}]}""").toDF("doc")
    val s = JsonProfiler.profileStats(docs, "doc").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("a[].b").getLong(1) == 2)
    assert(s("a[].b").isNullAt(2))   // was -100.0 before the fix
  }

  test("malformed JSON tagged, not thrown") {
    val bad = Seq("""{"ok": 1}""", """not json at all""").toDF("doc")
    val h = JsonProfiler.typeHistogram(bad, "doc").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(h(("ok", "int32")) == 1)
    assert(h(("$", "unknown<malformed>")) == 1)
  }
}
