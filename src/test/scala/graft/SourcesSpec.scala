package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Catalog-surface behavior: footer-metadata collection stats (S6),
  * index listing shape (S7), and the raw JSON-lines collection
  * round-trip that backs the `json_*_docs` queries.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  test("Tables.load normalizes both events.ts physical encodings — " +
      "legacy TIMESTAMP(NANOS) and TIMESTAMP(MICROS) — to identical " +
      "session timestamps") {
    // committed twin fixtures (same 3 rows; ts written as ns and µs):
    // the driver's testdata has shipped both ways across rounds, and
    // the regenerated-µs data no longer exercises the nanos branch
    val res = "src/test/resources"
    def rows(sub: String) =
      Tables.load(spark, s"$res/$sub", "events")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3)))
        .toSeq
    val viaNanos = rows("events_nanos")
    val viaMicros = rows("events_micros")
    assert(viaNanos == viaMicros)
    // µs precision survives (123456 micros on row 1)
    assert(viaNanos.head._2.toInstant.getNano == 123456000)
  }

  test("describeCollections: footer row counts equal COUNT(*)") {
    val stats = Tables.describeCollections(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.keySet == Tables.names.toSet)
    for (n <- Seq("region", "documents", "events")) {
      val real = Tables.load(spark, dir, n).count()
      assert(stats(n) == real, s"$n footer count != count(*)")
    }
    assert(stats.values.forall(_ >= 0))   // no error sentinels on clean data
  }

  test("listIndexes: reference column shape; the implicit id-key " +
      "index row is PROBED per collection, not assumed") {
    val idx = Tables.listIndexes(spark, dir)
    assert(idx.columns.toSeq == Seq("collection", "name", "key", "unique",
      "sparse", "background", "props"))
    val rows = idx.collect()
    assert(rows.length == Tables.names.length)
    val byColl = rows.map(r => r.getString(0) -> r).toMap
    // every cell is a verified data fact: unique/sparse match a direct
    // recomputation, props carries the exact row count
    for (n <- Tables.names) {
      val df = Tables.load(spark, dir, n)
      val keys = Tables.idColumns(n)
      val cnt = df.count()
      val dis = df.selectExpr(
        s"count(distinct ${keys.mkString(", ")})").head.getLong(0)
      val nulls = df.filter(keys.map(k =>
        org.apache.spark.sql.functions.col(k).isNull)
        .reduce(_ || _)).count()
      val r = byColl(n)
      assert(r.getString(1) == keys.mkString("_") + "_")
      assert(r.getString(2) == keys.mkString(","))
      assert(r.getString(3) == ((dis + nulls) == cnt).toString, n)
      assert(r.getString(4) == (nulls > 0).toString, n)
      assert(r.getString(6) == s"rows=$cnt", n)
    }
    // on this data every single-column id key really is unique —
    // and the probe is not vacuous: sf0.001's lineitem has DUPLICATE
    // (l_orderkey, l_linenumber) pairs (the generator doesn't enforce
    // the TPC-H pk), so the listing truthfully reports unique=false
    // there — a fact the old empty listing could never surface
    assert(rows.filter(_.getString(0) != "lineitem")
      .forall(_.getString(3) == "true"))
    assert(byColl("lineitem").getString(3) == "false")
    assert(rows.forall(_.getString(4) == "false"))
  }

  test("jsonDocsCollection: round-trips through disk and parses clean") {
    val docs = SparkEntry.jsonDocsCollection(spark, dir)
    val n = Tables.load(spark, dir, "documents").count()
    assert(docs.count() == n)
    // every line must parse (no unknown<malformed> rows)
    val tags = graft.operators.JsonProfiler
      .typeHistogram(docs, "doc").collect().map(_.getString(1)).toSet
    assert(!tags.contains("unknown<malformed>"), tags)
    assert(tags.contains("array<str>") && tags.contains("bool"))
  }
}
