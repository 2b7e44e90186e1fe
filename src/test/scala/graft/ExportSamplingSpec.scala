package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Export, Sampling}

/** Export conversion + sampling/sanitization semantics, ported from the
  * reference's extractor tests (`tests/core/test_extractor.py:60-150`).
  */
class ExportSamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("isoTimestamp: UTC microsecond ISO-8601 with offset") {
    val df = Seq("2024-03-01 12:34:56.123456").toDF("s")
      .select(Export.isoTimestamp(col("s").cast("timestamp")).as("iso"))
    assert(df.head.getString(0) == "2024-03-01T12:34:56.123456+00:00")
  }

  test("isoTimestamp: timezone conversion, DST-aware offsets (Oslo)") {
    // fixture 5 (tests/core/test_extractor.py): naive ⇒ UTC, convert to
    // Europe/Oslo — +01:00 in winter, +02:00 under DST
    val df = Seq("2024-01-15 12:00:00", "2024-07-15 12:00:00").toDF("s")
      .select(Export.isoTimestamp(col("s").cast("timestamp"),
        "Europe/Oslo").as("iso"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq(
      "2024-01-15T13:00:00.000000+01:00",
      "2024-07-15T14:00:00.000000+02:00"))
  }

  test("convertValue: binary → lowercase hex") {
    val df = Seq(Array[Byte](0x0a, 0x1b, -1)).toDF("b")
      .select(Export.convertValue(col("b"),
        org.apache.spark.sql.types.BinaryType).as("h"))
    assert(df.head.getString(0) == "0a1bff")
  }

  test("convertValue: decimal → plain string") {
    val df = Seq("12345.6789").toDF("s")
      .select(Export.convertValue(col("s").cast("decimal(18,4)"),
        org.apache.spark.sql.types.DecimalType(18, 4)).as("d"))
    assert(df.head.getString(0) == "12345.6789")
  }

  test("sanitizeString: >500 chars becomes marker") {
    val df = Seq("x" * 501, "ok").toDF("s")
      .select(Sampling.sanitizeString(col("s"), "str").as("s"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("str(too large to display inline)", "ok"))
  }

  test("truncateCell: 30 chars + ellipsis") {
    val df = Seq("a" * 31).toDF("s")
      .select(Sampling.truncateCell(col("s")).as("s"))
    assert(df.head.getString(0) == "a" * 30 + "...")
  }

  test("hashSample: threshold math + determinism + rough rate") {
    assert(Sampling.hexThreshold(100) == "1999")
    assert(Sampling.hexThreshold(500) == "8000")
    // permille >= 1000 must keep EVERY row ("10000" as a 5-char hex
    // string would lexicographically drop ~15/16 of them)
    val all = spark.range(1000).toDF("id")
    assert(Sampling.hashSample(all, "id", 1000).count() == 1000)
    val df = spark.range(10000).toDF("id")
    val n1 = Sampling.hashSample(df, "id", 100).count()
    val n2 = Sampling.hashSample(df, "id", 100).count()
    assert(n1 == n2)                      // reproducible
    assert(n1 > 700 && n1 < 1300)         // ~10% of 10k
  }

  test("stratifiedSample: deterministic ≤n per stratum, full coverage") {
    val df = spark.range(1000).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
    val s1 = Sampling.stratifiedSample(df, "grp", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq.sorted
    val s2 = Sampling.stratifiedSample(df, "grp", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq.sorted
    assert(s1 == s2)                                       // reproducible
    val perGrp = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGrp.keySet == Set("0", "1", "2", "3"))       // all strata
    assert(perGrp.values.forall(_ == 10))                  // exact cap
    // a stratum smaller than n yields all its rows, not a failure
    val tiny = Sampling.stratifiedSample(
      df.filter(col("id") < 6), "grp", "id", 10)
    assert(tiny.count() == 6)
  }

  test("newestN plans a top-k, not a full sort") {
    val df = spark.range(1000).toDF("id")
    val plan = Sampling.newestN(df, "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(Sampling.newestN(df, "id", 5).collect().map(_.getLong(0)).toSeq
      == Seq(999L, 998L, 997L, 996L, 995L))
  }

  test("writeJsonGz single-file parity: gzip JSON array framing") {
    val dir = Files.createTempDirectory("graft_export").toFile
    val path = s"${dir.getAbsolutePath}/out.json.gz"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Export.writeJsonGz(df, path, singleFile = true)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(path))
    val text = new String(in.readAllBytes(), "UTF-8")
    in.close()
    // reference frames as [\n{...},\n...\n] (core/extractor.py:248-359)
    assert(text.startsWith("[\n") && text.endsWith("\n]"))
    assert(text.contains("""{"id":1,"v":"a"}"""))
    assert(text.split(",\n").length == 2)
  }
}
