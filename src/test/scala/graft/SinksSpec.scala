package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Export

/** File-sink parity (SURVEY §2.1 S9-S12): CSV with QUOTE_ALL,
  * driver-side JSON artifacts, distributed gzip JSON-lines.
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("writeCsv: header + QUOTE_ALL framing") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    Export.writeCsv(Seq((1L, "a,b"), (2L, "plain")).toDF("id", "v"), dir)
    val lines = spark.read.textFile(dir).collect().sorted.toSeq
    assert(lines.contains(""""id","v""""))
    assert(lines.contains(""""1","a,b""""))
    assert(lines.contains(""""2","plain""""))
  }

  test("writeJsonFile round-trips an artifact") {
    val p = Files.createTempDirectory("graft_json").toString + "/schema.json"
    Export.writeJsonFile("""{"a": {"type": "int32"}}""", p)
    assert(Files.readString(java.nio.file.Paths.get(p))
      == """{"a": {"type": "int32"}}""")
  }

  test("writeJsonGz distributed mode: readable gzip JSON-lines") {
    val dir = Files.createTempDirectory("graft_gz").toString + "/out"
    Export.writeJsonGz(Seq((1, "x"), (2, "y")).toDF("id", "v"), dir)
    val back = spark.read.json(dir).orderBy("id").collect()
    assert(back.length == 2 && back(0).getAs[String]("v") == "x")
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".json.gz")))
  }
}
