package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JsonProfiler
import graft.streaming.ProfileStream

/** schemaDiffSlices: the streaming schema-drift report must equal the
  * batch twin — dominant tags per window from
  * [[JsonProfiler.typeHistogram]], diffed across consecutive windows
  * with the batch schemaDiff status rules.
  */
class SchemaDiffStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // three daily windows: w1 {a:int,b:str}, w2 {a:str,c:int} (full
  // drift), w3 {a:str,c:int} (all kept)
  private val docs = Seq(
    (ts("2024-03-01 01:00:00"), """{"a": 1, "b": "x"}"""),
    (ts("2024-03-01 02:00:00"), """{"a": 2, "b": "y"}"""),
    (ts("2024-03-01 03:00:00"), """{"a": 3, "b": "z"}"""),
    (ts("2024-03-02 01:00:00"), """{"a": "s", "c": 4}"""),
    (ts("2024-03-02 02:00:00"), """{"a": "t", "c": 5}"""),
    (ts("2024-03-03 01:00:00"), """{"a": "u", "c": 6}"""))
    .toDF("ts", "j")

  private lazy val slices = ProfileStream
    .replayedSlices(docs, "ts")(st =>
      ProfileStream.jsonTypeStream(st, "ts", "j"))

  private lazy val diff = ProfileStream.schemaDiffSlices(slices)
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2),
      Option(r.getString(3)).orNull, Option(r.getString(4)).orNull))

  test("drift boundary: type_changed / removed / added") {
    val w2 = diff.filter(_._1 == "2024-03-02 00:00:00").toSeq
    assert(w2 == Seq(
      ("2024-03-02 00:00:00", "a", "type_changed", "int32", "str"),
      ("2024-03-02 00:00:00", "b", "removed", "str", null),
      ("2024-03-02 00:00:00", "c", "added", null, "int32")))
  }

  test("stable boundary: every path kept") {
    val w3 = diff.filter(_._1 == "2024-03-03 00:00:00").toSeq
    assert(w3 == Seq(
      ("2024-03-03 00:00:00", "a", "kept", "str", "str"),
      ("2024-03-03 00:00:00", "c", "kept", "int32", "int32")))
  }

  test("first window emits no rows (no previous window to diff)") {
    assert(!diff.exists(_._1 == "2024-03-01 00:00:00"))
  }

  test("batch-twin equivalence: per-window dominant tags from " +
      "typeHistogram match the stream state's") {
    val windows = Seq("2024-03-01", "2024-03-02", "2024-03-03")
    val batchDom = windows.flatMap { day =>
      JsonProfiler.typeHistogram(
          docs.filter(to_date(col("ts")) === day), "j")
        .collect()
        .groupBy(_.getString(0))
        .map { case (path, rows) =>
          val tag = rows.map(r => (-r.getLong(2), r.getString(1)))
            .min._2
          (s"$day 00:00:00", path, tag)
        }
    }.toSet
    val streamDom = slices.collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case ((w, path), rows) =>
        val tag = rows.map(r => (-r.getLong(3), r.getString(2))).min._2
        (w, path, tag)
      }.toSet
    assert(streamDom == batchDom)
  }

  test("dominant-tag tie breaks to the lexicographically first tag") {
    val tie = Seq(
      (ts("2024-04-01 01:00:00"), """{"m": 1}"""),
      (ts("2024-04-01 02:00:00"), """{"m": "s"}"""),
      (ts("2024-04-02 01:00:00"), """{"m": 2}"""))
      .toDF("ts", "j")
    val d = ProfileStream.schemaDiffSlices(
      ProfileStream.replayedSlices(tie, "ts")(st =>
        ProfileStream.jsonTypeStream(st, "ts", "j"))).collect()
    // w1 has m: int32 x1, str x1 -> tie -> 'int32' (< 'str');
    // w2 is int32, so the boundary reports kept, not type_changed
    assert(d.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("m", "kept")))
  }
}
