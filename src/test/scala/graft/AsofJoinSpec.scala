package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Edge semantics of the as-of join (union + running-last window —
  * Spark has no native ASOF operator).
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),  // after r1
    (2L, 10L, ts("2024-01-01 12:00:00")),  // exactly at r2 (inclusive)
    (3L, 10L, ts("2024-01-01 09:00:00")),  // before any right row
    (4L, 20L, ts("2024-01-01 10:00:00"))   // key with no right rows
  ).toDF("event_id", "user_id", "ts")

  private val right = Seq(
    (100L, 10L, ts("2024-01-01 09:30:00"), Some(1.0)),   // r1
    (101L, 10L, ts("2024-01-01 12:00:00"), None),        // r2, null payload
    (102L, 10L, ts("2024-01-01 12:00:00"), Some(3.0))    // r2', same ts, higher tie
  ).toDF("rid", "user_id", "ts", "v")
    .select(col("user_id"), col("ts"), col("rid"),
      col("rid").as("p_rid"), col("v").as("p_v"))

  private lazy val out = Relational
    .asofJoin(left, right, Seq("user_id"), "ts", "rid", Seq("p_rid", "p_v"))
    .collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4))))
    .toMap

  test("latest right row at-or-before each left time") {
    assert(out(1L)._1 == Some(100L))
  }

  test("inclusive at equal timestamps; highest tie wins") {
    assert(out(2L)._1 == Some(102L))
    assert(out(2L)._2 == Some(3.0))
  }

  test("left rows before any right row get null payload") {
    assert(out(3L)._1 == None)
  }

  test("keys absent from the right side get null payload") {
    assert(out(4L)._1 == None)
  }

  test("saltedJoin equals the plain join on a skewed key") {
    val probe = ((1 to 500).map(i => (7L, s"p$i")) ++
      Seq((1L, "x"), (2L, "y"))).toDF("k", "pv")
    val build = Seq((7L, "hot"), (1L, "a"), (3L, "unmatched"))
      .toDF("k", "bv")
    val salted = Relational.saltedJoin(probe, build, "k", salt = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val plain = probe.join(build, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 501)
  }

  test("saltedJoin spreads a hot key across salts") {
    val probe = (1 to 1000).map(i => (7L, s"p$i")).toDF("k", "pv")
    val build = Seq((7L, "hot")).toDF("k", "bv")
    val p = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(4L)))
    val used = p.select("_salt").distinct().count()
    assert(used == 4)   // all salt lanes carry load
    assert(Relational.saltedJoin(probe, build, "k", 4).count() == 1000)
  }

  test("payload struct is row-atomic: a null field is not backfilled " +
    "from an older right row") {
    // r2 (null v) alone at 12:00 for user 30: match must carry (101, null),
    // not stitch v=1.0 from the older 09:30 row.
    val l2 = Seq((9L, 30L, ts("2024-01-01 12:30:00"))).toDF("event_id", "user_id", "ts")
    val r2 = Seq(
      (100L, 30L, ts("2024-01-01 09:30:00"), Some(1.0)),
      (101L, 30L, ts("2024-01-01 12:00:00"), Option.empty[Double])
    ).toDF("rid", "user_id", "ts", "v")
      .select(col("user_id"), col("ts"), col("rid"),
        col("rid").as("p_rid"), col("v").as("p_v"))
    val row = Relational
      .asofJoin(l2, r2, Seq("user_id"), "ts", "rid", Seq("p_rid", "p_v"))
      .collect().head
    assert(row.getLong(3) == 101L)
    assert(row.isNullAt(4))
  }
}
