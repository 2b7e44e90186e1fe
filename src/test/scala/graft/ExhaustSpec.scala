package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire}

/** Exhaust cursors (OP_MSG `exhaustAllowed`/`moreToCome`, public
  * spec): one getMore request frame streams every remaining batch,
  * so a high-latency link pays one round trip per STREAM instead of
  * one per batch — the wire-level win the streaming tail needs. The
  * double meters request frames vs pages served to PROVE the round
  * trips collapsed, and the rows must be identical either way.
  */
class ExhaustSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i")).toDF("k", "name")
  }

  test("exhaust getMore: one request frame, many moreToCome " +
      "replies; pages served identical to plain mode; rows equal") {
    val n = 500
    val srv = InProcessMongod.serve(fixtureDf(n), "k", "db", "c")
    try {
      def scan(exhaust: Boolean): (Seq[Long], Long, Long) = {
        srv.stats.getMores.set(0L)
        srv.stats.getMoreFrames.set(0L)
        val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
          "db", "c", None, None, None, None, 50,
          exhaust = exhaust).map(_.v.collectFirst {
            case ("k", Bson.BInt64(x)) => x }.get).toList
        (rows, srv.stats.getMores.get(), srv.stats.getMoreFrames.get())
      }
      val (plainRows, plainPages, plainFrames) = scan(exhaust = false)
      val (exRows, exPages, exFrames) = scan(exhaust = true)
      assert(plainRows == (0L until n.toLong).toList)
      assert(exRows == plainRows, "exhaust changed the data")
      // 500 rows at batch 50 = 1 firstBatch + 9 getMore pages
      assert(plainPages == 9 && plainFrames == 9,
        s"plain: $plainPages pages / $plainFrames frames")
      assert(exPages == 9 && exFrames == 1,
        s"exhaust: $exPages pages / $exFrames frames — expected the " +
          "whole stream on ONE request frame")
    } finally srv.close()
  }

  private object Bson { // local alias for pattern matching
    val BInt64 = graft.sources.Bson.BInt64
  }

  test("early close mid-exhaust drops the connection and the " +
      "server reaps the cursor; a fresh scan still works") {
    val srv = InProcessMongod.serve(fixtureDf(300), "k", "db", "c")
    try {
      val cur = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 20, exhaust = true)
      // take a few rows (starts the exhaust stream), then abandon
      assert(cur.take(45).size == 45)
      cur.close()
      val again = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 64).size
      assert(again == 300)
    } finally srv.close()
  }

  test("the DSv2 exhaust option: a ranged batch scan under " +
      "exhaust=true returns identical rows with one getMore frame " +
      "per partition") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def read(exhaust: Boolean) = {
        srv.stats.getMoreFrames.set(0L)
        val rows = spark.read.format("graft-mongo").schema(df.schema)
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k").option("numpartitions", "2")
          .option("minkey", "0").option("maxkey", "400")
          .option("batchsize", "25")
          .option("exhaust", exhaust.toString)
          .load().collect().map(_.getLong(0)).sorted.toSeq
        (rows, srv.stats.getMoreFrames.get())
      }
      val (plainRows, plainFrames) = read(exhaust = false)
      val (exRows, exFrames) = read(exhaust = true)
      assert(plainRows == (0L until 400L) && exRows == plainRows)
      // 2 partitions x 200 rows at batch 25: plain = 7 getMore
      // frames each; exhaust = 1 each
      assert(plainFrames == 14 && exFrames == 2,
        s"frames: plain $plainFrames, exhaust $exFrames")
    } finally srv.close()
  }
}
