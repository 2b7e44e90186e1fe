package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire}
import graft.sources.Bson._

/** Write concern + retryable writes: the `{w, j}` option rides the
  * insert command and is validated server-side; every V2-writer
  * batch carries (lsid, txnNumber), so a connection dropped AFTER
  * the server applied a batch but BEFORE the ack arrived is retried
  * under the same txnNumber and deduplicated by the server's session
  * record — the lost-ack window that would otherwise double-insert
  * or fail the task.
  */
class RetryWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i")).toDF("k", "name")
  }

  test("writeConcern {w, j} is accepted and validated: w:1, " +
      "w:majority, j pass; a negative or non-numeric w and an " +
      "unknown field are loud command errors; w:0 with txnNumber " +
      "is refused (nothing to record)") {
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        def ins(extra: (String, BVal)*): BDoc =
          MongoWire.runCommand(sock, BDoc(Seq[(String, BVal)](
            "insert" -> BString("out")) ++ extra :+
            ("$db" -> (BString("db"): BVal))), 1,
            docSeq = Some(("documents",
              Seq(BDoc(Seq("k" -> BInt64(1L)))))))
        def errOf(r: BDoc): String = r.v.collectFirst {
          case ("errmsg", BString(m)) => m }.getOrElse("")
        assert(ins("writeConcern" -> BDoc(Seq(
          "w" -> BInt32(1), "j" -> BBool(true)))).v
          .contains(("ok", BDouble(1.0))))
        assert(ins("writeConcern" -> BDoc(Seq(
          "w" -> BString("majority")))).v
          .contains(("ok", BDouble(1.0))))
        assert(errOf(ins("writeConcern" -> BDoc(Seq(
          "w" -> BInt32(-1))))).contains("negative"))
        assert(errOf(ins("writeConcern" -> BDoc(Seq(
          "w" -> BDouble(1.5))))).contains("non-negative integer"))
        assert(errOf(ins("writeConcern" -> BDoc(Seq(
          "frsync" -> BBool(true))))).contains("unknown writeConcern"))
        // retryability needs an ack to record
        val lsid = BDoc(Seq("id" -> BBinary(4, Array.fill(16)(7.toByte))))
        assert(errOf(ins(
          "writeConcern" -> BDoc(Seq("w" -> BInt32(0))),
          "lsid" -> lsid, "txnNumber" -> BInt64(1L)))
          .contains("w >= 1"))
        // txnNumber without a session is malformed
        assert(errOf(ins("txnNumber" -> BInt64(2L)))
          .contains("requires an lsid"))
      } finally sock.close()
    } finally srv.close()
  }

  test("lost-ack fault injection: the server applies the batch, " +
      "records the ack, drops the connection; the RetryableWriter " +
      "re-sends under the same txnNumber and the server replays " +
      "the RECORDED ack — total rows exact, no duplicates") {
    val df = fixtureDf(300).repartition(1)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      srv.failNextInsertAfterApply(1)
      // one partition, 5 batches of 64: the FIRST batch hits the
      // fault; the writer's retry must not double-insert it
      val out = df.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "out")
        .option("keyfield", "k").option("batchsize", "64")
        .save()
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "out")
        == 300L)
      // every key exactly once (a double insert would duplicate the
      // faulted batch's 64 keys)
      val back = MongoWire.read(spark, "127.0.0.1", srv.port, "db",
        "out", df.schema, "k", 0L, 300L, numPartitions = 2)
      assert(back.count() == 300L)
      assert(back.select("k").distinct().count() == 300L)
    } finally srv.close()
  }

  test("a command-never-arrived drop (before apply) retries and " +
      "legitimately RE-EXECUTES — nothing was recorded; rows land " +
      "exactly once") {
    val df = fixtureDf(40).repartition(1)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      srv.failNextInsertBeforeApply(1)
      df.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "out")
        .option("keyfield", "k").save()
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "out")
        == 40L)
    } finally srv.close()
  }

  test("the retry is BOUNDED (one replay) and disabled by " +
      "retrywrites=false: two consecutive connection drops fail " +
      "the write loudly; with retries off, one drop fails it") {
    val df = fixtureDf(10).repartition(1)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      srv.failNextInsertBeforeApply(2)
      val e = intercept[Exception] {
        df.write.format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k").save()
      }
      // the cause chain ends in the transport failure, not a hang
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[java.io.IOException]),
        e.toString)
      srv.failNextInsertBeforeApply(1)
      val e2 = intercept[Exception] {
        df.write.format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k")
          .option("retrywrites", "false").save()
      }
      assert(chain(e2).exists(_.isInstanceOf[java.io.IOException]),
        e2.toString)
    } finally srv.close()
  }

  test("a STANDALONE server (no session advertisement) gets no " +
      "txnNumber and no blind retry: writes work, a connection drop " +
      "fails the task instead of risking a double insert") {
    val df = fixtureDf(30).repartition(1)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    srv.setAdvertiseSessions(false)
    try {
      // plain write path works without sessions
      df.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "out")
        .option("keyfield", "k").save()
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "out")
        == 30L)
      // a drop is NOT retried (retryWrites=true but unsupported):
      // a lost ack without a session record is indistinguishable
      // from an unapplied command — the loud failure is correct
      srv.failNextInsertBeforeApply(1)
      val e = intercept[Exception] {
        df.write.format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k").save()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[java.io.IOException]),
        e.toString)
    } finally srv.close()
  }

  test("writeconcernw/writeconcernj options ride the V2 writer and " +
      "an invalid w surfaces the server's own message") {
    val df = fixtureDf(20).repartition(1)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      df.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "out")
        .option("keyfield", "k")
        .option("writeconcernw", "majority")
        .option("writeconcernj", "true")
        .save()
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "out")
        == 20L)
      val e = intercept[Exception] {
        df.write.format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k")
          .option("writeconcernw", "-3").save()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("negative")), e.toString)
    } finally srv.close()
  }
}
