package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire, Tls}

/** Hung-server protection: `sockettimeoutms` bounds every socket
  * read (a stalled server is a loud SocketTimeoutException, not a
  * forever-pinned executor), `maxtimems` ships the server-side
  * processing bound (the real server's code 50 MaxTimeMSExpired),
  * and the TLS knobs — handshake timeout and an explicit protocol
  * floor — are surfaced options instead of hardcoded constants.
  */
class TimeoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i")).toDF("k", "name")
  }

  private def dsv2(srv: InProcessMongod,
                   extra: (String, String)*): DataFrame = {
    var r = spark.read.format("graft-mongo")
      .option("host", "127.0.0.1").option("port", srv.port.toString)
      .option("database", "db").option("collection", "c")
      .option("keyfield", "k").option("numpartitions", "1")
      .schema(fixtureDf(1).schema)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("a stalled server with a socket read timeout is a loud " +
      "SocketTimeoutException; without one the same read just " +
      "waits the stall out") {
    val srv = InProcessMongod.serve(fixtureDf(10), "k", "db", "c")
    try {
      srv.setProcessingDelay(1200)
      intercept[java.net.SocketTimeoutException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 16, soTimeoutMs = 250).toList
      }
      // no timeout configured: the read blocks through the stall and
      // completes — the pre-option behavior, still the default
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 16).toList
      assert(rows.size == 10)
    } finally { srv.setProcessingDelay(0); srv.close() }
  }

  test("maxTimeMS rides the find and the server aborts with code " +
      "50 MaxTimeMSExpired when processing exceeds it") {
    val srv = InProcessMongod.serve(fixtureDf(10), "k", "db", "c")
    try {
      srv.setProcessingDelay(400)
      val e = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 16,
          maxTimeMs = Some(100L)).toList
      }
      assert(e.getMessage.contains("50") &&
        e.getMessage.contains("time limit"), e.getMessage)
      // a generous bound: the query completes under it
      srv.setProcessingDelay(50)
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 16,
        maxTimeMs = Some(60000L)).toList
      assert(rows.size == 10)
    } finally { srv.setProcessingDelay(0); srv.close() }
  }

  test("DSv2 reads surface sockettimeoutms and maxtimems as " +
      "options on the executor cursors") {
    val srv = InProcessMongod.serve(fixtureDf(20), "k", "db", "c")
    try {
      srv.setProcessingDelay(1200)
      val e1 = intercept[Exception] {
        dsv2(srv, "sockettimeoutms" -> "250").collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .take(8).toSeq
      assert(chain(e1).exists(
        _.isInstanceOf[java.net.SocketTimeoutException]),
        s"expected a SocketTimeoutException in: $e1")
      val e2 = intercept[Exception] {
        dsv2(srv, "maxtimems" -> "100").collect()
      }
      assert(chain(e2).exists(t =>
        Option(t.getMessage).exists(_.contains("time limit"))),
        s"expected MaxTimeMSExpired in: $e2")
      srv.setProcessingDelay(0)
      assert(dsv2(srv, "sockettimeoutms" -> "5000",
        "maxtimems" -> "60000").collect().length == 20)
    } finally { srv.setProcessingDelay(0); srv.close() }
  }

  test("TLS protocol floor: a peer capped below the floor is " +
      "refused at handshake; the floor option plumbs through DSv2; " +
      "an unknown floor name is a loud error") {
    val id = Tls.sharedSelfSigned
    // server pinned to TLSv1.2 only
    val srv = InProcessMongod.serve(fixtureDf(5), "k", "db", "c",
      tlsKeyStore = Some((id.keyStorePath, id.password)),
      tlsProtocols = Some(Seq("TLSv1.2")))
    try {
      // floor at 1.2 (default): connects
      val ok = new MongoWire.FindCursor("127.0.0.1", srv.port, "db",
        "c", None, None, None, None, 16,
        tls = Some(Tls.Conf(Some(id.trustStorePath),
          Some(id.password)))).toList
      assert(ok.size == 5)
      // floor at 1.3: the 1.2-only peer is refused at handshake
      intercept[Exception] {
        MongoWire.openSocket("127.0.0.1", srv.port,
          Some(Tls.Conf(Some(id.trustStorePath), Some(id.password),
            minProtocol = "TLSv1.3")))
      }
      // the DSv2 option reaches the sockets
      val e = intercept[Exception] {
        dsv2(srv, "tls" -> "true",
          "tlstruststore" -> id.trustStorePath,
          "tlstruststorepassword" -> id.password,
          "tlsminprotocol" -> "TLSv1.3").collect()
      }
      assert(e != null)
      // unknown floor: loud, names the accepted set
      val bad = intercept[IllegalArgumentException] {
        MongoWire.openSocket("127.0.0.1", srv.port,
          Some(Tls.Conf(Some(id.trustStorePath), Some(id.password),
            minProtocol = "SSLv3")))
      }
      assert(bad.getMessage.contains("TLSv1.2"), bad.getMessage)
    } finally srv.close()
  }
}
