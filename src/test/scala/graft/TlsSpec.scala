package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire, Scram, Tls}
import graft.sources.Bson._

/** TLS on the wire: every connector socket wraps in an SSLSocket
  * when `tls=true` — cursors, probes, writers, the DSv2 scan — with
  * the handshake forced at open. Negative arms prove the failure
  * modes are LOUD: a plaintext client cannot talk to a TLS-required
  * server, and a TLS client cannot be silently downgraded by a
  * plaintext server.
  */
class TlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i", (i % 5).toInt))
      .toDF("k", "name", "grp")
  }

  private lazy val id = Tls.sharedSelfSigned
  private def clientTls: Tls.Conf =
    Tls.Conf(Some(id.trustStorePath), Some(id.password))

  test("TLS round trip: ranged cursors, admin commands, writes, and " +
      "the DSv2 scan all run over SSLSockets against a TLS-required " +
      "double (hostname verification ON, SAN covers loopback)") {
    val df = fixtureDf(200)
    val srv = InProcessMongod.serve(df, "k", "db", "c",
      tlsKeyStore = Some((id.keyStorePath, id.password)))
    try {
      // raw wire read, multiple partitions = multiple TLS handshakes
      val back = MongoWire.read(spark, "127.0.0.1", srv.port, "db",
        "c", df.schema, "k", 0L, 200L, numPartitions = 3,
        tls = Some(clientTls))
      assert(back.count() == 200L)
      // admin command path
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "c",
        tls = Some(clientTls)) == 200L)
      // DSv2 options path with a pushed filter riding the TLS scan
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k").option("numpartitions", "3")
        .option("tls", "true")
        .option("tlstruststore", id.trustStorePath)
        .option("tlstruststorepassword", id.password)
        .load()
      assert(out.filter(col("k") >= 150L).count() == 50L)
      // write path over TLS into a second TLS-required server
      val dst = InProcessMongod.serveEmpty("db", "out", "k")
      try {
        // plaintext destination, TLS source — writes go plaintext
        val acked = MongoWire.write(out.limit(10), "127.0.0.1",
          dst.port, "db", "out")
        assert(acked == 10L)
      } finally dst.close()
    } finally srv.close()
  }

  test("TLS composes with SCRAM auth (the managed-deployment " +
      "posture: TLS handshake first, then the SASL conversation)") {
    val df = fixtureDf(50)
    val srv = InProcessMongod.serve(df, "k", "db", "c",
      tlsKeyStore = Some((id.keyStorePath, id.password)))
    srv.requireAuth("analyst", "s3cr3t")
    try {
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .option("user", "analyst").option("password", "s3cr3t")
        .option("tls", "true")
        .option("tlstruststore", id.trustStorePath)
        .option("tlstruststorepassword", id.password)
        .load()
      assert(out.count() == 50L)
      // same server, TLS but NO credentials: the server's own
      // Unauthorized error crosses the encrypted channel
      val ex = intercept[Exception] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, Some(1L), 2, tls = Some(clientTls)).toList
      }
      assert(ex.getMessage.contains("requires authentication"),
        ex.getMessage)
    } finally srv.close()
  }

  test("negative arms are LOUD: plaintext client vs TLS-required " +
      "server fails at the first frame; TLS client vs plaintext " +
      "server fails the handshake; a wrong trust store rejects the " +
      "certificate") {
    val df = fixtureDf(10)
    val tlsSrv = InProcessMongod.serve(df, "k", "db", "c",
      tlsKeyStore = Some((id.keyStorePath, id.password)))
    val plainSrv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // plaintext client, TLS server: the server drops the
      // connection on the failed handshake — never a silent wrong
      // answer, never a hang
      val e1 = intercept[Exception] {
        MongoWire.countDocs("127.0.0.1", tlsSrv.port, "db", "c")
      }
      assert(e1.isInstanceOf[java.io.IOException], e1.toString)
      // TLS client, plaintext server: the handshake fails loudly —
      // the peer never answers a ClientHello, so the bounded
      // handshake times out (the deadlock-free downgrade refusal)
      val e2 = intercept[Exception] {
        MongoWire.countDocs("127.0.0.1", plainSrv.port, "db", "c",
          tls = Some(clientTls))
      }
      assert(e2.isInstanceOf[java.io.IOException], e2.toString)
      // a trust store that does NOT hold the server's CA: rejected
      // (no allow-invalid switch exists by design)
      val otherId = Tls.selfSigned(
        java.nio.file.Files.createTempDirectory("graft-tls2").toFile)
      val e3 = intercept[Exception] {
        MongoWire.countDocs("127.0.0.1", tlsSrv.port, "db", "c",
          tls = Some(Tls.Conf(Some(otherId.trustStorePath),
            Some(otherId.password))))
      }
      assert(e3.isInstanceOf[javax.net.ssl.SSLException], e3.toString)
      // tlstruststore without tls=true is a loud option error
      val e4 = intercept[Exception] {
        spark.read.format("graft-mongo").schema(df.schema)
          .option("host", "127.0.0.1")
          .option("port", plainSrv.port.toString)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k")
          .option("tlstruststore", id.trustStorePath)
          .load()
      }
      assert(e4.getMessage.contains("tls=true"), e4.getMessage)
    } finally { tlsSrv.close(); plainSrv.close() }
  }
}
