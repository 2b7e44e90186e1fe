package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire, Scram, Tls}

/** mTLS + MONGODB-X509: the double REQUIRES a client certificate at
  * the TLS layer (needClientAuth against a client-CA trust store)
  * and binds the connection identity to the certificate subject via
  * the `authenticate` command — the managed-deployment X.509 user
  * story. Negative arms: no certificate fails the handshake; a
  * username that does not match the certificate subject fails
  * AuthenticationFailed; commands before authenticate get code 13.
  */
class X509Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val serverId = Tls.sharedSelfSigned
  private lazy val clientId = Tls.sharedClientIdentity

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i")).toDF("k", "name")
  }

  private def mtlsServer(df: DataFrame): InProcessMongod =
    InProcessMongod.serve(df, "k", "db", "c",
      tlsKeyStore = Some((serverId.keyStorePath, serverId.password)),
      tlsClientAuthTrust =
        Some((clientId.serverTrustStorePath, clientId.password)))

  private def clientTls(withCert: Boolean): Tls.Conf =
    Tls.Conf(Some(serverId.trustStorePath), Some(serverId.password),
      keyStorePath =
        if (withCert) Some(clientId.keyStorePath) else None,
      keyStorePassword =
        if (withCert) Some(clientId.password) else None)

  test("needClientAuth: a certificate-less client is refused at the " +
      "TLS layer; one presenting the trusted certificate connects " +
      "and scans") {
    val srv = mtlsServer(fixtureDf(10))
    try {
      intercept[java.io.IOException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 16,
          tls = Some(clientTls(withCert = false))).toList
      }
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 16,
        tls = Some(clientTls(withCert = true))).toList
      assert(rows.size == 10)
    } finally srv.close()
  }

  test("MONGODB-X509 required: authenticate binds the certificate " +
      "subject; unauthenticated commands get code 13; a username " +
      "not matching the subject fails AuthenticationFailed") {
    val srv = mtlsServer(fixtureDf(10))
    srv.requireX509()
    try {
      // no authenticate command: the gate refuses
      val unauth = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 16,
          tls = Some(clientTls(withCert = true))).toList
      }
      assert(unauth.getMessage.contains("requires authentication"),
        unauth.getMessage)
      // derived user (no user named): the certificate subject wins
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 16,
        auth = Some(Scram.x509Credential()),
        tls = Some(clientTls(withCert = true))).toList
      assert(rows.size == 10)
      // named user matching the subject DN: accepted
      val rows2 = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 16,
        auth = Some(Scram.x509Credential(Some(clientId.subjectDn))),
        tls = Some(clientTls(withCert = true))).toList
      assert(rows2.size == 10)
      // wrong username: the certificate cannot authenticate as
      // someone else
      val bad = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 16,
          auth = Some(Scram.x509Credential(Some("CN=impostor"))),
          tls = Some(clientTls(withCert = true))).toList
      }
      assert(bad.getMessage.contains("does not match"),
        bad.getMessage)
    } finally srv.close()
  }

  test("the DSv2 surface: authmechanism=MONGODB-X509 + tlskeystore " +
      "reads through every partition; misconfiguration (no " +
      "keystore / a password) is refused at plan time") {
    val df = fixtureDf(50)
    val srv = mtlsServer(df)
    srv.requireX509()
    try {
      def read(extra: (String, String)*): DataFrame = {
        var r = spark.read.format("graft-mongo").schema(df.schema)
          .option("host", "127.0.0.1")
          .option("port", srv.port.toString)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k").option("numpartitions", "3")
          .option("tls", "true")
          .option("tlstruststore", serverId.trustStorePath)
          .option("tlstruststorepassword", serverId.password)
        extra.foreach { case (k, v) => r = r.option(k, v) }
        r.load()
      }
      val rows = read("authmechanism" -> "MONGODB-X509",
        "tlskeystore" -> clientId.keyStorePath,
        "tlskeystorepassword" -> clientId.password)
        .collect()
      assert(rows.length == 50)
      // X509 without a client keystore: loud plan-time refusal
      val e1 = intercept[Exception](
        read("authmechanism" -> "MONGODB-X509").collect())
      assert(e1.getMessage.contains("tlskeystore"), e1.getMessage)
      // X509 with a password: contradiction, refused
      val e2 = intercept[Exception](
        read("authmechanism" -> "MONGODB-X509",
          "tlskeystore" -> clientId.keyStorePath,
          "user" -> "u", "password" -> "p").collect())
      assert(e2.getMessage.contains("no password"), e2.getMessage)
    } finally srv.close()
  }
}
