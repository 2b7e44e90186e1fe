package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InProcessMongod, MongoWire, Scram}
import graft.sources.Bson._

/** SCRAM-SHA-256: the RFC 7677 example pinned bit-for-bit, the
  * server-side verifier against stored keys only, and the MongoDB
  * SASL conversation end to end — authenticated reads work on every
  * connector path, unauthenticated and wrong-password attempts fail
  * with the server's own error.
  */
class ScramSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- RFC 7677 §3 example, verbatim -------------------------------

  private val rfcUser = "user"
  private val rfcPass = "pencil"
  private val rfcClientNonce = "rOprNGfwEbeRWgbNEkqO"
  private val rfcServerNonce = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
  private val rfcSalt = "W22ZaJ0SNY7soEsUEjb6gQ=="
  private val rfcServerFirst =
    s"r=$rfcClientNonce$rfcServerNonce,s=$rfcSalt,i=4096"

  test("client side reproduces the RFC 7677 example exchange " +
      "bit-for-bit (proof and expected server signature)") {
    val conv = new Scram.ClientConversation(rfcUser, rfcPass,
      rfcClientNonce)
    assert(conv.clientFirstMessage ==
      "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val (clientFinal, expectedV) = conv.clientFinal(rfcServerFirst)
    assert(clientFinal ==
      s"c=biws,r=$rfcClientNonce$rfcServerNonce," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(expectedV ==
      "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("server side verifies the RFC 7677 proof with ONLY stored " +
      "keys and produces the example server signature; a bad proof " +
      "is rejected") {
    val salt = java.util.Base64.getDecoder.decode(rfcSalt)
    val stored = Scram.storeCredential(rfcUser, rfcPass, salt)
    val server = new Scram.ServerSide(stored, rfcServerNonce)
    val first = server.handleClientFirst(
      "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    assert(first == rfcServerFirst)
    server.handleClientFinal(
      s"c=biws,r=$rfcClientNonce$rfcServerNonce," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=") match {
      case Right(v) =>
        assert(v == "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
      case Left(err) => fail(s"valid proof rejected: $err")
    }
    // flip one proof byte: rejected, and the error never echoes keys
    val badServer = new Scram.ServerSide(stored, rfcServerNonce)
    badServer.handleClientFirst("n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    badServer.handleClientFinal(
      s"c=biws,r=$rfcClientNonce$rfcServerNonce," +
        "p=eHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=") match {
      case Right(_) => fail("corrupted proof accepted")
      case Left(err) => assert(err.contains("failed"))
    }
  }

  test("server side enforces the mandatory c= (gs2-header) check — " +
      "RFC 5802 §5.1 — and the credential's toString never prints " +
      "the password") {
    val salt = java.util.Base64.getDecoder.decode(rfcSalt)
    val stored = Scram.storeCredential(rfcUser, rfcPass, salt)
    val server = new Scram.ServerSide(stored, rfcServerNonce)
    server.handleClientFirst("n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    // a rewritten channel-binding header (c=eSws is b64("y,,")) must
    // be rejected even with an otherwise valid proof
    server.handleClientFinal(
      s"c=eSws,r=$rfcClientNonce$rfcServerNonce," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=") match {
      case Right(_) => fail("rewritten gs2 header accepted")
      case Left(err) => assert(err.contains("c="), err)
    }
    val cred = Scram.Credential("analyst", "s3cr3t")
    assert(!cred.toString.contains("s3cr3t") &&
      cred.toString.contains("analyst"), cred.toString)
  }

  test("SASLprep stand-in refuses non-ASCII credentials loudly " +
      "instead of authenticating differently than a spec-complete " +
      "peer") {
    intercept[IllegalArgumentException] {
      new Scram.ClientConversation("usér", "pencil", rfcClientNonce)
    }
    intercept[IllegalArgumentException] {
      Scram.storeCredential("user", "péncíl",
        Array.fill[Byte](16)(1))
    }
  }

  // ---- the conversation over the wire -------------------------------

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i", (i % 5).toInt))
      .toDF("k", "name", "grp")
  }

  test("required-auth server: authenticated DSv2 reads/aggregates/" +
      "writes work; an unauthenticated find fails with code 13; a " +
      "wrong password fails with AuthenticationFailed, verbatim") {
    val df = fixtureDf(100)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    srv.requireAuth("analyst", "s3cr3t")
    try {
      // unauthenticated: the server's own Unauthorized error surfaces
      val ex = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, Some(1L), 2).toList
      }
      assert(ex.getMessage.contains("code 13") &&
        ex.getMessage.contains("requires authentication"),
        ex.getMessage)

      // wrong password: AuthenticationFailed from the server
      val bad = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, Some(1L), 2,
          auth = Some(Scram.Credential("analyst", "wrong"))).toList
      }
      assert(bad.getMessage.contains("code 18"), bad.getMessage)

      // hello advertises the mechanism when asked (driver handshake)
      val h = MongoWire.command("127.0.0.1", srv.port, BDoc(Seq(
        "hello" -> BInt32(1),
        "saslSupportedMechs" -> BString("admin.analyst"),
        "$db" -> BString("admin"))))
      assert(h.v.collectFirst {
        case ("saslSupportedMechs", BArr(ms)) => ms
      }.exists(_.contains(BString("SCRAM-SHA-256"))))

      // authenticated DSv2 read: every partition authenticates its
      // own connection; filters and pushdowns ride as usual
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k").option("numpartitions", "3")
        .option("user", "analyst").option("password", "s3cr3t")
        .load()
      assert(out.count() == 100L)
      assert(out.filter(col("k") >= 90L).count() == 10L)
      // pushed complete aggregate (runs on the command path)
      val agg = out.agg(count(lit(1)), min(col("k")), max(col("k")))
        .collect().head
      assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) ==
        ((100L, 0L, 99L)))

      // authenticated V2 write into a second required-auth server
      val dst = InProcessMongod.serveEmpty("db", "out", "k")
      dst.requireAuth("analyst", "s3cr3t")
      try {
        out.limit(10).write.format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", dst.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k")
          .option("user", "analyst").option("password", "s3cr3t")
          .save()
        val n = MongoWire.countDocs("127.0.0.1", dst.port, "db",
          "out", auth = Some(Scram.Credential("analyst", "s3cr3t")))
        assert(n == 10L)
      } finally dst.close()
    } finally srv.close()
  }

  test("speculative authentication + skipEmptyExchange: the whole " +
      "conversation is TWO round trips (hello with piggybacked " +
      "saslStart, then the proof with done riding its reply)") {
    val df = fixtureDf(10)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    srv.requireAuth("analyst", "s3cr3t")
    try {
      srv.stats.commands.set(0L)
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 64,
        auth = Some(Scram.Credential("analyst", "s3cr3t"))).toList
      assert(rows.size == 10)
      // hello(+saslStart) + saslContinue(proof, done) + find = 3
      assert(srv.stats.commands.get() == 3L,
        s"commands: ${srv.stats.commands.get()}")
    } finally srv.close()
  }

  test("RFC 5802 §5 SHA-1 example: the hash-suite primitives " +
      "reproduce the published client proof and server signature " +
      "(Hi over the raw password — MongoDB's md5 input transform is " +
      "a layer above these primitives)") {
    // the RFC's own example values, verbatim
    val salt = java.util.Base64.getDecoder.decode("QSXCR+Q6sek8bf92")
    val authMessage =
      "n=user,r=fyko+d2lbbFgONRv9qkxdawL," +
        "r=fyko+d2lbbFgONRv9qkxdawL3rfcNHYJY1ZVvWVs7j," +
        "s=QSXCR+Q6sek8bf92,i=4096," +
        "c=biws,r=fyko+d2lbbFgONRv9qkxdawL3rfcNHYJY1ZVvWVs7j"
    val salted = Scram.hi("pencil", salt, 4096, Scram.Sha1)
    val clientKey =
      Scram.hmac(salted, "Client Key".getBytes(UTF_8), Scram.Sha1)
    val storedKey = Scram.sha256(clientKey, Scram.Sha1)
    val sig =
      Scram.hmac(storedKey, authMessage.getBytes(UTF_8), Scram.Sha1)
    val proof = clientKey.zip(sig).map { case (a, b) => (a ^ b).toByte }
    assert(java.util.Base64.getEncoder.encodeToString(proof) ==
      "v0X8v3Bz2T0CJGbJQyF0X+HI4Ts=")
    val serverKey =
      Scram.hmac(salted, "Server Key".getBytes(UTF_8), Scram.Sha1)
    assert(java.util.Base64.getEncoder.encodeToString(
      Scram.hmac(serverKey, authMessage.getBytes(UTF_8), Scram.Sha1))
      == "rmF9pqV8S7suAoZWja4dJRkFsKQ=")
  }

  test("SASL mechanism negotiation: a SCRAM-SHA-1-only server gets " +
      "the negotiated SHA-1 fallback (MongoDB's md5 Hi input) and " +
      "authenticates; a wrong password still fails; a server " +
      "offering NEITHER mechanism fails CLIENT-SIDE with the " +
      "advertised list; SCRAM-SHA-256 authenticates as before") {
    val df = fixtureDf(10)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    srv.requireAuth("analyst", "s3cr3t")
    srv.setSaslMechs(Seq("SCRAM-SHA-1"))
    try {
      // old deployment: the client detects SHA-256 is not offered
      // and completes a SHA-1 conversation instead
      val rows = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 64,
        auth = Some(Scram.Credential("analyst", "s3cr3t"))).toList
      assert(rows.size == 10)
      // the fallback still verifies proofs: wrong password fails
      val bad = intercept[Exception] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 64,
          auth = Some(Scram.Credential("analyst", "wrong"))).toList
      }
      assert(bad.getMessage.contains("failed") ||
        bad.getMessage.contains("Authentication"), bad.getMessage)
      // a server speaking neither SCRAM variant: loud client-side
      // failure naming what was offered
      srv.setSaslMechs(Seq("PLAIN", "MONGODB-X509"))
      val e = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 64,
          auth = Some(Scram.Credential("analyst", "s3cr3t"))).toList
      }
      assert(e.getMessage.contains("PLAIN") &&
        e.getMessage.contains("SCRAM-SHA-256"), e.getMessage)
      // back to a modern server: the negotiation passes and the
      // conversation completes
      srv.setSaslMechs(Seq("SCRAM-SHA-256"))
      val rows2 = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 64,
        auth = Some(Scram.Credential("analyst", "s3cr3t"))).toList
      assert(rows2.size == 10)
    } finally srv.close()
  }

  test("a failed proof ABORTS the conversation: retrying the same " +
      "server-first/nonce gets 'saslContinue without saslStart', " +
      "not another verification attempt") {
    val df = fixtureDf(5)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    srv.requireAuth("analyst", "s3cr3t")
    try {
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        val conv = Scram.ClientConversation.fresh("analyst", "wrong")
        val start = MongoWire.runCommandOk(sock, BDoc(Seq(
          "saslStart" -> BInt32(1),
          "mechanism" -> BString("SCRAM-SHA-256"),
          "payload" -> BBinary(0,
            conv.clientFirstMessage.getBytes(UTF_8)),
          "$db" -> BString("admin"))), 1)
        val serverFirst = start.v.collectFirst {
          case ("payload", BBinary(_, b)) => new String(b, UTF_8)
        }.getOrElse(fail("saslStart reply missing payload"))
        val (clientFinal, _) = conv.clientFinal(serverFirst)
        def continueOnce(reqId: Int): String =
          MongoWire.runCommand(sock, BDoc(Seq(
            "saslContinue" -> BInt32(1),
            "conversationId" -> BInt32(1),
            "payload" -> BBinary(0, clientFinal.getBytes(UTF_8)),
            "$db" -> BString("admin"))), reqId).v.collectFirst {
            case ("errmsg", BString(m)) => m
          }.getOrElse("")
        assert(continueOnce(2).contains("failed"))
        // the conversation is gone: same proof again is not
        // re-verified against the old nonce
        assert(continueOnce(3).contains("without saslStart"))
      } finally sock.close()
    } finally srv.close()
  }

  test("auth state is PER CONNECTION: one authenticated socket does " +
      "not open the door for a second, unauthenticated one") {
    val df = fixtureDf(10)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    srv.requireAuth("analyst", "s3cr3t")
    try {
      val good = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "c", None, None, None, None, 64,
        auth = Some(Scram.Credential("analyst", "s3cr3t")))
      assert(good.toList.size == 10)
      val ex = intercept[IllegalArgumentException] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "c",
          None, None, None, None, 64).toList
      }
      assert(ex.getMessage.contains("requires authentication"))
    } finally srv.close()
  }
}
