package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

import graft.sources.Bson._

/** SCRAM-SHA-256 (RFC 5802 mechanism frame, RFC 7677 SHA-256
  * instantiation) over MongoDB's SASL conversation commands
  * (`saslStart` / `saslContinue`) — the authentication a real
  * deployment requires before `host:port` "drops in unchanged".
  * Everything here is the PUBLIC spec: message grammar and proof
  * derivation from RFC 5802 §3/§7, the hash parameters from RFC
  * 7677, the command envelope from the MongoDB SASL documentation.
  *
  * Both halves live here so the in-process double enforces the same
  * math it speaks on the wire: [[ClientConversation]] is what the
  * connector runs after the socket opens; [[ServerSide]] verifies
  * proofs against STORED keys (the server never sees the password —
  * it keeps `StoredKey = H(ClientKey)` and `ServerKey`, exactly the
  * at-rest shape the spec prescribes).
  *
  * SASLprep (RFC 4013) is handled by REFUSING what it would change:
  * usernames and passwords must be printable ASCII (space allowed in
  * passwords), on which SASLprep is the identity. Non-ASCII
  * credentials fail loudly instead of authenticating differently
  * than a spec-complete peer would.
  */
object Scram {

  /** What the client needs: user + password + the database holding
    * the user (MongoDB authenticates against `authDb`, default
    * `admin`). `mechanism` selects the family: "SCRAM" (negotiated
    * SHA-256/SHA-1, the default) or "MONGODB-X509" (certificate
    * auth — the user is the client certificate's subject DN, the
    * password unused and empty, authDb `$external` per the public
    * auth spec; empty user = let the server derive it from the
    * certificate).
    */
  final case class Credential(user: String, password: String,
                              authDb: String = "admin",
                              mechanism: String = "SCRAM")
    extends Serializable {
    // the credential rides inside Conf and every InputPartition case
    // class; a case-class toString in any log line or assertion must
    // never print the password
    override def toString: String = s"Credential($user,***,$authDb)"
  }

  /** The X.509 credential: certificate-derived identity (the TLS
    * layer carries the proof; `tlskeystore` must hold the client
    * certificate + key).
    */
  def x509Credential(user: Option[String] = None): Credential =
    Credential(user.getOrElse(""), "", "$external", "MONGODB-X509")

  private def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** The hash instantiation of the RFC 5802 frame — the grammar and
    * proof derivation are hash-agnostic, only H/HMAC/Hi and the
    * password-to-Hi input differ. SHA-256 per RFC 7677; SHA-1 per
    * RFC 5802's own instantiation, with MongoDB's documented twist
    * (the public auth spec): SCRAM-SHA-1 runs Hi over
    * `hex(md5("user:mongo:password"))`, the server's legacy at-rest
    * digest, not the raw password.
    */
  sealed abstract class HashSuite(
      val mechanism: String, val hmacAlg: String,
      val digestAlg: String, val pbkdf2Alg: String,
      val keyBits: Int) extends Serializable {
    def hiInput(user: String, password: String): String
  }
  case object Sha256 extends HashSuite("SCRAM-SHA-256", "HmacSHA256",
      "SHA-256", "PBKDF2WithHmacSHA256", 256) {
    def hiInput(user: String, password: String): String = password
  }
  case object Sha1 extends HashSuite("SCRAM-SHA-1", "HmacSHA1",
      "SHA-1", "PBKDF2WithHmacSHA1", 160) {
    def hiInput(user: String, password: String): String = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$user:mongo:$password".getBytes(UTF_8))
      Bson.hexString(md5)
    }
  }

  /** Strongest-first client preference over an advertised list. */
  val suites: Seq[HashSuite] = Seq(Sha256, Sha1)

  private[graft] def hmac(key: Array[Byte], data: Array[Byte],
                            suite: HashSuite = Sha256): Array[Byte] = {
    val mac = Mac.getInstance(suite.hmacAlg)
    mac.init(new SecretKeySpec(key, suite.hmacAlg))
    mac.doFinal(data)
  }

  private[graft] def sha256(data: Array[Byte],
                              suite: HashSuite = Sha256): Array[Byte] =
    java.security.MessageDigest.getInstance(suite.digestAlg)
      .digest(data)

  /** Hi(str, salt, i) — PBKDF2 with the suite's HMAC, RFC 5802 §2.2. */
  private[graft] def hi(password: String, salt: Array[Byte],
                          iterations: Int,
                          suite: HashSuite = Sha256): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations,
      suite.keyBits)
    SecretKeyFactory.getInstance(suite.pbkdf2Alg)
      .generateSecret(spec).getEncoded
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Reject anything SASLprep would transform (identity on printable
    * ASCII) rather than guess.
    */
  private def requirePrintableAscii(s: String, what: String): Unit =
    require(s.nonEmpty && s.forall(c => c >= ' ' && c <= '~'),
      s"SCRAM $what must be non-empty printable ASCII " +
        "(SASLprep is not implemented; it is the identity there)")

  /** RFC 5802 §5.1: "=" and "," in names escape as =3D / =2C. */
  private[sources] def escapeName(u: String): String =
    u.replace("=", "=3D").replace(",", "=2C")

  private def attr(msg: String, key: Char): String =
    msg.split(",").collectFirst {
      case kv if kv.length >= 2 && kv.charAt(0) == key &&
        kv.charAt(1) == '=' => kv.substring(2)
    }.getOrElse(throw new IllegalArgumentException(
      s"SCRAM message missing '$key=': $msg"))

  /** Client half of one authentication exchange. The nonce is
    * injected so specs can pin the RFC 7677 example bit-for-bit;
    * production callers use [[ClientConversation.fresh]].
    */
  final class ClientConversation(user: String, password: String,
                                 clientNonce: String,
                                 suite: HashSuite = Sha256) {
    requirePrintableAscii(user, "username")
    requirePrintableAscii(password, "password")

    private val gs2Header = "n,,"
    private[sources] val clientFirstBare =
      s"n=${escapeName(user)},r=$clientNonce"

    def clientFirstMessage: String = gs2Header + clientFirstBare

    /** Consumes server-first, returns (client-final-message,
      * expected server signature for the mandatory `v=` check).
      */
    def clientFinal(serverFirst: String): (String, String) = {
      val fullNonce = attr(serverFirst, 'r')
      require(fullNonce.startsWith(clientNonce),
        "server nonce must extend the client nonce (RFC 5802 §5.1)")
      require(fullNonce.length > clientNonce.length,
        "server must append its own nonce entropy")
      val salt = unb64(attr(serverFirst, 's'))
      val iterations = attr(serverFirst, 'i').toInt
      require(iterations >= 4096,
        s"iteration count $iterations below the RFC 7677 minimum 4096")
      val saltedPassword =
        hi(suite.hiInput(user, password), salt, iterations, suite)
      val clientKey =
        hmac(saltedPassword, "Client Key".getBytes(UTF_8), suite)
      val storedKey = sha256(clientKey, suite)
      val serverKey =
        hmac(saltedPassword, "Server Key".getBytes(UTF_8), suite)
      val withoutProof =
        s"c=${b64(gs2Header.getBytes(UTF_8))},r=$fullNonce"
      val authMessage =
        s"$clientFirstBare,$serverFirst,$withoutProof"
      val clientSignature =
        hmac(storedKey, authMessage.getBytes(UTF_8), suite)
      val proof = xor(clientKey, clientSignature)
      val serverSignature =
        hmac(serverKey, authMessage.getBytes(UTF_8), suite)
      (s"$withoutProof,p=${b64(proof)}", s"v=${b64(serverSignature)}")
    }
  }

  object ClientConversation {
    /** 24 bytes of SecureRandom, base64 — printable, ','-free. */
    def fresh(user: String, password: String,
              suite: HashSuite = Sha256): ClientConversation = {
      val raw = new Array[Byte](24)
      new java.security.SecureRandom().nextBytes(raw)
      new ClientConversation(user, password, b64(raw), suite)
    }
  }

  // ---- server half (the in-process double's enforcement) ----------

  /** At-rest server credentials (RFC 5802 §2.1 storage shape): the
    * password itself is never stored.
    */
  final case class StoredCredential(user: String, salt: Array[Byte],
                                    iterations: Int,
                                    storedKey: Array[Byte],
                                    serverKey: Array[Byte])

  def storeCredential(user: String, password: String,
                      salt: Array[Byte],
                      iterations: Int = 4096,
                      suite: HashSuite = Sha256): StoredCredential = {
    requirePrintableAscii(user, "username")
    requirePrintableAscii(password, "password")
    val saltedPassword =
      hi(suite.hiInput(user, password), salt, iterations, suite)
    val clientKey =
      hmac(saltedPassword, "Client Key".getBytes(UTF_8), suite)
    val serverKey =
      hmac(saltedPassword, "Server Key".getBytes(UTF_8), suite)
    StoredCredential(user, salt, iterations,
      sha256(clientKey, suite), serverKey)
  }

  /** Server side of one conversation: verify the proof with ONLY the
    * stored keys (recover ClientKey = proof XOR signature, check
    * H(ClientKey) == StoredKey — RFC 5802 §3).
    */
  final class ServerSide(cred: StoredCredential, serverNonce: String,
                         suite: HashSuite = Sha256) {
    private var fullNonce: String = _
    private var serverFirst: String = _
    private var clientFirstBare: String = _

    def handleClientFirst(clientFirst: String): String = {
      require(clientFirst.startsWith("n,,"),
        s"only the 'n,,' gs2 header is supported: $clientFirst")
      clientFirstBare = clientFirst.substring(3)
      val user = attr(clientFirstBare, 'n')
      require(user == escapeName(cred.user),
        s"unknown user '$user'")
      fullNonce = attr(clientFirstBare, 'r') + serverNonce
      serverFirst =
        s"r=$fullNonce,s=${b64(cred.salt)},i=${cred.iterations}"
      serverFirst
    }

    /** Left(errmsg) on a bad proof; Right(v=…) on success. */
    def handleClientFinal(clientFinal: String)
        : Either[String, String] = {
      // RFC 5802 §5.1: the server MUST verify c= (the base64 gs2
      // header) — a relay that rewrote the header would otherwise
      // pass, since c= is inside the signed auth message only when
      // the server actually checks it matches what was negotiated
      val channel = attr(clientFinal, 'c')
      if (channel != b64("n,,".getBytes(UTF_8)))
        return Left("SCRAM gs2-header (c=) mismatch")
      val proof = unb64(attr(clientFinal, 'p'))
      val nonce = attr(clientFinal, 'r')
      if (nonce != fullNonce) return Left("SCRAM nonce mismatch")
      val withoutProof =
        clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val authMessage =
        s"$clientFirstBare,$serverFirst,$withoutProof"
      val clientSignature =
        hmac(cred.storedKey, authMessage.getBytes(UTF_8), suite)
      val clientKey = xor(proof, clientSignature)
      if (!java.security.MessageDigest.isEqual(
          sha256(clientKey, suite), cred.storedKey))
        Left("SCRAM authentication failed")
      else
        Right("v=" + b64(hmac(cred.serverKey,
          authMessage.getBytes(UTF_8), suite)))
    }
  }

  // ---- the MongoDB SASL command envelope ---------------------------

  /** Runs the full conversation on an OPEN socket, round-trip
    * minimal (both moves are the public drivers' spec):
    *
    *  1. one `hello` carrying `saslSupportedMechs` (the mechanism
    *     advertisement) AND `speculativeAuthenticate` (the saslStart
    *     piggybacked in the handshake, with `skipEmptyExchange`);
    *  2. one `saslContinue` with the proof — the server's signature
    *     and `done` ride back together.
    *
    * Two round trips per connection instead of four. Mechanism
    * negotiation is strongest-first: a server that advertises
    * mechanisms WITHOUT SCRAM-SHA-256 but WITH SCRAM-SHA-1 (an old
    * deployment) gets a fresh classic SCRAM-SHA-1 conversation on
    * the same socket (RFC 5802's SHA-1 instantiation over MongoDB's
    * documented `md5(user:mongo:password)` Hi input); one offering
    * NEITHER fails CLIENT-SIDE with the named mechanism list. A
    * server that ignores the speculative field (pre-4.4) falls back
    * to the classic `saslStart` → `saslContinue` → empty-exchange
    * flow on the same socket.
    * Throws on any server error or a wrong server signature — a
    * peer that cannot prove knowledge of ServerKey is not the
    * server the credential belongs to.
    */
  def authenticate(sock: java.net.Socket, cred: Credential,
                   compressors: Seq[String] = Nil): Bson.BDoc = {
    if (cred.mechanism == "MONGODB-X509")
      return authenticateX509(sock, cred, compressors)
    require(cred.mechanism == "SCRAM",
      s"unsupported auth mechanism '${cred.mechanism}' " +
        "(SCRAM or MONGODB-X509)")
    val conv = ClientConversation.fresh(cred.user, cred.password)
    val saslStartDoc = BDoc(Seq(
      "saslStart" -> BInt32(1),
      "mechanism" -> BString("SCRAM-SHA-256"),
      "payload" -> BBinary(0,
        conv.clientFirstMessage.getBytes(UTF_8)),
      "options" -> BDoc(Seq("skipEmptyExchange" -> BBool(true))),
      // the speculative sub-command names its db in `db` (it has no
      // wire envelope of its own)
      "db" -> BString(cred.authDb)))
    val helloParts = Seq.newBuilder[(String, BVal)]
    helloParts += "hello" -> BInt32(1)
    helloParts += "saslSupportedMechs" ->
      BString(s"${cred.authDb}.${cred.user}")
    // compression negotiation is per connection and this hello IS
    // this connection's handshake — the offer rides here so an
    // authenticated connection needs no second hello
    if (compressors.nonEmpty)
      helloParts += "compression" ->
        BArr(compressors.map(BString(_)))
    helloParts += "speculativeAuthenticate" -> saslStartDoc
    helloParts += "$db" -> BString(cred.authDb)
    val hello = MongoWire.runCommandOk(sock,
      BDoc(helloParts.result()), 900)
    val advertised = hello.v.collectFirst {
      case ("saslSupportedMechs", BArr(ms)) =>
        ms.collect { case BString(m) => m }
    }
    // mechanism negotiation, strongest-first (the drivers auth spec):
    // SHA-256 when offered (or when the server advertises nothing),
    // else the SHA-1 fallback via a fresh classic conversation — the
    // server ignored the speculative SHA-256 attempt, so the socket
    // is clean for it; a server offering NEITHER fails client-side
    // with the advertised list, never an opaque server error
    advertised match {
      case Some(ms) if !ms.contains(Sha256.mechanism) =>
        require(ms.contains(Sha1.mechanism),
          s"server offers SASL mechanism(s) ${ms.mkString(", ")} " +
            s"for '${cred.authDb}.${cred.user}'; this client " +
            s"implements ${suites.map(_.mechanism).mkString(", ")}")
        val conv1 = ClientConversation.fresh(cred.user, cred.password,
          Sha1)
        val start = classicStart(sock, cred, conv1, Sha1, 910)
        finishConversation(sock, cred, conv1, start, 911)
      case _ =>
        // a server that speculated answers inside the hello; one
        // that did not (or could not) gets the classic saslStart
        val start = hello.v.collectFirst {
          case ("speculativeAuthenticate", d: BDoc) => d
        }.getOrElse(classicStart(sock, cred, conv, Sha256, 901))
        finishConversation(sock, cred, conv, start, 902)
    }
    hello   // callers read capabilities (e.g. session support) here
  }

  /** MONGODB-X509 (public auth spec): the TLS layer already proved
    * key possession via the client certificate; the `authenticate`
    * command binds that certificate to a user — the subject DN. The
    * speculative form piggybacks on the hello (one round trip); a
    * server that ignores it gets the classic `authenticate` against
    * `$external`. An empty user lets the server derive it from the
    * certificate (the documented single-user-cert shortcut).
    */
  private def authenticateX509(sock: java.net.Socket,
                               cred: Credential,
                               compressors: Seq[String]): Bson.BDoc = {
    def authDoc(withDb: Boolean): BDoc = {
      val parts = Seq.newBuilder[(String, BVal)]
      parts += "authenticate" -> BInt32(1)
      parts += "mechanism" -> BString("MONGODB-X509")
      if (cred.user.nonEmpty) parts += "user" -> BString(cred.user)
      parts += (if (withDb) "$db" else "db") -> BString("$external")
      BDoc(parts.result())
    }
    val helloParts = Seq.newBuilder[(String, BVal)]
    helloParts += "hello" -> BInt32(1)
    if (compressors.nonEmpty)
      helloParts += "compression" ->
        BArr(compressors.map(BString(_)))
    helloParts += "speculativeAuthenticate" -> authDoc(withDb = false)
    helloParts += "$db" -> BString("admin")
    val hello = MongoWire.runCommandOk(sock,
      BDoc(helloParts.result()), 920)
    if (!hello.v.exists(_._1 == "speculativeAuthenticate"))
      MongoWire.runCommandOk(sock, authDoc(withDb = true), 921)
    hello
  }

  private def classicStart(sock: java.net.Socket, cred: Credential,
                           conv: ClientConversation, suite: HashSuite,
                           reqId: Int): BDoc =
    MongoWire.runCommandOk(sock, BDoc(Seq(
      "saslStart" -> BInt32(1),
      "mechanism" -> BString(suite.mechanism),
      "payload" -> BBinary(0,
        conv.clientFirstMessage.getBytes(UTF_8)),
      "options" -> BDoc(Seq("skipEmptyExchange" -> BBool(true))),
      "$db" -> BString(cred.authDb))), reqId)

  private def finishConversation(sock: java.net.Socket,
                                 cred: Credential,
                                 conv: ClientConversation,
                                 start: BDoc, reqIdBase: Int): Unit = {
    val convId = start.v.collectFirst {
      case ("conversationId", v) => v
    }.getOrElse(BInt32(1))
    val serverFirst = payloadString(start)
    val (clientFinal, expectedV) = conv.clientFinal(serverFirst)
    var reply = MongoWire.runCommandOk(sock, BDoc(Seq(
      "saslContinue" -> BInt32(1),
      "conversationId" -> convId,
      "payload" -> BBinary(0, clientFinal.getBytes(UTF_8)),
      "$db" -> BString(cred.authDb))), reqIdBase)
    require(payloadString(reply) == expectedV,
      "server failed to prove knowledge of ServerKey " +
        "(bad server signature)")
    // with skipEmptyExchange honored, done rides with the proof
    // reply; otherwise drain the classic empty exchange
    var guard = 0
    while (!isDone(reply) && guard < 3) {
      reply = MongoWire.runCommandOk(sock, BDoc(Seq(
        "saslContinue" -> BInt32(1),
        "conversationId" -> convId,
        "payload" -> BBinary(0, Array.emptyByteArray),
        "$db" -> BString(cred.authDb))), reqIdBase + 1 + guard)
      guard += 1
    }
    require(isDone(reply), "SASL conversation never completed")
  }

  private def payloadString(reply: BDoc): String =
    reply.v.collectFirst {
      case ("payload", BBinary(_, b)) => new String(b, UTF_8)
      case ("payload", BString(s)) => s
    }.getOrElse(throw new IllegalArgumentException(
      s"SASL reply missing payload: $reply"))

  private def isDone(reply: BDoc): Boolean =
    reply.v.collectFirst { case ("done", BBool(d)) => d }
      .getOrElse(false)
}
