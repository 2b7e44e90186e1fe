package graft.sources

import java.io.{File, FileInputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, TrustManagerFactory}

/** TLS for the wire connector — pure JSSE (the public JDK API, no
  * dependencies). Managed MongoDB deployments require TLS before the
  * SASL conversation even starts, so this is part of "a real
  * `host:port` drops into [[MongoWire.read]] unchanged": pass
  * `tls=true` (plus a trust store when the server's certificate is
  * not in the JVM's default trust) and every socket the connector
  * opens — per-partition cursors, probes, writers, the streaming
  * tail — wraps in an [[SSLSocket]] with the handshake forced at
  * open time, so a misconfigured endpoint fails loudly at the first
  * connection instead of garbling mid-cursor.
  *
  * Hostname verification is ON (the HTTPS endpoint-identification
  * algorithm): a certificate that does not name the host it is
  * served from is rejected, the same rule every real driver applies.
  * There is deliberately NO "allow invalid certificates" switch —
  * add the server's CA to a trust store instead.
  *
  * The executor side only needs the trust-store FILE: on a real
  * cluster ship it with `--files` (or bake it into the image) so the
  * configured path resolves on every executor; `local[*]` shares the
  * filesystem already.
  */
object Tls {

  /** Client-side TLS settings. `trustStore` = path + password of a
    * PKCS12 file holding the certificate authorities to trust; None
    * trusts the JVM's default CA set (a publicly-signed server).
    * `handshakeTimeoutMs` bounds the forced handshake (a plaintext
    * peer never answers a ClientHello — without the bound both sides
    * deadlock). `minProtocol` is an explicit protocol FLOOR
    * (default TLSv1.2): protocols below it are disabled on the
    * socket, so a peer that can only speak TLSv1/TLSv1.1 is refused
    * at handshake instead of silently accepted.
    */
  final case class Conf(trustStorePath: Option[String] = None,
                        trustStorePassword: Option[String] = None,
                        handshakeTimeoutMs: Int = 10000,
                        minProtocol: String = "TLSv1.2",
                        keyStorePath: Option[String] = None,
                        keyStorePassword: Option[String] = None)
    extends Serializable {
    // rides in InputPartition case classes: never print the passwords
    override def toString: String =
      s"Tls(${trustStorePath.getOrElse("<jvm-default-trust>")}," +
        s"$minProtocol+" +
        keyStorePath.fold("")(p => s",clientCert=$p") + ")"
  }

  /** Protocol ordering for the floor check — the SSL/TLS family in
    * ascending strength; names outside it are a loud error.
    */
  private val ProtocolRank = Map(
    "TLSv1" -> 1, "TLSv1.1" -> 2, "TLSv1.2" -> 3, "TLSv1.3" -> 4)

  private def atOrAbove(floor: String,
                        supported: Array[String]): Array[String] = {
    val floorRank = ProtocolRank.getOrElse(floor,
      throw new IllegalArgumentException(
        s"unknown TLS protocol floor '$floor' " +
          s"(one of ${ProtocolRank.keys.toSeq.sorted.mkString(", ")})"))
    val enabled = supported.filter(p =>
      ProtocolRank.get(p).exists(_ >= floorRank))
    require(enabled.nonEmpty,
      s"no supported TLS protocol at or above $floor " +
        s"(JVM supports: ${supported.mkString(", ")})")
    enabled
  }

  private def loadStore(path: String, password: String): KeyStore = {
    val store = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(path)
    try store.load(in, password.toCharArray) finally in.close()
    store
  }

  private def clientContext(conf: Conf): SSLContext =
    if (conf.trustStorePath.isEmpty && conf.keyStorePath.isEmpty)
      SSLContext.getDefault
    else {
      // client IDENTITY (mTLS): a key store holding the client's
      // certificate + private key — presented when the server
      // requests client auth, and the basis of MONGODB-X509 user
      // authentication (the user IS the certificate subject)
      val kms = conf.keyStorePath.map { path =>
        val kmf = KeyManagerFactory.getInstance(
          KeyManagerFactory.getDefaultAlgorithm)
        val pw = conf.keyStorePassword.getOrElse("")
        kmf.init(loadStore(path, pw), pw.toCharArray)
        kmf.getKeyManagers
      }.orNull
      val tms = conf.trustStorePath.map { path =>
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(loadStore(path,
          conf.trustStorePassword.getOrElse("")))
        tmf.getTrustManagers
      }.orNull   // null trust managers = the JVM default trust
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kms, tms, null)
      ctx
    }

  /** Opens one TLS client socket and FORCES the handshake before
    * returning — certificate and hostname failures surface at open
    * time as the JSSE exception, never as a torn frame later. The
    * handshake is TIME-BOUNDED: a plaintext peer never answers a
    * ClientHello (it blocks parsing it as a frame), which without a
    * timeout deadlocks both sides forever instead of failing loudly.
    */
  def clientSocket(host: String, port: Int, conf: Conf,
                   soTimeoutMs: Int = 0,
                   connectTimeoutMs: Int = 0): Socket = {
    // TCP connect first (bounded when asked — a blackholed host must
    // not hang a discovery probe), then the TLS layer wraps it
    val plain = new java.net.Socket()
    plain.connect(new java.net.InetSocketAddress(host, port),
      math.max(connectTimeoutMs, 0))
    // request/response protocol: Nagle + delayed-ACK stalls every
    // round trip (handshake legs included) — the drivers disable it
    plain.setTcpNoDelay(true)
    val sock = clientContext(conf).getSocketFactory
      .createSocket(plain, host, port, true).asInstanceOf[SSLSocket]
    try {
      val params = sock.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      // explicit protocol floor: TLSv1/TLSv1.1 peers are refused at
      // handshake, not silently negotiated down to
      params.setProtocols(
        atOrAbove(conf.minProtocol, sock.getSupportedProtocols))
      sock.setSSLParameters(params)
      sock.setSoTimeout(math.max(conf.handshakeTimeoutMs, 1))
      sock.startHandshake()
      // after the handshake the READ timeout is the caller's choice:
      // 0 = block forever (the JDK default), >0 = a hung server
      // surfaces as a loud SocketTimeoutException instead of a
      // forever-pinned executor
      sock.setSoTimeout(soTimeoutMs)
      sock
    } catch {
      case e: Throwable =>
        try sock.close() catch { case _: Throwable => () }
        throw e
    }
  }

  /** A TLS server socket from a PKCS12 key store (the in-process
    * double's serving side).
    */
  /** @param clientAuthTrust when set (path, password), the server
    *        REQUIRES a client certificate chaining to this trust
    *        store (`needClientAuth`) — the managed-deployment mTLS
    *        posture; a certificate-less client fails the handshake.
    */
  def serverSocket(backlog: Int, bind: InetAddress, keyStorePath: String,
                   password: String,
                   protocols: Option[Seq[String]] = None,
                   clientAuthTrust: Option[(String, String)] = None)
      : ServerSocket = {
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(keyStorePath, password), password.toCharArray)
    val tms = clientAuthTrust.map { case (path, pw) =>
      val tmf = TrustManagerFactory.getInstance(
        TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(loadStore(path, pw))
      tmf.getTrustManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    val srv = ctx.getServerSocketFactory
      .createServerSocket(0, backlog, bind)
      .asInstanceOf[SSLServerSocket]
    // spec hook: a server pinned to an old protocol set proves the
    // client's floor refuses it
    protocols.foreach(ps => srv.setEnabledProtocols(ps.toArray))
    if (clientAuthTrust.isDefined) srv.setNeedClientAuth(true)
    srv
  }

  /** A generated self-signed identity: the server's key store and
    * the matching client trust store (the exported certificate as a
    * trusted entry), one password for both.
    */
  final case class SelfSigned(keyStorePath: String,
                              trustStorePath: String,
                              password: String)

  /** FIXTURE helper (specs, oracle rows, [[InProcessMongod]]): a
    * fresh self-signed certificate for localhost via the JDK's own
    * `keytool` (SAN covers `localhost` + `127.0.0.1` so hostname
    * verification passes against loopback). Real deployments bring
    * their own CA — this exists only because the sandbox has no
    * server, mirroring the in-process double itself.
    */
  def selfSigned(dir: File): SelfSigned = {
    require(dir.isDirectory || dir.mkdirs(), s"cannot create $dir")
    val password = {
      val raw = new Array[Byte](12)
      new java.security.SecureRandom().nextBytes(raw)
      raw.map(b => f"$b%02x").mkString
    }
    val keyStore = new File(dir, "server.p12").getAbsolutePath
    val cert = new File(dir, "server.cer").getAbsolutePath
    val trustStore = new File(dir, "trust.p12").getAbsolutePath
    val keytool = new File(new File(
      System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    def run(args: String*): Unit = {
      val pb = new ProcessBuilder((keytool +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool ${args.head} failed: $out")
    }
    run("-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "365",
      "-storetype", "PKCS12", "-keystore", keyStore,
      "-storepass", password, "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
    run("-exportcert", "-alias", "graft", "-keystore", keyStore,
      "-storepass", password, "-file", cert)
    run("-importcert", "-alias", "graft", "-keystore", trustStore,
      "-storetype", "PKCS12", "-storepass", password,
      "-file", cert, "-noprompt")
    SelfSigned(keyStore, trustStore, password)
  }

  /** One self-signed identity per JVM (keytool keygen costs ~1 s;
    * every spec and oracle row shares it).
    */
  lazy val sharedSelfSigned: SelfSigned = selfSigned(
    java.nio.file.Files.createTempDirectory("graft-tls").toFile)

  /** A self-signed CLIENT identity for mTLS fixtures: the client's
    * key store (certificate + private key, what `tlskeystore` points
    * at) and the server-side trust store holding that certificate
    * (what the double's `needClientAuth` verifies against).
    * `subjectDn` is the certificate subject in RFC 2253 form — the
    * MONGODB-X509 username.
    */
  final case class ClientIdentity(keyStorePath: String,
                                  serverTrustStorePath: String,
                                  password: String,
                                  subjectDn: String)

  def selfSignedClient(dir: File): ClientIdentity = {
    require(dir.isDirectory || dir.mkdirs(), s"cannot create $dir")
    val password = {
      val raw = new Array[Byte](12)
      new java.security.SecureRandom().nextBytes(raw)
      raw.map(b => f"$b%02x").mkString
    }
    val keyStore = new File(dir, "client.p12").getAbsolutePath
    val cert = new File(dir, "client.cer").getAbsolutePath
    val serverTrust = new File(dir, "trust-client.p12").getAbsolutePath
    val keytool = new File(new File(
      System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    def run(args: String*): Unit = {
      val pb = new ProcessBuilder((keytool +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool ${args.head} failed: $out")
    }
    run("-genkeypair", "-alias", "graftclient", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "365",
      "-storetype", "PKCS12", "-keystore", keyStore,
      "-storepass", password, "-dname", "CN=graft-client,O=graft")
    run("-exportcert", "-alias", "graftclient", "-keystore", keyStore,
      "-storepass", password, "-file", cert)
    run("-importcert", "-alias", "graftclient", "-keystore",
      serverTrust, "-storetype", "PKCS12", "-storepass", password,
      "-file", cert, "-noprompt")
    ClientIdentity(keyStore, serverTrust, password,
      "CN=graft-client,O=graft")
  }

  /** One client identity per JVM (the mTLS fixture twin of
    * [[sharedSelfSigned]]).
    */
  lazy val sharedClientIdentity: ClientIdentity = selfSignedClient(
    java.nio.file.Files.createTempDirectory("graft-tls-client").toFile)
}
