package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.Bson._

/** MongoDB WIRE-PROTOCOL client — the reference's actual data path
  * (`core/db.py:20-187` speaks the wire; `core/analyser.py:242-261`
  * walks cursors), previously the one "missing" surface because the
  * sandbox has no mongod. This closes everything closable without
  * one: a real OP_MSG client (the only opcode modern servers speak —
  * public spec: the MongoDB wire-protocol documentation; opCode 2013,
  * section kind 0) issuing `find`/`getMore` cursor commands, plus a
  * DISTRIBUTED read where each Spark partition opens its own
  * connection and walks its own `_id`-range cursor — the standard
  * production layout for bulk-reading a live collection (one cursor
  * per key range, no driver-side accumulation; the same shape the
  * official Spark connector's partitioners produce). What remains
  * environmental is only the server binary itself:
  * [[InProcessMongod]] is the loopback stand-in for tests and the
  * oracle rows, and a real `host:port` drops into [[read]] unchanged.
  *
  * Beyond the ranged scan, the client carries the full pushdown
  * surface the DSv2 connector ([[graft.sources.v2.MongoTableProvider]])
  * emits — extra filter conjuncts, inclusion projections, key-field
  * sort, limit — and the write path (`insert` batches per partition)
  * plus the admin commands the reference surfaces in its TUI
  * (`listCollections`, `count`, `collStats`).
  *
  * Framing (per the public spec): message =
  * `int32 messageLength | int32 requestID | int32 responseTo |
  * int32 opCode(2013) | uint32 flagBits(0) | kind-0 section
  * (byte 0x00 + one BSON command document)`. Commands carry their
  * database in `$db`; replies are plain BSON documents
  * (`{cursor: {id, ns, firstBatch|nextBatch}, ok}`).
  */
object MongoWire {

  private val OpMsg = 2013
  private val OpCompressed = 2012

  /** Every connector socket funnels through here: plain loopback/LAN
    * or TLS ([[Tls.clientSocket]] — handshake forced at open).
    * `soTimeoutMs > 0` bounds every read: a hung server surfaces as
    * a loud SocketTimeoutException on the executor instead of a
    * forever-pinned task (0 = block forever, the JDK default).
    */
  def openSocket(host: String, port: Int,
                 tls: Option[Tls.Conf],
                 soTimeoutMs: Int = 0,
                 connectTimeoutMs: Int = 0): Socket = tls match {
    case None =>
      val s = new Socket()
      // 0 = the JDK default (OS connect timeout); >0 bounds it —
      // liveness probes (discovery hellos) must not hang on a
      // blackholed host
      s.connect(new java.net.InetSocketAddress(host, port),
        math.max(connectTimeoutMs, 0))
      if (soTimeoutMs > 0) s.setSoTimeout(soTimeoutMs)
      // request/response protocol: Nagle + delayed-ACK stalls every
      // round trip (~40 ms each on Linux loopback/LAN) — the public
      // drivers all disable it
      s.setTcpNoDelay(true)
      s
    case Some(c) =>
      Tls.clientSocket(host, port, c, soTimeoutMs, connectTimeoutMs)
  }

  /** The three OP_COMPRESSED compressors of the public wire spec:
    * snappy (id 1), zlib (id 2), zstd (id 3). zlib is
    * `java.util.zip`; snappy and zstd ride the libraries Spark
    * itself ships (snappy-java, zstd-jni) — no new dependency. The
    * compressed payload is everything AFTER the 16-byte header of
    * the original message (per the public spec). Real servers
    * typically PREFER snappy; a client that only offers zlib falls
    * back to uncompressed against a snappy-only server, which is why
    * `compress=auto` offers all three.
    */
  object WireCompress {
    val SnappyId: Byte = 1
    val ZlibId: Byte = 2
    val ZstdId: Byte = 3

    /** Wire names per the handshake spec. */
    def nameOf(id: Byte): String = id match {
      case SnappyId => "snappy"
      case ZlibId => "zlib"
      case ZstdId => "zstd"
      case other => throw new IllegalArgumentException(
        s"unknown compressor id $other")
    }

    def idOf(name: String): Byte = name match {
      case "snappy" => SnappyId
      case "zlib" => ZlibId
      case "zstd" => ZstdId
      case other => throw new IllegalArgumentException(
        s"unknown compressor '$other' (snappy, zlib, or zstd)")
    }

    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }

    def inflate(data: Array[Byte], originalSize: Int): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new Array[Byte](originalSize)
      var off = 0
      var stalled = false
      while (off < originalSize && !inf.finished() && !stalled) {
        val n = inf.inflate(out, off, originalSize - off)
        // a zero-byte step with no more input = the declared size
        // overstates the stream; bail to the loud error, never spin
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          stalled = true
        else off += n
      }
      inf.end()
      require(off == originalSize,
        s"OP_COMPRESSED inflated $off of declared $originalSize bytes")
      out
    }

    def pack(id: Byte, data: Array[Byte]): Array[Byte] = id match {
      case SnappyId => org.xerial.snappy.Snappy.compress(data)
      case ZlibId => deflate(data)
      case ZstdId => com.github.luben.zstd.Zstd.compress(data)
      case other => throw new IllegalArgumentException(
        s"unknown compressor id $other")
    }

    def unpack(id: Byte, data: Array[Byte],
               originalSize: Int): Array[Byte] = id match {
      case SnappyId =>
        val out = org.xerial.snappy.Snappy.uncompress(data)
        require(out.length == originalSize,
          s"snappy frame inflated ${out.length} of declared " +
            s"$originalSize bytes")
        out
      case ZlibId => inflate(data, originalSize)
      case ZstdId =>
        val out =
          com.github.luben.zstd.Zstd.decompress(data, originalSize)
        require(out.length == originalSize,
          s"zstd frame inflated ${out.length} of declared " +
            s"$originalSize bytes")
        out
      case other => throw new IllegalArgumentException(
        s"unknown compressor id $other")
    }
  }

  /** One OP_MSG round trip over an open socket; `compress =
    * Some(id)` wraps the command in OP_COMPRESSED (opCode 2012:
    * int32 originalOpcode | int32 uncompressedSize | uint8
    * compressorId | compressed section bytes) with that compressor,
    * and accepts a plain reply or one compressed with ANY compressor
    * this client speaks (a real server replies with its own
    * preference) — at 100 TB the wire is the bottleneck, and frame
    * compression is part of the public protocol.
    */
  def runCommand(sock: Socket, cmd: BDoc, requestId: Int,
                 compress: Option[Byte] = None,
                 docSeq: Option[(String, Seq[BDoc])] = None): BDoc = {
    sendMsg(sock, cmd, requestId, 0, compress, docSeq)
    readMsg(sock)._2
  }

  /** OP_MSG flag bits (public spec). */
  val FlagMoreToCome: Int = 1 << 1
  val FlagExhaustAllowed: Int = 1 << 16

  /** Sends one OP_MSG request (optionally OP_COMPRESSED-wrapped)
    * without reading a reply — the request half of [[runCommand]],
    * split out so EXHAUST streams ([[FlagExhaustAllowed]]) can read
    * many replies per request.
    */
  def sendMsg(sock: Socket, cmd: BDoc, requestId: Int,
              flagBits: Int = 0,
              compress: Option[Byte] = None,
              docSeq: Option[(String, Seq[BDoc])] = None): Unit = {
    val body = Bson.encode(cmd)
    val seq = docSeq.map { case (ident, docs) =>
      kind1Section(ident, docs)
    }.getOrElse(Array.emptyByteArray)
    val out = sock.getOutputStream
    // ONE write per message: header and payload in a single buffer —
    // separate small write()s are separate TCP segments, and a
    // header-then-body pair under Nagle waits out the peer's delayed
    // ACK between them (one syscall is also simply cheaper)
    compress match {
      case None =>
        val total = 16 + 4 + 1 + body.length + seq.length
        val msg = ByteBuffer.allocate(total)
          .order(ByteOrder.LITTLE_ENDIAN)
        msg.putInt(total).putInt(requestId).putInt(0).putInt(OpMsg)
          .putInt(flagBits)
          .put(0.toByte)        // section kind 0
          .put(body).put(seq)
        out.write(msg.array())
      case Some(cid) =>
        // section payload = flagBits + kind-0 section + kind-1 sections
        val section = ByteBuffer.allocate(5 + body.length + seq.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        section.putInt(flagBits).put(0.toByte).put(body).put(seq)
        val packed = WireCompress.pack(cid, section.array())
        val total = 16 + 4 + 4 + 1 + packed.length
        val msg = ByteBuffer.allocate(total)
          .order(ByteOrder.LITTLE_ENDIAN)
        msg.putInt(total).putInt(requestId).putInt(0).putInt(OpCompressed)
          .putInt(OpMsg)                      // originalOpcode
          .putInt(section.capacity())         // uncompressedSize
          .put(cid)
          .put(packed)
        out.write(msg.array())
    }
    out.flush()
  }

  /** Reads one OP_MSG reply → (flagBits, document). [[FlagMoreToCome]]
    * in the flags means the server will follow with another reply to
    * the same request WITHOUT a further request — the exhaust-stream
    * contract.
    */
  def readMsg(sock: Socket): (Int, BDoc) = {
    val in = new DataInputStream(sock.getInputStream)
    val lenB = new Array[Byte](4); in.readFully(lenB)
    val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN)
      .getInt
    val rest = new Array[Byte](len - 4); in.readFully(rest)
    var buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    buf.getInt; buf.getInt                 // requestID, responseTo
    val op = buf.getInt
    if (op == OpCompressed) {
      val orig = buf.getInt
      require(orig == OpMsg, s"OP_COMPRESSED wraps opcode $orig")
      val size = buf.getInt
      val id = buf.get
      val packed = new Array[Byte](buf.remaining()); buf.get(packed)
      buf = ByteBuffer.wrap(WireCompress.unpack(id, packed, size))
        .order(ByteOrder.LITTLE_ENDIAN)
    } else require(op == OpMsg, s"unsupported reply opCode $op")
    val flags = buf.getInt
    val kind = buf.get
    require(kind == 0, s"unsupported OP_MSG section kind $kind")
    (flags, Bson.readDoc(buf))
  }

  /** One OP_MSG kind-1 section (per the public spec): byte 0x01 |
    * int32 size (including itself) | cstring identifier |
    * consecutive BSON documents with NO separators and no length
    * prefix beyond each document's own — how real drivers bulk-ship
    * `insert` documents instead of nesting them in the command body
    * (the body array re-parses as one giant document; the sequence
    * streams).
    */
  def kind1Section(identifier: String,
                   docs: Seq[BDoc]): Array[Byte] = {
    val ident = identifier.getBytes("UTF-8")
    val encoded = docs.map(Bson.encode)
    val size = 4 + ident.length + 1 + encoded.map(_.length).sum
    val bb = ByteBuffer.allocate(1 + size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(size).put(ident).put(0.toByte)
    encoded.foreach(bb.put)
    bb.array()
  }

  private def field(doc: BDoc, name: String): BVal =
    doc.v.find(_._1 == name).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"reply missing '$name': $doc"))

  /** A server `{ok: 0}` reply as a typed error — extends
    * IllegalArgumentException so every existing caller's handling is
    * unchanged, while the retry paths can read the CODE (the
    * retryable-writes spec keys on it).
    */
  final class ServerError(val code: Int, val codeName: String,
                          msg: String)
      extends IllegalArgumentException(msg)

  /** The error codes the public retryable-writes spec marks
    * retryable (the RetryableWriteError label set): topology-change
    * and network-shaped failures where re-selecting a server and
    * replaying the same (lsid, txnNumber) is safe. A code OUTSIDE
    * this set is an ANSWER (duplicate key, bad document, …) — never
    * retried.
    */
  val RetryableCodes: Set[Int] = Set(
    6,     // HostUnreachable
    7,     // HostNotFound
    89,    // NetworkTimeout
    91,    // ShutdownInProgress
    189,   // PrimarySteppedDown
    262,   // ExceededTimeLimit
    9001,  // SocketException
    10107, // NotWritablePrimary
    11600, // InterruptedAtShutdown
    11602, // InterruptedDueToReplStateChange
    13435, // NotPrimaryNoSecondaryOk
    13436) // NotPrimaryOrSecondary

  /** Error replies carry `{ok: 0, errmsg, code, codeName}` — surface
    * them as the server's own message, not a reply dump.
    */
  private def requireOk(reply: BDoc): Unit =
    if (field(reply, "ok") != BDouble(1.0)) {
      val msg = reply.v.collectFirst {
        case ("errmsg", BString(m)) => m
      }.getOrElse(s"command failed: $reply")
      val code = reply.v.collectFirst {
        case ("code", BInt32(c)) => c
      }.getOrElse(-1)
      val codeName = reply.v.collectFirst {
        case ("codeName", BString(n)) => n
      }.getOrElse("")
      throw new ServerError(code, codeName,
        s"server error (code $code): $msg")
    }

  /** runCommand + ok-check on an already-open (possibly
    * authenticated) connection.
    */
  def runCommandOk(sock: Socket, cmd: BDoc, requestId: Int,
                   compress: Option[Byte] = None,
                   docSeq: Option[(String, Seq[BDoc])] = None): BDoc = {
    val reply = runCommand(sock, cmd, requestId, compress, docSeq)
    requireOk(reply)
    reply
  }

  /** One driver-side command on a throwaway connection. */
  def command(host: String, port: Int, cmd: BDoc,
              auth: Option[Scram.Credential] = None,
              tls: Option[Tls.Conf] = None,
              timeoutMs: Int = 0): BDoc = {
    val sock = openSocket(host, port, tls, soTimeoutMs = timeoutMs,
      connectTimeoutMs = timeoutMs)
    try {
      auth.foreach(Scram.authenticate(sock, _))
      val reply = runCommand(sock, cmd, 10)
      requireOk(reply)
      reply
    } finally sock.close()
  }

  /** The connection handshake (`hello`): server capabilities. Per
    * the handshake rule, the CLIENT lists the compressors it speaks
    * and the server echoes back only the requested ones it also
    * supports — a `hello` without a compression array gets none
    * back, so the request side is mandatory for negotiation.
    */
  def hello(host: String, port: Int, db: String = "admin",
            compressors: Seq[String] = Seq("zlib"),
            tls: Option[Tls.Conf] = None,
            timeoutMs: Int = 0): BDoc = {
    val parts = Seq.newBuilder[(String, BVal)]
    parts += "hello" -> BInt32(1)
    if (compressors.nonEmpty)
      parts += "compression" -> BArr(compressors.map(BString(_)))
    parts += "$db" -> BString(db)
    command(host, port, BDoc(parts.result()), tls = tls,
      timeoutMs = timeoutMs)
  }

  /** The drivers-spec selection rule: the client uses the FIRST
    * compressor in its OWN configured list that also appears in the
    * server's echoed list (MongoDB's compression spec — client
    * preference wins, not the echo's head; real mongod echoes in
    * client-request order so the two coincide there, but the rule is
    * the client's).
    */
  def chooseCompressor(offered: Seq[String],
                       echoed: Seq[String]): Option[Byte] =
    offered.find(echoed.contains).map(WireCompress.idOf)

  /** The server's echoed compressor list from a hello reply. */
  def echoedCompressors(hello: BDoc): Seq[String] =
    hello.v.collectFirst {
      case ("compression", BArr(cs)) =>
        cs.collect { case BString(name) => name }
    }.getOrElse(Seq.empty)

  /** The offer list for one `compress=` mode: `none` offers nothing,
    * `auto` offers everything this client speaks (its preference
    * order), an explicit name offers exactly that compressor.
    */
  def compressOffer(mode: String): Seq[String] = mode match {
    case "none" => Nil
    case "auto" => Seq("snappy", "zstd", "zlib")
    case name => Seq(WireCompress.nameOf(WireCompress.idOf(name)))
  }

  /** Per-connection handshake + compressor negotiation — the
    * compression spec scopes negotiation to EACH connection, so every
    * socket (per-partition cursors, writers, probes) offers the
    * configured list in ITS OWN hello (the auth hello when
    * credentials exist — no extra round trip) and compresses only
    * what THAT connection negotiated. A FORCED compressor (explicit
    * `compress=name`) the server does not echo is a loud client-side
    * error — never a silent plaintext downgrade; `auto` falls back to
    * plain frames. Returns (hello reply if one was sent, negotiated
    * compressor). With no auth and no offer, no hello ships at all
    * (the command stream needs none).
    */
  def connectionHandshake(sock: Socket,
                          auth: Option[Scram.Credential],
                          compressMode: String = "none")
      : (Option[BDoc], Option[Byte]) = {
    val offered = compressOffer(compressMode)
    val helloReply: Option[BDoc] = auth match {
      case Some(c) => Some(Scram.authenticate(sock, c, offered))
      case None if offered.nonEmpty =>
        val parts = Seq.newBuilder[(String, BVal)]
        parts += "hello" -> BInt32(1)
        parts += "compression" -> BArr(offered.map(BString(_)))
        parts += "$db" -> BString("admin")
        Some(runCommandOk(sock, BDoc(parts.result()), 898))
      case None => None
    }
    val chosen = chooseCompressor(offered,
      helloReply.map(echoedCompressors).getOrElse(Seq.empty))
    if (compressMode != "none" && compressMode != "auto")
      require(chosen.isDefined,
        s"compress=$compressMode was forced but this connection's " +
          "handshake did not negotiate it — the server does not " +
          "speak it (use compress=auto to fall back to plain frames)")
    (helloReply, chosen)
  }

  /** Driver-side `compress=auto` probe on a throwaway connection
    * (diagnostics/specs; the data path negotiates per connection via
    * [[connectionHandshake]]). Selection follows the client-preference
    * rule ([[chooseCompressor]]).
    */
  def negotiate(host: String, port: Int,
                offered: Seq[String] = Seq("snappy", "zstd", "zlib"),
                tls: Option[Tls.Conf] = None): Option[Byte] =
    chooseCompressor(offered,
      echoedCompressors(hello(host, port, compressors = offered,
        tls = tls)))

  /** Back-compat shim: zlib-only negotiation. */
  def negotiateZlib(host: String, port: Int,
                    tls: Option[Tls.Conf] = None): Boolean =
    negotiate(host, port, Seq("zlib"), tls)
      .contains(WireCompress.ZlibId)

  /** Shared cursor machinery: issue one opening command, then
    * `getMore` until the server returns cursor id 0. Pull-based —
    * one batch in memory at a time, the cursor contract.
    */
  sealed abstract class WireCursor(host: String, port: Int,
                                   db: String, coll: String,
                                   batchSize: Int,
                                   compressMode: String,
                                   auth: Option[Scram.Credential] = None,
                                   tls: Option[Tls.Conf] = None,
                                   soTimeoutMs: Int = 0,
                                   exhaust: Boolean = false)
      extends Iterator[BDoc] with AutoCloseable {

    protected def firstCommand: BDoc

    private val sock = openSocket(host, port, tls, soTimeoutMs)
    // per-connection handshake: authenticate BEFORE the opening
    // command ships, and compress only what THIS connection's own
    // hello negotiated (the compression spec's scope)
    private val compress: Option[Byte] =
      connectionHandshake(sock, auth, compressMode)._2
    private var reqId = 1
    private var cursorId = 0L
    private var batch: Iterator[BDoc] = Iterator.empty
    private var exhausted = false
    fetchFirst()

    private def cursorBatch(reply: BDoc, key: String)
        : (Long, Seq[BDoc]) = {
      requireOk(reply)
      val cur = field(reply, "cursor").asInstanceOf[BDoc]
      val id = field(cur, "id").asInstanceOf[BInt64].v
      val docs = field(cur, key).asInstanceOf[BArr].v
        .map(_.asInstanceOf[BDoc])
      (id, docs)
    }

    private def fetchFirst(): Unit = {
      val (id, docs) = cursorBatch(
        runCommand(sock, firstCommand,
          { reqId += 1; reqId }, compress), "firstBatch")
      cursorId = id; batch = docs.iterator
      exhausted = cursorId == 0L && docs.isEmpty
    }

    // an exhaust stream is live: replies keep arriving for one
    // already-sent getMore until the server clears moreToCome
    private var exhaustStreaming = false

    private def getMoreCmd: BDoc = BDoc(Seq(
      "getMore" -> BInt64(cursorId),
      "collection" -> BString(coll),
      "batchSize" -> BInt32(batchSize),
      "$db" -> BString(db)))

    private def fetchMore(): Unit = {
      if (cursorId == 0L) { exhausted = true; return }
      val reply =
        if (exhaust) {
          // EXHAUST (public OP_MSG spec, flag bit 16): ONE getMore
          // with exhaustAllowed, then the server streams batches with
          // moreToCome set until the cursor drains — a high-latency
          // link pays one round trip for the whole stream instead of
          // one per batch
          if (!exhaustStreaming) {
            sendMsg(sock, getMoreCmd, { reqId += 1; reqId },
              FlagExhaustAllowed, compress)
            exhaustStreaming = true
          }
          val (flags, doc) = readMsg(sock)
          if ((flags & FlagMoreToCome) == 0) exhaustStreaming = false
          doc
        } else runCommand(sock, getMoreCmd, { reqId += 1; reqId },
          compress)
      val (id, docs) = cursorBatch(reply, "nextBatch")
      cursorId = id; batch = docs.iterator
      if (!batch.hasNext && cursorId == 0L) exhausted = true
    }

    override def hasNext: Boolean = {
      while (!batch.hasNext && !exhausted) fetchMore()
      val h = batch.hasNext
      if (!h) close()
      h
    }
    override def next(): BDoc = batch.next()

    /** Early close KILLS the live cursor (best-effort) before the
      * socket drops — an abandoned server cursor would otherwise
      * pin its snapshot for the server's lifetime.
      */
    override def close(): Unit = {
      // mid-exhaust the socket has replies in flight — a killCursors
      // round trip would desync; dropping the connection kills the
      // server cursor (the real server reaps cursors of dead
      // connections; the double does too)
      if (cursorId != 0L && !exhaustStreaming) {
        try runCommand(sock, BDoc(Seq(
          "killCursors" -> BString(coll),
          "cursors" -> BArr(Seq(BInt64(cursorId))),
          "$db" -> BString(db))), { reqId += 1; reqId }, compress)
        catch { case _: Throwable => () }
        cursorId = 0L
      }
      try sock.close() catch { case _: Throwable => }
    }
  }

  /** Cursor walk of one `find`: the full command surface — a
    * conjunctive `filter`, an inclusion `projection`, a key-field
    * `sort`, a `limit`.
    */
  final class FindCursor(host: String, port: Int, db: String,
                         coll: String, filter: Option[BDoc],
                         projection: Option[Seq[String]],
                         sort: Option[(String, Int)],
                         limit: Option[Long], batchSize: Int,
                         compressMode: String = "none",
                         auth: Option[Scram.Credential] = None,
                         tls: Option[Tls.Conf] = None,
                         soTimeoutMs: Int = 0,
                         maxTimeMs: Option[Long] = None,
                         exhaust: Boolean = false,
                         readPref: Option[BDoc] = None)
      extends WireCursor(host, port, db, coll, batchSize, compressMode,
        auth, tls, soTimeoutMs, exhaust) {
    protected def firstCommand: BDoc = {
      val parts = Seq.newBuilder[(String, BVal)]
      parts += "find" -> BString(coll)
      filter.foreach(f => parts += "filter" -> f)
      projection.foreach(p => parts += "projection" ->
        BDoc(p.map(_ -> BInt32(1))))
      sort.foreach { case (f, dir) =>
        parts += "sort" -> BDoc(Seq(f -> BInt32(dir)))
      }
      limit.foreach(n => parts += "limit" -> BInt64(n))
      parts += "batchSize" -> BInt32(batchSize)
      // server-side cumulative processing bound (the command spec):
      // a query the server cannot finish in time is a LOUD
      // MaxTimeMSExpired error, not a hung cursor
      maxTimeMs.foreach(t => parts += "maxTimeMS" -> BInt64(t))
      // the OP_MSG secondaryOk signal: a non-primary mode rides as
      // the $readPreference global argument — without it a secondary
      // refuses the read (13435), per the public server rule
      readPref.foreach(d => parts += "$readPreference" -> d)
      parts += "$db" -> BString(db)
      BDoc(parts.result())
    }
  }

  /** Cursor walk of one `aggregate`: the pipeline ships as the
    * `pipeline` array, batch size in the `cursor` sub-document (the
    * command's documented shape) — the reference's schema-analysis
    * entry point (`core/analyser.py:254` runs
    * `aggregate([{"$sample": {"size": n}}])`).
    */
  final class AggregateCursor(host: String, port: Int, db: String,
                              coll: String, pipeline: Seq[BDoc],
                              batchSize: Int,
                              compressMode: String = "none",
                              auth: Option[Scram.Credential] = None,
                              tls: Option[Tls.Conf] = None,
                              soTimeoutMs: Int = 0,
                              maxTimeMs: Option[Long] = None,
                              readPref: Option[BDoc] = None)
      extends WireCursor(host, port, db, coll, batchSize, compressMode,
        auth, tls, soTimeoutMs) {
    protected def firstCommand: BDoc = {
      val parts = Seq.newBuilder[(String, BVal)]
      parts += "aggregate" -> BString(coll)
      parts += "pipeline" -> BArr(pipeline)
      parts += "cursor" -> BDoc(Seq("batchSize" -> BInt32(batchSize)))
      maxTimeMs.foreach(t => parts += "maxTimeMS" -> BInt64(t))
      readPref.foreach(d => parts += "$readPreference" -> d)
      parts += "$db" -> BString(db)
      BDoc(parts.result())
    }
  }

  /** The inclusive-lo / exclusive-hi key-range filter document. */
  def rangeFilter(keyField: String, lo: Long, hi: Long): BDoc =
    BDoc(Seq(keyField -> BDoc(Seq(
      "$gte" -> BInt64(lo), "$lt" -> BInt64(hi)))))

  /** Splits `[lo, hi)` into ≤ n contiguous ranges — OVERFLOW-SAFE
    * (the span of `[Long.MinValue, maxKey)` does not fit a Long, so
    * the arithmetic runs in BigInt).
    */
  def splitRanges(lo: Long, hi: Long, n: Int): Seq[(Long, Long)] = {
    require(n >= 1, s"numPartitions $n")
    if (hi <= lo) Nil
    else {
      val loB = BigInt(lo)
      val span = BigInt(hi) - loB
      (0 until n).map { p =>
        ((loB + span * p / n).toLong, (loB + span * (p + 1) / n).toLong)
      }.filter { case (a, b) => b > a }
    }
  }

  /** Merges the key-range conjunct with pushed-down extras into one
    * conjunctive filter document. When extras exist, every conjunct
    * becomes its own sub-document under a single top-level `$and`:
    * a raw-BSON document with DUPLICATE top-level keys (range
    * conjunct + a pushed filter on the key field, or repeated `$or`
    * trees) is not a guaranteed contract on a real server, even
    * though the in-process double folds every entry.
    */
  def mergedFilter(keyField: String, lo: Long, hi: Long,
                   extra: Seq[(String, BVal)]): BDoc =
    if (extra.isEmpty) rangeFilter(keyField, lo, hi)
    else andDoc(rangeFilter(keyField, lo, hi).v ++ extra)

  /** One conjunct list → one filter document, duplicate-key-safe:
    * a single conjunct stays a plain document, several wrap under
    * `$and` (see [[mergedFilter]]).
    */
  def andDoc(conjuncts: Seq[(String, BVal)]): BDoc =
    if (conjuncts.lengthCompare(1) <= 0) BDoc(conjuncts)
    else BDoc(Seq("$and" -> BArr(conjuncts.map(kv => BDoc(Seq(kv))))))

  /** Distributed collection scan: the key span splits into
    * `numPartitions` contiguous ranges and EACH PARTITION opens its
    * own connection and walks its own ranged cursor — no driver-side
    * accumulation, no shared cursor, scan parallelism = partition
    * count (against a real deployment each range lands on the shard
    * owning it). Schema-directed decode on the executors via
    * [[Bson.docToRow]]. `filterExtra` conjuncts and the `schema`'s
    * column set push into the server-side `find` (the DSv2 pushdown
    * path reuses this shape).
    */
  def read(spark: SparkSession, host: String, port: Int, db: String,
           coll: String, schema: StructType, keyField: String,
           minKey: Long, maxKeyExclusive: Long,
           numPartitions: Int = 4, batchSize: Int = 512,
           filterExtra: Seq[(String, BVal)] = Nil,
           projectColumns: Boolean = false,
           compressMode: String = "none",
           auth: Option[Scram.Credential] = None,
           tls: Option[Tls.Conf] = None): DataFrame = {
    require(numPartitions >= 1 && maxKeyExclusive >= minKey)
    val ranges = splitRanges(minKey, maxKeyExclusive, numPartitions)
    val proj = if (projectColumns) Some(schema.fieldNames.toSeq) else None
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(ranges.size, 1))
      .flatMap { case (lo, hi) =>
        new FindCursor(host, port, db, coll,
          Some(mergedFilter(keyField, lo, hi, filterExtra)), proj,
          None, None, batchSize, compressMode, auth, tls)
          .map(Bson.docToRow(_, schema))
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Newest-N over the wire: `find` with a key-field descending sort
    * and a pushed limit — the reference's newest-first scan (S3)
    * expressed as a wire command, executed on ONE executor task (the
    * result is ≤ n rows by contract, the TakeOrderedAndProject
    * shape).
    */
  def newest(spark: SparkSession, host: String, port: Int, db: String,
             coll: String, schema: StructType, keyField: String,
             n: Int, batchSize: Int = 512,
             auth: Option[Scram.Credential] = None,
             tls: Option[Tls.Conf] = None): DataFrame = {
    val rdd = spark.sparkContext.parallelize(Seq(0), 1).flatMap { _ =>
      new FindCursor(host, port, db, coll, None, None,
        Some((keyField, -1)), Some(n.toLong), batchSize,
        auth = auth, tls = tls)
        .map(Bson.docToRow(_, schema))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** `$sample` over the wire — the reference's schema-analysis scan
    * (`core/analyser.py:254`): one `aggregate` cursor with a
    * `$sample` stage, executed on one executor task (a sample is
    * small by contract). Against [[InProcessMongod]] the draw is
    * DETERMINISTIC (md5-keyed — see the server scaladoc), so an
    * oracle can replay it; a real server's `$sample` is random, so
    * callers must not rely on which documents arrive, only on the
    * count.
    */
  def sample(spark: SparkSession, host: String, port: Int, db: String,
             coll: String, schema: StructType, n: Int,
             batchSize: Int = 512,
             auth: Option[Scram.Credential] = None,
             tls: Option[Tls.Conf] = None): DataFrame = {
    val rdd = spark.sparkContext.parallelize(Seq(0), 1).flatMap { _ =>
      new AggregateCursor(host, port, db, coll,
        Seq(BDoc(Seq("$sample" -> BDoc(Seq("size" -> BInt32(n)))))),
        batchSize, auth = auth, tls = tls).map(Bson.docToRow(_, schema))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** One acknowledged `insert` batch on an open socket — the single
    * ack-parsing path shared by [[write]] and the V2 writer, so a
    * failure always surfaces the server's own errmsg and the two
    * paths cannot drift. Returns the acknowledged count (always
    * `docs.size`, or a loud error). `writeConcern` rides verbatim
    * (`{w, j}` per the public command shape); `session` =
    * (lsid bytes, txnNumber) marks the batch RETRYABLE — the server
    * records the ack under that pair, so re-sending the same
    * txnNumber after a lost ack returns the recorded result instead
    * of inserting twice.
    */
  def insertBatch(sock: Socket, db: String, coll: String,
                  docs: Seq[BDoc], requestId: Int,
                  writeConcern: Option[BDoc] = None,
                  session: Option[(Array[Byte], Long)] = None): Long = {
    // documents ride a kind-1 section (identifier "documents"), the
    // real drivers' bulk-write shape; the command body carries only
    // the command itself
    val parts = Seq.newBuilder[(String, BVal)]
    parts += "insert" -> BString(coll)
    writeConcern.foreach(wc => parts += "writeConcern" -> wc)
    session.foreach { case (lsid, txn) =>
      // lsid is a UUID (binary subtype 4) per the sessions spec
      parts += "lsid" -> BDoc(Seq("id" -> BBinary(4, lsid)))
      parts += "txnNumber" -> BInt64(txn)
    }
    parts += "$db" -> BString(db)
    val reply = runCommand(sock, BDoc(parts.result()), requestId,
      docSeq = Some(("documents", docs)))
    requireOk(reply)
    val n = field(reply, "n") match {
      case BInt32(x) => x.toLong
      case BInt64(x) => x
      case other => throw new IllegalArgumentException(
        s"insert reply n: $other")
    }
    require(n == docs.size, s"insert acknowledged $n of ${docs.size}")
    n
  }

  /** The `{w, j}` writeConcern document from plain options ("1",
    * "majority", …) — validation stays on the server, where the
    * real one lives.
    */
  def writeConcernDoc(w: Option[String],
                      j: Option[Boolean]): Option[BDoc] =
    if (w.isEmpty && j.isEmpty) None
    else Some(BDoc(
      w.map[(String, BVal)] { s =>
        "w" -> (scala.util.Try(s.toInt).toOption match {
          case Some(n) => BInt32(n)
          case None => BString(s)
        })
      }.toSeq ++
        j.map[(String, BVal)](b => "j" -> BBool(b)).toSeq))

  /** A connection-owning insert writer with RETRYABLE WRITES (the
    * public sessions + txnNumber contract): every batch carries this
    * writer's session id and a fresh txnNumber; on a TRANSPORT
    * failure (IOException — the connection died and the ack may have
    * been lost AFTER the server applied the batch) it reopens,
    * re-authenticates, and re-sends the SAME batch under the SAME
    * txnNumber exactly once — the server's session record turns the
    * replay into the recorded ack instead of a double insert. Server
    * ERRORS (ok: 0) never retry: they are answers, not losses. This
    * is what makes the V2 writer safe against mid-batch connection
    * drops without weakening the at-least-once task-retry contract.
    */
  final class RetryableWriter(host: String, port: Int, db: String,
                              coll: String,
                              auth: Option[Scram.Credential] = None,
                              tls: Option[Tls.Conf] = None,
                              writeConcern: Option[BDoc] = None,
                              retryWrites: Boolean = true,
                              seeds: Seq[(String, Int)] = Nil,
                              expectSetName: Option[String] = None)
      extends AutoCloseable {

    private val lsid: Array[Byte] = {
      val b = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(b)
      // RFC 4122 version/variant bits: a well-formed UUID v4
      b(6) = ((b(6) & 0x0f) | 0x40).toByte
      b(8) = ((b(8) & 0x3f) | 0x80).toByte
      b
    }
    private var txn = 0L
    private var reqId = 0
    private var sock: Socket = _
    // real deployments: retryable writes need SESSIONS (a replica
    // set or mongos) — a standalone server REJECTS txnNumber, so the
    // hello decides whether batches carry the session pair (the
    // drivers' own rule); known after the first connection
    private var sessionsSupported: Option[Boolean] = None

    private def ensure(): Socket = {
      if (sock == null) {
        // replica-aware: every (re)connection targets the CURRENT
        // primary. Discovery goes through the JVM-wide TTL cache —
        // a 10k-partition write must not spend 10k × members hello
        // round trips, and a step-down must not stampede every
        // writer into simultaneous re-discovery; the retry path
        // below invalidates first, so after a refusal the replay
        // sees the post-election topology
        val (h, p) =
          if (seeds.isEmpty) (host, port)
          else {
            val m = Replica.selectPrimary(
              Replica.discoverCached(seeds, tls, expectSetName))
            (m.host, m.port)
          }
        sock =
          try openSocket(h, p, tls)
          catch {
            // the cached primary may be GONE (it died — why there
            // was an election): one fresh discovery, then connect
            // to whatever is primary now
            case _: java.io.IOException if seeds.nonEmpty =>
              Replica.invalidate(seeds)
              val m = Replica.selectPrimary(
                Replica.discoverCached(seeds, tls, expectSetName))
              openSocket(m.host, m.port, tls)
          }
        val hello = auth match {
          case Some(c) => Scram.authenticate(sock, c)
          case None => runCommandOk(sock, BDoc(Seq(
            "hello" -> BInt32(1), "$db" -> BString("admin"))), 899)
        }
        if (sessionsSupported.isEmpty)
          sessionsSupported = Some(
            hello.v.exists(_._1 == "logicalSessionTimeoutMinutes") &&
              hello.v.exists(kv => kv._1 == "setName" ||
                kv == ("msg", BString("isdbgrid"))))
      }
      sock
    }

    private def dropConn(): Unit = {
      if (sock != null) {
        try sock.close() catch { case _: Throwable => () }
        sock = null
      }
    }

    private var sessionUsed = false

    def insert(docs: Seq[BDoc]): Long = {
      txn += 1
      val sockNow = ensure()   // resolves sessionsSupported
      val retryable = retryWrites && sessionsSupported.contains(true)
      val session = if (retryable) Some((lsid, txn)) else None
      sessionUsed ||= retryable
      try insertBatch(sockNow, db, coll, docs,
        { reqId += 1; reqId }, writeConcern, session)
      catch {
        // only a RECORDED batch may replay: without sessions a lost
        // ack is indistinguishable from an unapplied command, and a
        // blind resend could double-insert — fail the task instead
        // (Spark's at-least-once task retry owns it from there).
        // Two retryable shapes (both replay the SAME txnNumber once):
        //  - transport death (IOException): the ack may be lost
        //  - a RetryableWriteError-labeled server code (step-down &
        //    co.): the server ANSWERED "not me, re-select" — the
        //    reconnect re-discovers the primary
        case e: Exception if retryable &&
            (e.isInstanceOf[java.io.IOException] ||
              (e match {
                case se: ServerError => RetryableCodes(se.code)
                case _ => false
              })) =>
          dropConn()
          // the refusing server KNOWS the topology changed: drop
          // the cached view so the reconnect discovers fresh
          if (seeds.nonEmpty) Replica.invalidate(seeds)
          try insertBatch(ensure(), db, coll, docs,
            { reqId += 1; reqId }, writeConcern, session)
          catch {
            case e2: Throwable => e2.addSuppressed(e); throw e2
          }
      }
    }

    /** Closing ENDS the implicit session (`endSessions` per the
      * public sessions spec, best-effort): a large write opens one
      * writer per partition, and without this each leaves a server
      * session alive until the ~30-minute TTL — at 100 TB that is
      * thousands of zombie sessions per job on the server.
      */
    override def close(): Unit = {
      if (sock != null && sessionUsed) {
        try runCommandOk(sock, BDoc(Seq(
          "endSessions" -> BArr(Seq(BDoc(Seq(
            "id" -> BBinary(4, lsid))))),
          "$db" -> BString("admin"))), { reqId += 1; reqId })
        catch { case _: Throwable => () }
      }
      dropConn()
    }
  }

  /** Distributed write: every partition opens its own connection and
    * ships its rows as `insert` command batches, asserting the
    * server-acknowledged count per batch. Returns total rows
    * acknowledged.
    */
  def write(df: DataFrame, host: String, port: Int, db: String,
            coll: String, batchSize: Int = 512,
            auth: Option[Scram.Credential] = None,
            tls: Option[Tls.Conf] = None): Long = {
    val schema = df.schema
    df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.single(0L)
      else {
        val w = new RetryableWriter(host, port, db, coll, auth, tls)
        var acked = 0L
        try {
          rows.grouped(batchSize).foreach { group =>
            acked += w.insert(group.map(r => Bson.rowToDoc(r, schema)))
          }
        } finally w.close()
        Iterator.single(acked)
      }
    }.sum().toLong
  }

  /** Runs a cursor-reply command and drains EVERY batch on one
    * socket — the `listCollections` family pages like any cursor (a
    * database can hold more collections than one batch), so reading
    * only `firstBatch` silently truncates.
    */
  def commandCursorAll(host: String, port: Int, db: String,
                       cmd: BDoc, getMoreColl: String,
                       batchSize: Int = 101,
                       auth: Option[Scram.Credential] = None,
                       tls: Option[Tls.Conf] = None)
      : Seq[BDoc] = {
    val sock = openSocket(host, port, tls)
    try {
      auth.foreach(Scram.authenticate(sock, _))
      var reqId = 1
      var reply = runCommand(sock, cmd, reqId)
      requireOk(reply)
      val out = Seq.newBuilder[BDoc]
      var cur = field(reply, "cursor").asInstanceOf[BDoc]
      var id = field(cur, "id").asInstanceOf[BInt64].v
      out ++= field(cur, "firstBatch").asInstanceOf[BArr].v
        .map(_.asInstanceOf[BDoc])
      while (id != 0L) {
        reqId += 1
        reply = runCommand(sock, BDoc(Seq(
          "getMore" -> BInt64(id),
          "collection" -> BString(getMoreColl),
          "batchSize" -> BInt32(batchSize),
          "$db" -> BString(db))), reqId)
        requireOk(reply)
        cur = field(reply, "cursor").asInstanceOf[BDoc]
        id = field(cur, "id").asInstanceOf[BInt64].v
        out ++= field(cur, "nextBatch").asInstanceOf[BArr].v
          .map(_.asInstanceOf[BDoc])
      }
      out.result()
    } finally sock.close()
  }

  /** All collection names, paging included. */
  def listCollectionNames(host: String, port: Int, db: String,
                          auth: Option[Scram.Credential] = None,
                          tls: Option[Tls.Conf] = None)
      : Seq[String] =
    commandCursorAll(host, port, db, BDoc(Seq(
      "listCollections" -> BInt32(1), "$db" -> BString(db))),
      "$cmd.listCollections", auth = auth, tls = tls).map { d =>
      field(d, "name") match {
        case BString(s) => s
        case other => throw new IllegalArgumentException(s"name: $other")
      }
    }

  /** `listCollections` → one row per collection name. */
  def listCollections(spark: SparkSession, host: String, port: Int,
                      db: String): DataFrame = {
    val names = listCollectionNames(host, port, db)
    val schema = StructType(Seq(StructField("collection", StringType,
      nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(names.map(Row(_)), 1), schema)
  }

  /** `count` with an optional query filter. */
  def countDocs(host: String, port: Int, db: String, coll: String,
                query: Option[BDoc] = None,
                auth: Option[Scram.Credential] = None,
                tls: Option[Tls.Conf] = None,
                readPref: Option[BDoc] = None): Long = {
    val parts = Seq.newBuilder[(String, BVal)]
    parts += "count" -> BString(coll)
    query.foreach(q => parts += "query" -> q)
    readPref.foreach(d => parts += "$readPreference" -> d)
    parts += "$db" -> BString(db)
    field(command(host, port, BDoc(parts.result()), auth, tls),
      "n") match {
      case BInt32(x) => x.toLong
      case BInt64(x) => x
      case other => throw new IllegalArgumentException(s"count n: $other")
    }
  }

  /** `collStats` → (count, size bytes, avgObjSize). */
  def collStats(host: String, port: Int, db: String, coll: String,
                auth: Option[Scram.Credential] = None,
                tls: Option[Tls.Conf] = None)
      : (Long, Long, Double) = {
    val reply = command(host, port, BDoc(Seq(
      "collStats" -> BString(coll), "$db" -> BString(db))), auth, tls)
    val count = field(reply, "count") match {
      case BInt32(x) => x.toLong
      case BInt64(x) => x
      case other => throw new IllegalArgumentException(s"count: $other")
    }
    val size = field(reply, "size") match {
      case BInt64(x) => x
      case BInt32(x) => x.toLong
      case other => throw new IllegalArgumentException(s"size: $other")
    }
    val avg = field(reply, "avgObjSize") match {
      case BDouble(x) => x
      case other => throw new IllegalArgumentException(s"avg: $other")
    }
    (count, size, avg)
  }

  /** The admin probe the reference's TUI shows per collection —
    * `listCollections`, then `count` + `collStats` each, cross-checked
    * (a count/stats disagreement is a loud error, not a column):
    * one row per collection, (collection, n_docs).
    */
  def adminProbe(spark: SparkSession, host: String, port: Int,
                 db: String): DataFrame = {
    val names = listCollectionNames(host, port, db)
    val rows = names.map { c =>
      val n = countDocs(host, port, db, c)
      val (statsN, _, _) = collStats(host, port, db, c)
      require(n == statsN,
        s"count ($n) and collStats ($statsN) disagree for $c")
      Row(c, n)
    }
    val schema = StructType(Seq(
      StructField("collection", StringType, nullable = false),
      StructField("n_docs", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
