package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

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
  * oracle row, and a real `host:port` drops into [[read]] unchanged.
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

  /** One OP_MSG round trip over an open socket. */
  def runCommand(sock: Socket, cmd: BDoc, requestId: Int): BDoc = {
    val body = Bson.encode(cmd)
    val total = 16 + 4 + 1 + body.length
    val out = new DataOutputStream(sock.getOutputStream)
    val hdr = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(total).putInt(requestId).putInt(0).putInt(OpMsg)
      .putInt(0)            // flagBits
      .put(0.toByte)        // section kind 0
    out.write(hdr.array()); out.write(body); out.flush()
    val in = new DataInputStream(sock.getInputStream)
    val lenB = new Array[Byte](4); in.readFully(lenB)
    val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN)
      .getInt
    val rest = new Array[Byte](len - 4); in.readFully(rest)
    val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    buf.getInt; buf.getInt; buf.getInt   // requestID, responseTo, opCode
    buf.getInt                            // flagBits
    val kind = buf.get
    require(kind == 0, s"unsupported OP_MSG section kind $kind")
    Bson.readDoc(buf)
  }

  private def field(doc: BDoc, name: String): BVal =
    doc.v.find(_._1 == name).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"reply missing '$name': $doc"))

  /** Cursor walk over one key range: `find` with an inclusive-lo /
    * exclusive-hi `$gte`/`$lt` filter, then `getMore` until the
    * server returns cursor id 0. Pull-based iterator — one batch in
    * memory at a time, the cursor contract.
    */
  final class RangeCursor(host: String, port: Int, db: String,
                          coll: String, keyField: String,
                          lo: Long, hi: Long, batchSize: Int)
      extends Iterator[BDoc] with AutoCloseable {
    private val sock = new Socket(host, port)
    private var reqId = 1
    private var cursorId = 0L
    private var batch: Iterator[BDoc] = Iterator.empty
    private var exhausted = false
    fetchFirst()

    private def cursorBatch(reply: BDoc, key: String)
        : (Long, Seq[BDoc]) = {
      require(field(reply, "ok") == BDouble(1.0), s"command failed: $reply")
      val cur = field(reply, "cursor").asInstanceOf[BDoc]
      val id = field(cur, "id").asInstanceOf[BInt64].v
      val docs = field(cur, key).asInstanceOf[BArr].v
        .map(_.asInstanceOf[BDoc])
      (id, docs)
    }

    private def fetchFirst(): Unit = {
      val cmd = BDoc(Seq(
        "find" -> BString(coll),
        "filter" -> BDoc(Seq(keyField -> BDoc(Seq(
          "$gte" -> BInt64(lo), "$lt" -> BInt64(hi))))),
        "batchSize" -> BInt32(batchSize),
        "$db" -> BString(db)))
      val (id, docs) = cursorBatch(
        runCommand(sock, cmd, { reqId += 1; reqId }), "firstBatch")
      cursorId = id; batch = docs.iterator
      exhausted = cursorId == 0L && docs.isEmpty
    }

    private def fetchMore(): Unit = {
      if (cursorId == 0L) { exhausted = true; return }
      val cmd = BDoc(Seq(
        "getMore" -> BInt64(cursorId),
        "collection" -> BString(coll),
        "batchSize" -> BInt32(batchSize),
        "$db" -> BString(db)))
      val (id, docs) = cursorBatch(
        runCommand(sock, cmd, { reqId += 1; reqId }), "nextBatch")
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
    override def close(): Unit =
      try sock.close() catch { case _: Throwable => }
  }

  /** Distributed collection scan: the key span splits into
    * `numPartitions` contiguous ranges and EACH PARTITION opens its
    * own connection and walks its own ranged cursor — no driver-side
    * accumulation, no shared cursor, scan parallelism = partition
    * count (against a real deployment each range lands on the shard
    * owning it). Schema-directed decode on the executors via
    * [[Bson.docToRow]].
    */
  def read(spark: SparkSession, host: String, port: Int, db: String,
           coll: String, schema: StructType, keyField: String,
           minKey: Long, maxKeyExclusive: Long,
           numPartitions: Int = 4, batchSize: Int = 512): DataFrame = {
    require(numPartitions >= 1 && maxKeyExclusive >= minKey)
    val span = maxKeyExclusive - minKey
    val ranges = (0 until numPartitions).map { p =>
      (minKey + span * p / numPartitions,
        minKey + span * (p + 1) / numPartitions)
    }.filter { case (lo, hi) => hi > lo }
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(ranges.size, 1))
      .flatMap { case (lo, hi) =>
        new RangeCursor(host, port, db, coll, keyField, lo, hi,
          batchSize).map(Bson.docToRow(_, schema))
      }
    spark.createDataFrame(rdd, schema)
  }
}
