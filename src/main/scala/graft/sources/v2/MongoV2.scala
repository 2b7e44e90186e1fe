package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Bson
import graft.sources.Bson._
import graft.sources.MongoWire

/** `spark.read.format("graft-mongo")` — the wire-protocol client
  * ([[graft.sources.MongoWire]]) surfaced as a DataSource V2 table,
  * the idiomatic Spark shape for a custom source: Catalyst keeps the
  * whole relational plan and hands the scan its pruned columns,
  * translated filters, and limits through the standard pushdown
  * hooks, so `.explain` shows the pushed state on the `BatchScan`
  * node and the server ships less (the specs verify BOTH, via the
  * scan description and the server's served-docs/bytes meters).
  *
  * Pushdown contract (what the source claims to handle FULLY — a
  * non-returned filter is never re-checked by Spark, so the claim
  * set is deliberately conservative):
  *
  *  - columns: inclusion projection in the `find` command
  *    ([[Bson.projectRaw]] splices on the server);
  *  - filters: `=`, `<`, `<=`, `>`, `>=`, `IN` on int/long/double/
  *    boolean columns; `=`/`IN` on strings (string RANGES are NOT
  *    pushed: Spark orders strings by UTF-8 binary, the wire double
  *    by UTF-16 `compareTo` — equality agrees, order does not, the
  *    classic collation-mismatch pushdown bug); `IsNotNull` as
  *    `$ne null` (exists-and-not-null). Timestamps are never pushed
  *    (μs engine vs ms wire precision). Everything else stays in
  *    Spark as a post-scan filter.
  *  - limit / top-N (key-field sort only): pushed PARTIALLY — each
  *    key-range partition applies the sort prefix + limit, Spark
  *    keeps the global operator, exactly the semantics
  *    `isPartiallyPushed` exists for.
  *
  * Schema: pass one with `.schema(...)`, or omit it and the provider
  * INFERS from `samplesize` (default 64) sampled documents — the
  * reference's own signature move (its analyser builds schema from a
  * sampled cursor, `core/analyser.py`); numeric widenings int32 →
  * int64 → double, loud error on irreconcilable or all-null fields.
  *
  * Options: `host`, `port`, `database`, `collection`, `keyfield`
  * (integral, the range-partition + sort key), `minkey`/`maxkey`
  * (exclusive; omitted ⇒ probed with two 1-row sorted finds),
  * `numpartitions` (default 4), `batchsize` (default 512),
  * `samplesize` (default 64), `user`/`password`/`authdb` (SCRAM-
  * SHA-256 credentials, [[graft.sources.Scram]]; every connection —
  * per-partition cursors, probes, writers — authenticates before its
  * first command), `tls`/`tlstruststore`/`tlstruststorepassword`
  * ([[graft.sources.Tls]]; `tls=true` wraps every one of those
  * connections in an SSLSocket with the handshake forced at open —
  * the trust-store file must resolve on executors too, ship it with
  * `--files` on a real cluster), `tlshandshaketimeoutms` (default
  * 10000) / `tlsminprotocol` (explicit protocol floor, default
  * TLSv1.2), `sockettimeoutms` (read timeout on every connector
  * socket — a hung server is a loud SocketTimeoutException instead
  * of a pinned executor; default 0 = block forever), `maxtimems`
  * (server-side processing bound shipped on cursor-opening commands
  * — the server's own MaxTimeMSExpired surfaces as the error),
  * `tlskeystore`/`tlskeystorepassword` (mTLS client identity —
  * certificate + key presented when the server requires client
  * auth), `authmechanism` (`SCRAM` default, negotiated SHA-256/
  * SHA-1; or `MONGODB-X509` — certificate-subject auth against
  * `$external`, requires the client key store, takes no password),
  * `exhaust` (getMore streams every remaining batch on ONE round
  * trip via the OP_MSG exhaustAllowed/moreToCome flags — the
  * high-latency-link win, default off), `compress`
  * (`none`/`auto`/`snappy`/`zlib`/`zstd` — negotiated PER
  * CONNECTION in each connection's own hello; a forced compressor
  * the server lacks is a loud error, never a plaintext downgrade).
  *
  * Replica sets ([[graft.sources.Replica]]): `host` may be a seed
  * list (`"h1:p1,h2:p2"` — `port` then unused), `replicaset` pins
  * the expected set name (a member of the WRONG set is a loud
  * error), and `readpreference`
  * (`primary` default / `primaryPreferred` / `secondary` /
  * `secondaryPreferred` / `nearest`) routes the whole READ side:
  * partition cursors spread round-robin across the eligible members
  * carrying `$readPreference`, and metadata reads (key span,
  * plan-time counts, stats, schema inference) follow the SAME
  * preference — under `secondary` the primary serves zero reads of
  * any kind. `readpreferencetags` narrows eligibility by ordered
  * tag-set alternatives (`"nodeType:ANALYTICS,dc:east;
  * nodeType:ANALYTICS;"`; trailing `;` = match-anything fallback) —
  * the managed-deployment analytics-node story. ALL writes target
  * the discovered primary and retry once on
  * RetryableWriteError-labeled codes (step-down & co.) after
  * re-discovery — same (lsid, txnNumber), so failover costs one
  * replay, never a double insert. The streaming tail follows the
  * primary (its watermark is the newest key; secondary lag would
  * stall or re-order it).
  *
  * At 100 TB: one cursor per key range is the standard bulk-read
  * layout (each range lands on the shard owning it); pushdown means
  * the wire carries only needed columns and matching documents, and
  * partition count scales the scan without any driver-side state.
  */
class MongoTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-mongo"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoV2.inferSchema(MongoV2.Conf(options))

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MongoTable(schema,
      MongoV2.Conf(new CaseInsensitiveStringMap(properties)))
}

private[graft] object MongoV2 {

  /** One fully-pushed aggregate column: kind ∈ count|min|max. */
  final case class AggSpec(kind: String, dataType: DataType)

  /** Partial GROUP BY pushdown: one output column per entry.
    * kind ∈ countdocs|countnonnull|sum|min|max; `field` empty for
    * countdocs; `dataType` is the PARTIAL column's Spark type (what
    * the final merge expects).
    */
  final case class GroupAggCol(kind: String, field: String,
                               dataType: DataType)
  final case class GroupAggSpec(groupCols: Seq[(String, DataType)],
                                aggs: Seq[GroupAggCol])

  /** Plain serializable view of the reader options. */
  final case class Conf(host: String, port: Int, db: String,
                        coll: String, keyField: String,
                        minKey: Option[Long], maxKey: Option[Long],
                        numPartitions: Int, batchSize: Int,
                        sampleSize: Int, compressMode: String,
                        auth: Option[graft.sources.Scram.Credential]
                          = None,
                        tls: Option[graft.sources.Tls.Conf] = None,
                        writeConcernW: Option[String] = None,
                        writeConcernJ: Option[Boolean] = None,
                        retryWrites: Boolean = true,
                        variantType: Boolean = false,
                        soTimeoutMs: Int = 0,
                        maxTimeMs: Option[Long] = None,
                        exhaust: Boolean = false,
                        seeds: Seq[(String, Int)] = Nil,
                        readPref: String = "primary",
                        readTagSets: Seq[Map[String, String]] = Nil,
                        replicaSetName: Option[String] = None,
                        chunkAligned: Boolean = false) {
    /** The seed list (explicit, or the single host/port). */
    def seedList: Seq[(String, Int)] =
      if (seeds.nonEmpty) seeds else Seq((host, port))
  }

  object Conf {
    def apply(o: CaseInsensitiveStringMap): Conf = {
      def req(k: String): String = {
        val v = o.get(k)
        require(v != null, s"graft-mongo: missing required option '$k'")
        v
      }
      // `host` is a seed list when it carries inline ports
      // ("h1:p1,h2:p2" — the replica-set shape); `port` is then
      // optional and unused
      val seedList = graft.sources.Replica.parseSeeds(
        req("host"), req("port").toInt)
      val conf = Conf(
        host = seedList.head._1, port = seedList.head._2,
        seeds = seedList,
        readPref = Option(o.get("readpreference"))
          .map(graft.sources.Replica.parseMode)
          .getOrElse("primary"),
        readTagSets = Option(o.get("readpreferencetags"))
          .map(graft.sources.Replica.parseTagSets)
          .getOrElse(Nil),
        replicaSetName = Option(o.get("replicaset")),
        db = req("database"), coll = req("collection"),
        keyField = req("keyfield"),
        minKey = Option(o.get("minkey")).map(_.toLong),
        maxKey = Option(o.get("maxkey")).map(_.toLong),
        numPartitions = Option(o.get("numpartitions")
          ).map(_.toInt).getOrElse(4),
        batchSize = Option(o.get("batchsize")).map(_.toInt)
          .getOrElse(512),
        sampleSize = Option(o.get("samplesize")).map(_.toInt)
          .getOrElse(64),
        compressMode = Option(o.get("compress")) match {
          case None => "none"
          case Some(m @ ("none" | "zlib" | "snappy" | "zstd" |
                         "auto")) => m
          case Some(other) => throw new IllegalArgumentException(
            s"graft-mongo: unsupported compressor '$other' " +
              "(snappy, zlib, zstd, none, or auto)")
        },
        auth = Option(o.get("authmechanism"))
            .map(_.toUpperCase) match {
          case Some("MONGODB-X509") =>
            require(o.get("password") == null,
              "graft-mongo: MONGODB-X509 takes no password (the " +
                "client certificate is the proof)")
            require(Option(o.get("tls")).exists(_.toBoolean) &&
                o.get("tlskeystore") != null,
              "graft-mongo: MONGODB-X509 needs tls=true and " +
                "tlskeystore (the client certificate + key)")
            Some(graft.sources.Scram.x509Credential(
              Option(o.get("user"))))
          case Some(m) if m != "SCRAM" && m != "SCRAM-SHA-256" &&
              m != "SCRAM-SHA-1" =>
            throw new IllegalArgumentException(
              s"graft-mongo: unsupported authmechanism '$m' " +
                "(SCRAM or MONGODB-X509; SCRAM negotiates the hash)")
          case _ =>
            (Option(o.get("user")), Option(o.get("password"))) match {
              case (Some(u), Some(pw)) =>
                Some(graft.sources.Scram.Credential(u, pw,
                  Option(o.get("authdb")).getOrElse("admin")))
              case (None, None) => None
              case _ => throw new IllegalArgumentException(
                "graft-mongo: user and password options come " +
                  "together (authdb optional, default 'admin')")
            }
        },
        tls = Option(o.get("tls")).map(_.toBoolean).getOrElse(false)
          match {
            case false =>
              Seq("tlstruststore", "tlshandshaketimeoutms",
                  "tlsminprotocol", "tlskeystore").foreach(k =>
                require(o.get(k) == null,
                  s"graft-mongo: $k requires tls=true"))
              None
            case true => Some(graft.sources.Tls.Conf(
              Option(o.get("tlstruststore")),
              Option(o.get("tlstruststorepassword")),
              handshakeTimeoutMs =
                Option(o.get("tlshandshaketimeoutms")).map(_.toInt)
                  .getOrElse(10000),
              minProtocol = Option(o.get("tlsminprotocol"))
                .getOrElse("TLSv1.2"),
              keyStorePath = Option(o.get("tlskeystore")),
              keyStorePassword =
                Option(o.get("tlskeystorepassword"))))
          },
        writeConcernW = Option(o.get("writeconcernw")),
        writeConcernJ = Option(o.get("writeconcernj"))
          .map(_.toBoolean),
        retryWrites = Option(o.get("retrywrites"))
          .forall(_.toBoolean),
        variantType = Option(o.get("varianttype"))
          .exists(_.toBoolean),
        soTimeoutMs = Option(o.get("sockettimeoutms")).map(_.toInt)
          .getOrElse(0),
        maxTimeMs = Option(o.get("maxtimems")).map(_.toLong),
        exhaust = Option(o.get("exhaust")).exists(_.toBoolean),
        chunkAligned = Option(o.get("chunkaligned"))
          .exists(_.toBoolean))
      // the public drivers rule: tag sets combined with mode=primary
      // are an ERROR (primary selection ignores tags; silently
      // accepting the option would mislead)
      require(conf.readTagSets.isEmpty || conf.readPref != "primary",
        "graft-mongo: readpreferencetags requires a non-primary " +
          "readpreference (tag sets never apply to primary selection)")
      conf
    }
  }

  // Compression is negotiated PER CONNECTION (the drivers spec's
  // scope): partitions carry the MODE string and each connection's
  // own handshake offers/negotiates — no driver-side throwaway hello
  // whose result would bind connections that never negotiated it.
  // See MongoWire.connectionHandshake.

  /** The table's key window as filter conjuncts — what scopes the
    * COMMAND paths (`count`, edge finds, stats) to the same rows the
    * ranged scan reads. Without this, a table declared over
    * `[minkey, maxkey)` would count/min/max the WHOLE collection
    * while scanning only the window. Empty when no explicit window
    * was declared (the whole collection IS the window then — no
    * probe spent).
    */
  def windowConjuncts(c: Conf): Seq[(String, BVal)] =
    if (c.minKey.isEmpty && c.maxKey.isEmpty) Nil
    else {
      val (lo, hi) = keySpan(c)
      MongoWire.rangeFilter(c.keyField, lo, hi).v
    }

  /** Whether this conf needs replica-set topology discovery before
    * any wire work: several seeds, a declared set name, or a
    * non-primary read preference (which only means something against
    * a set — and against a standalone resolves to the one member or
    * a loud error, per the selection rules).
    */
  def replicaAware(c: Conf): Boolean =
    c.seedList.lengthCompare(1) > 0 || c.replicaSetName.isDefined ||
      c.readPref != "primary"

  /** Discovery hellos are ALWAYS bounded — `sockettimeoutms`
    * overrides the 10 s default; unbounded discovery against a
    * blackholed seed would hang the plan.
    */
  def helloTimeout(c: Conf): Int =
    if (c.soTimeoutMs > 0) c.soTimeoutMs else 10000

  /** Conf re-pointed at the discovered PRIMARY and fully RESOLVED
    * (seeds/set-name/read-preference cleared, so every downstream
    * routing decision is a no-op) — the paths that MUST read the
    * primary regardless of read preference: the streaming tail
    * (its watermark is the newest key; a secondary's replication lag
    * would stall or re-order it) and anything feeding a write. No-op
    * (no discovery round trips) for non-replica confs.
    */
  def primaryConf(c: Conf): Conf =
    if (!replicaAware(c)) c
    else {
      val m = graft.sources.Replica.selectPrimary(
        graft.sources.Replica.discover(c.seedList, c.tls,
          c.replicaSetName, helloTimeout(c)))
      c.copy(host = m.host, port = m.port, seeds = Nil,
        readPref = "primary", readTagSets = Nil,
        replicaSetName = None)
    }

  /** Conf re-pointed at ONE read-eligible member under the conf's
    * own read preference (selection index 0, seeds cleared so the
    * resolution sticks) — the driver-side metadata READ path:
    * key-span edge probes, plan-time counts, statistics, schema
    * inference. Metadata reads follow the SAME preference as the
    * data path, for two reasons that both matter at 100 TB: under
    * `readpreference=secondary` the primary serves ZERO reads of any
    * kind (the whole point is taking load off it), and the span /
    * types the plan derives come from the same member class the
    * partition cursors will read — consistent under replication lag
    * by construction. The preference mode is KEPT in the copy: the
    * probes must carry `$readPreference` or a secondary refuses
    * them. No-op for non-replica confs.
    */
  def readConf(c: Conf): Conf =
    if (!replicaAware(c)) c
    else {
      val topo = graft.sources.Replica.discover(c.seedList, c.tls,
        c.replicaSetName, helloTimeout(c))
      val m = graft.sources.Replica.selectForRead(topo, c.readPref,
        0, c.readTagSets)
      c.copy(host = m.host, port = m.port, seeds = Nil,
        replicaSetName = None)
    }

  /** One wire endpoint per partition index: the read preference
    * spreads a multi-partition scan round-robin across the eligible
    * members (all secondaries under `secondary`, …) — the point of
    * secondary reads at 100 TB is taking the scan OFF the primary
    * and ACROSS the set. Non-replica confs route everything at the
    * configured host.
    */
  def readRoutes(c: Conf, n: Int): Seq[(String, Int)] =
    if (!replicaAware(c)) Seq.fill(n)((c.host, c.port))
    else {
      val topo = graft.sources.Replica.discover(c.seedList, c.tls,
        c.replicaSetName, helloTimeout(c))
      (0 until n).map { i =>
        val m = graft.sources.Replica.selectForRead(topo, c.readPref,
          i, c.readTagSets)
        (m.host, m.port)
      }
    }

  /** The `$readPreference` DOCUMENT partition cursors must carry —
    * `{mode, tags?}` (None for primary reads: a bare command IS a
    * primary read). Tags ride along for a mongos to route by; a
    * replica-set member reads only the mode.
    */
  def readPrefArg(c: Conf): Option[BDoc] =
    graft.sources.Replica.readPrefDoc(c.readPref, c.readTagSets)

  /** Chunk-aligned partition ranges for a SHARDED collection
    * (`chunkaligned=true`): reads the cluster's own chunk map —
    * `config.collections` for the collection's shard key + uuid,
    * then `config.chunks` by uuid (the post-5.0 catalog; `ns` is
    * the pre-5.0 fallback) — and returns `[lo, hi)` ranges that are
    * chunk-group boundaries: adjacent same-shard chunks coalesce,
    * ranges never span a shard boundary. Every partition cursor is
    * then a single-shard TARGETED query through mongos instead of a
    * scatter-gather, and partition sizes follow the cluster's real
    * data distribution (chunks are split by bytes) instead of
    * uniform key arithmetic — at 100 TB the difference between one
    * shard working per cursor and every shard working on every
    * cursor. MinKey/MaxKey chunk ends clamp to the scan's own
    * `[lo, hiExcl)` window; chunks outside the window drop.
    */
  def chunkRanges(c: Conf, lo: Long, hiExcl: Long)
      : Seq[(Long, Long)] = {
    val ns = s"${c.db}.${c.coll}"
    val cc = new MongoWire.FindCursor(c.host, c.port, "config",
      "collections", Some(BDoc(Seq("_id" -> BString(ns)))), None,
      None, Some(1L), 2, auth = c.auth, tls = c.tls)
    val cdoc =
      try {
        require(cc.hasNext, s"graft-mongo: chunkaligned=true but " +
          s"$ns has no config.collections entry — not a sharded " +
          "collection (or the host is not a mongos)")
        cc.next()
      } finally cc.close()
    // the shard key must BE the key field: ranged cursors filter on
    // keyfield, and only shard-key ranges target single shards
    cdoc.v.collectFirst { case ("key", k: BDoc) => k }.foreach { k =>
      require(k.v.headOption.exists(_._1 == c.keyField),
        s"graft-mongo: $ns is sharded on " +
          s"'${k.v.headOption.map(_._1).getOrElse("?")}' but " +
          s"keyfield is '${c.keyField}' — chunk-aligned scans need " +
          "keyfield = the shard key")
    }
    val uuid = cdoc.v.collectFirst {
      case ("uuid", b: Bson.BBinary) => b
    }
    val filter = uuid
      .map(u => BDoc(Seq("uuid" -> (u: BVal))))
      .getOrElse(BDoc(Seq("ns" -> BString(ns))))
    val ch = new MongoWire.FindCursor(c.host, c.port, "config",
      "chunks", Some(filter), None, None, None, 512,
      auth = c.auth, tls = c.tls)
    val chunks = try ch.toVector finally ch.close()
    require(chunks.nonEmpty,
      s"graft-mongo: no config.chunks entries for $ns")
    // MinKey/MaxKey stay open (Long.MinValue/MaxValue) through the
    // sort + coalesce — mapping them into the scan window HERE
    // would break chunk ordering whenever the window starts inside
    // the key space; the window clamp is the LAST step
    def bound(d: BDoc): Long = d.v.headOption match {
      case Some((_, BInt64(x))) => x
      case Some((_, BInt32(x))) => x.toLong
      case Some((_, Bson.BMinKey)) => Long.MinValue
      case Some((_, Bson.BMaxKey)) => Long.MaxValue
      case other => throw new IllegalArgumentException(
        s"graft-mongo: non-integral chunk bound $other for $ns — " +
          "chunk-aligned scans need an int/long shard key")
    }
    val parsed = chunks.map { d =>
      def part(name: String): BDoc = d.v.collectFirst {
        case (`name`, b: BDoc) => b
      }.getOrElse(throw new IllegalArgumentException(
        s"graft-mongo: config.chunks doc missing '$name': $d"))
      val shard = d.v.collectFirst {
        case ("shard", BString(s)) => s
      }.getOrElse(throw new IllegalArgumentException(
        s"graft-mongo: config.chunks doc missing 'shard': $d"))
      (bound(part("min")), bound(part("max")), shard)
    }.sortBy(_._1)
    // the chunk map must TILE the key space — open start, open end,
    // no gaps, no overlaps. A gap would SILENTLY DROP its rows from
    // the scan (each cursor reads only its range); refusing loudly
    // is the only safe answer to a torn catalog read
    require(parsed.head._1 == Long.MinValue,
      s"graft-mongo: chunk map of $ns does not start at MinKey " +
        s"(first min: ${parsed.head._1}) — torn config.chunks read?")
    require(parsed.last._2 == Long.MaxValue,
      s"graft-mongo: chunk map of $ns does not end at MaxKey " +
        s"(last max: ${parsed.last._2}) — torn config.chunks read?")
    parsed.sliding(2).foreach {
      case Seq(a, b) => require(a._2 == b._1,
        s"graft-mongo: chunk map of $ns has a " +
          (if (a._2 < b._1) "GAP" else "OVERLAP") +
          s" between ${a._2} and ${b._1} — a scan would " +
          (if (a._2 < b._1) "silently drop" else "double") +
          " those rows; refusing (torn config.chunks read?)")
      case _ => ()
    }
    // coalesce ADJACENT same-shard chunks (fewer cursors, still one
    // shard each); clamp to the scan window and drop empties
    val grouped = parsed.foldLeft(
      Vector.empty[(Long, Long, String)]) { (acc, c0) =>
      acc.lastOption match {
        case Some((glo, ghi, gsh))
            if gsh == c0._3 && ghi == c0._1 =>
          acc.init :+ ((glo, c0._2, gsh))
        case _ => acc :+ c0
      }
    }
    grouped.map { case (l, h, _) =>
      (math.max(l, lo), math.min(h, hiExcl))
    }.filter { case (l, h) => l < h }
  }

  /** The `[min, maxExclusive)` key span: from options, or probed with
    * two single-row sorted finds (the `sort dir limit 1` idiom) —
    * routed by the read preference when replica-aware (see
    * [[readConf]]).
    */
  def keySpan(c0: Conf): (Long, Long) = (c0.minKey, c0.maxKey) match {
    case (Some(lo), Some(hi)) => (lo, hi)   // declared: no probe,
                                            // no discovery round trip
    case _ => keySpanResolved(readConf(c0))
  }

  private def keySpanResolved(c: Conf): (Long, Long) =
    (c.minKey, c.maxKey) match {
    case (Some(lo), Some(hi)) => (lo, hi)
    case _ =>
      def edge(dir: Int): Option[Long] = {
        val cur = new MongoWire.FindCursor(c.host, c.port, c.db, c.coll,
          None, Some(Seq(c.keyField)), Some((c.keyField, dir)),
          Some(1L), 2, auth = c.auth, tls = c.tls,
          readPref = readPrefArg(c))
        try {
          if (!cur.hasNext) None
          else {
            // LOUD on a non-integral key: collectFirst silently
            // missing here would make a NON-empty collection read as
            // empty — scans, streams, and pushed aggregates would
            // all return zero rows (e.g. the default `_id` ObjectId
            // on a real server)
            val doc = cur.next()
            doc.v.collectFirst {
              case (f, v) if f == c.keyField => v
            } match {
              case Some(BInt64(x)) => Some(x)
              case Some(BInt32(x)) => Some(x.toLong)
              case Some(other) => throw new IllegalStateException(
                s"graft-mongo: keyfield '${c.keyField}' of " +
                  s"${c.db}.${c.coll} is ${Bson.typeName(other)} on " +
                  "the server; ranged scans need an int32/int64 key " +
                  "— point the keyfield option (or " +
                  s"keyfield.${c.coll} on a catalog) at an integral " +
                  "field")
              case None => throw new IllegalStateException(
                s"graft-mongo: keyfield '${c.keyField}' is absent " +
                  s"from documents of ${c.db}.${c.coll} — point the " +
                  "keyfield option at an always-present integral " +
                  "field")
            }
          }
        } finally cur.close()
      }
      (edge(1), edge(-1)) match {
        case (Some(lo), Some(hi)) =>
          (c.minKey.getOrElse(lo), c.maxKey.getOrElse(hi + 1))
        case _ => (0L, 0L)   // empty collection: one empty range
      }
  }

  /** Schema inference from sampled documents — per-field BSON-type
    * union with numeric widening. A field whose sampled types are
    * IRRECONCILABLE (or nested documents) falls back to a VARIANT
    * column: StringType + [[Bson.VariantKey]] metadata, each value
    * decoding to its relaxed Extended JSON v2 render — the
    * reference's mixed-type analyser semantics
    * (`core/analyser.py:286` keeps per-field type histograms; a
    * loud error would refuse its core use case, a silent widening
    * would corrupt). Loud error stays where no value was ever seen
    * (all-null fields: nothing to type, nothing to render). The
    * sample arrives the way the reference takes it
    * (`core/analyser.py:254`): one `aggregate` cursor with a
    * `$sample` stage.
    */
  def inferSchema(c0: Conf): StructType = {
    val c = readConf(c0)   // metadata read: follows the preference
    val cur = new MongoWire.AggregateCursor(c.host, c.port, c.db,
      c.coll,
      Seq(BDoc(Seq("$sample" ->
        BDoc(Seq("size" -> BInt32(c.sampleSize)))))),
      math.max(c.sampleSize, 1), auth = c.auth, tls = c.tls,
      readPref = readPrefArg(c))
    val fields = scala.collection.mutable.LinkedHashMap
      .empty[String, Option[DataType]]
    val variant = scala.collection.mutable.Set.empty[String]
    try cur.foreach { doc =>
      doc.v.foreach { case (name, v) =>
        if (!variant.contains(name)) {
          try {
            val t = bsonType(v, name)
            fields.updateWith(name) {
              case None | Some(None) => Some(t)
              case Some(Some(prev)) => Some(merge(prev, t, name))
            }
          } catch {
            // irreconcilable union or nested document: variant
            case _: IllegalArgumentException =>
              variant += name
              fields.update(name, Some(StringType))
          }
        }
      }
    } finally cur.close()
    require(fields.nonEmpty,
      s"graft-mongo: cannot infer a schema from an empty sample of " +
        s"${c.db}.${c.coll}; pass .schema(...)")
    StructType(fields.toSeq.map {
      case (name, _) if variant.contains(name) =>
        // varianttype=true: Spark 4's native VariantType (shredded
        // storage + variant-aware expressions); default stays the
        // relaxed-extjson StringType render, the profiling bridge
        if (c.variantType) Bson.variantTypedField(name)
        else Bson.variantField(name)
      case (name, Some(dt)) => StructField(name, dt)
      case (name, None) => throw new IllegalArgumentException(
        s"graft-mongo: field '$name' was null in every sampled " +
          "document; pass an explicit schema")
    })
  }

  private def bsonType(v: BVal, field: String): Option[DataType] =
    v match {
      case BNull => None
      case _: BInt32 => Some(IntegerType)
      case _: BInt64 => Some(LongType)
      case _: BDouble => Some(DoubleType)
      case _: BString => Some(StringType)
      case _: BBool => Some(BooleanType)
      case _: BDateTime => Some(TimestampType)
      case _: BBinary => Some(BinaryType)
      case _: BObjectId => Some(StringType)   // 24-char hex render
      case BDecimal128(x) =>
        // widest precision, the observed scale; scales merge to max
        Some(DecimalType(38, math.max(x.scale(), 0)))
      case BArr(xs) =>
        val elem = xs.flatMap(x => bsonType(x, field)).distinct
          .foldLeft(Option.empty[DataType]) {
            case (None, t) => Some(t)
            case (Some(a), t) => Some(merge(a, Some(t), field)
              .getOrElse(t))
          }
        elem.map(ArrayType(_))
      case other => throw new IllegalArgumentException(
        s"graft-mongo: cannot infer a Spark type for field '$field' " +
          s"($other); pass an explicit schema")
    }

  private def merge(a: DataType, b: Option[DataType],
                    field: String): Option[DataType] = b match {
    case None => Some(a)
    case Some(bb) =>
      val rank = Map[DataType, Int](IntegerType -> 0, LongType -> 1,
        DoubleType -> 2)
      (a, bb) match {
        case (x, y) if x == y => Some(x)
        case (x, y) if rank.contains(x) && rank.contains(y) =>
          Some(if (rank(x) >= rank(y)) x else y)
        case (d1: DecimalType, d2: DecimalType) =>
          Some(DecimalType(38, math.max(d1.scale, d2.scale)))
        case (ArrayType(x, _), ArrayType(y, _)) =>
          merge(x, Some(y), field).map(ArrayType(_))
        case (x, y) => throw new IllegalArgumentException(
          s"graft-mongo: field '$field' is both $x and $y across " +
            "sampled documents; pass an explicit schema")
      }
  }

  /** sources.Filter → wire conjunct; None = not translatable (stays
    * in Spark). Conservative by design — see the class scaladoc.
    */
  def translate(f: Filter): Option[(String, (String, BVal))] = {
    def lit(v: Any): Option[BVal] = v match {
      case i: Int => Some(BInt32(i))
      case l: Long => Some(BInt64(l))
      case d: Double => Some(BDouble(d))
      case fl: Float => Some(BDouble(fl.toDouble))
      case s: String => Some(BString(s))
      case b: Boolean => Some(BBool(b))
      case _ => None
    }
    def ordered(v: Any): Option[BVal] = v match {
      case _: String => None   // UTF-8 vs UTF-16 order mismatch
      case other => lit(other)
    }
    def col(name: String): Option[String] =
      if (name.contains(".")) None else Some(name)
    f match {
      case sources.EqualTo(a, v) =>
        for (c <- col(a); b <- lit(v)) yield (c, ("$eq", b))
      case sources.GreaterThan(a, v) =>
        for (c <- col(a); b <- ordered(v)) yield (c, ("$gt", b))
      case sources.GreaterThanOrEqual(a, v) =>
        for (c <- col(a); b <- ordered(v)) yield (c, ("$gte", b))
      case sources.LessThan(a, v) =>
        for (c <- col(a); b <- ordered(v)) yield (c, ("$lt", b))
      case sources.LessThanOrEqual(a, v) =>
        for (c <- col(a); b <- ordered(v)) yield (c, ("$lte", b))
      case sources.In(a, vs) =>
        val bs = vs.toSeq.map(lit)
        if (bs.exists(_.isEmpty)) None
        else col(a).map(c => (c, ("$in", BArr(bs.flatten))))
      case sources.IsNotNull(a) =>
        col(a).map(c => (c, ("$ne", BNull)))
      case _ => None
    }
  }

  /** Whole filter TREES (And/Or over translatable leaves) become one
    * wire conjunct — `$and`/`$or` documents nesting arbitrarily. A
    * tree with any untranslatable leaf is rejected whole (it stays
    * in Spark); the leaf rules (string ranges, timestamps) apply
    * unchanged inside branches.
    */
  def translateTree(f: Filter): Option[(String, BVal)] = f match {
    case sources.And(l, r) =>
      for (a <- translateTree(l); b <- translateTree(r))
        yield ("$and", BArr(Seq(BDoc(Seq(a)), BDoc(Seq(b)))): BVal)
    case sources.Or(l, r) =>
      for (a <- translateTree(l); b <- translateTree(r))
        yield ("$or", BArr(Seq(BDoc(Seq(a)), BDoc(Seq(b)))): BVal)
    case leaf =>
      translate(leaf).map { case (c, (op, v)) =>
        (c, BDoc(Seq(op -> v)): BVal)
      }
  }

  /** InternalRow → BSON document under the write schema — the writer
    * twin of [[catalystValue]]. Timestamps truncate μs → ms (BSON
    * datetime is millisecond-grained; symmetric with the read side).
    */
  def internalRowToDoc(row: InternalRow, schema: StructType): BDoc =
    BDoc(schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val v: BVal =
        if (row.isNullAt(i)) BNull
        else f.dataType match {
          case LongType => BInt64(row.getLong(i))
          case IntegerType => BInt32(row.getInt(i))
          case DoubleType => BDouble(row.getDouble(i))
          case FloatType => BDouble(row.getFloat(i).toDouble)
          case StringType => BString(row.getUTF8String(i).toString)
          case BooleanType => BBool(row.getBoolean(i))
          case BinaryType => BBinary(0, row.getBinary(i))
          case dt: DecimalType => BDecimal128(
            row.getDecimal(i, dt.precision, dt.scale)
              .toJavaBigDecimal)
          // floorDiv: plain division rounds pre-epoch sub-ms values
          // TOWARD zero, shifting them forward a millisecond
          case TimestampType =>
            BDateTime(Math.floorDiv(row.getLong(i), 1000L))
          case ArrayType(et, _) =>
            val arr = row.getArray(i)
            BArr((0 until arr.numElements()).map { j =>
              (et match {
                case FloatType => BDouble(arr.getFloat(j).toDouble)
                case DoubleType => BDouble(arr.getDouble(j))
                case LongType => BInt64(arr.getLong(j))
                case IntegerType => BInt32(arr.getInt(j))
                case StringType =>
                  BString(arr.getUTF8String(j).toString)
                case dt => throw new IllegalArgumentException(
                  s"graft-mongo write: unsupported array element " +
                    s"type $dt for field '${f.name}'")
              }): BVal
            })
          case dt => throw new IllegalArgumentException(
            s"graft-mongo write: unsupported type $dt for field " +
              s"'${f.name}'")
        }
      (f.name, v)
    })

  /** BSON value → Catalyst internal value under the expected type —
    * the same widenings as [[Bson.docToRow]], emitted in InternalRow
    * terms (UTF8String, epoch micros, GenericArrayData).
    */
  /** Field-aware decode: variant columns render to relaxed Extended
    * JSON (see [[Bson.VariantKey]]); typed columns go through
    * [[catalystValue]].
    */
  def fieldValue(v: BVal, f: StructField): Any =
    if (f.dataType == VariantType) Bson.variantVal(v)
    else if (Bson.isVariantField(f))
      UTF8String.fromString(Bson.relaxedJson(v))
    else catalystValue(v, f.dataType, f.name)

  def catalystValue(v: BVal, dt: DataType, field: String): Any =
    (dt, v) match {
      case (_, BNull) => null
      case (LongType, BInt64(x)) => x
      case (LongType, BInt32(x)) => x.toLong
      case (IntegerType, BInt32(x)) => x
      case (DoubleType, BDouble(x)) => x
      case (DoubleType, BInt64(x)) => x.toDouble
      case (DoubleType, BInt32(x)) => x.toDouble
      case (FloatType, BDouble(x)) => x.toFloat
      case (StringType, BString(x)) => UTF8String.fromString(x)
      case (StringType, BObjectId(x)) =>
        UTF8String.fromString(Bson.hexString(x))
      case (BooleanType, BBool(x)) => x
      case (BinaryType, BBinary(_, x)) => x
      case (dt: DecimalType, BDecimal128(x)) =>
        org.apache.spark.sql.types.Decimal(x.setScale(dt.scale))
      case (TimestampType, BDateTime(ms)) => ms * 1000L
      case (ArrayType(et, _), BArr(xs)) =>
        new GenericArrayData(
          xs.map(catalystValue(_, et, field)).toArray)
      case (t, bv) => throw new IllegalArgumentException(
        s"graft-mongo: cannot read $bv as $t for field '$field'")
    }
}

private[v2] class MongoTable(schema: StructType, conf: MongoV2.Conf)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"${conf.db}.${conf.coll}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new MongoScanBuilder(schema, conf)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new MongoWrite(info.schema(), conf)
    }
}

/** `df.write.format("graft-mongo")` and `writeStream.format(...)` —
  * every partition/task opens its own connection and ships its rows
  * as acknowledged `insert` batches, the [[MongoWire.write]] layout
  * under the V2 writer lifecycle. The sink is APPEND-ONLY and
  * NON-TRANSACTIONAL (the command set has no multi-document
  * transaction): a failed task's already-acknowledged batches remain
  * on the server, so retries are at-least-once — the standard
  * contract for a non-transactional external sink; dedup downstream
  * by key if the writer can retry. `abort` therefore cannot roll
  * back and says so loudly in scaladoc rather than pretending.
  */
private[v2] class MongoWrite(schema: StructType, conf: MongoV2.Conf)
    extends Write with BatchWrite with StreamingWrite {

  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this

  // both parents default this true; restating it resolves the
  // diamond (no coordinator needed: writers are independent sockets)
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new MongoWriterFactory(schema, conf)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new MongoWriterFactory(schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] class MongoWriterFactory(schema: StructType,
                                     conf: MongoV2.Conf)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new MongoDataWriter(schema, conf)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MongoDataWriter(schema, conf)
}

private[v2] final case class MongoWriteCommit(rows: Long)
    extends WriterCommitMessage

private[v2] class MongoDataWriter(schema: StructType,
                                  conf: MongoV2.Conf)
    extends DataWriter[InternalRow] {

  // retryable by default (the real drivers' default): a connection
  // dropped after the server applied a batch but before the ack
  // arrived re-sends under the same (lsid, txnNumber) and gets the
  // RECORDED ack — no double insert, no failed task
  private lazy val writer = new MongoWire.RetryableWriter(
    conf.host, conf.port, conf.db, conf.coll, conf.auth, conf.tls,
    MongoWire.writeConcernDoc(conf.writeConcernW, conf.writeConcernJ),
    conf.retryWrites,
    // replica-aware: every (re)connect targets the CURRENT primary,
    // so a step-down between batches is one retry, not a failed task
    seeds = if (MongoV2.replicaAware(conf)) conf.seedList else Nil,
    expectSetName = conf.replicaSetName)
  private val buf = scala.collection.mutable.ArrayBuffer
    .empty[Bson.BDoc]
  private var acked = 0L

  private def flush(): Unit = if (buf.nonEmpty) {
    acked += writer.insert(buf.toSeq)
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    buf += MongoV2.internalRowToDoc(row, schema)
    if (buf.size >= conf.batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    MongoWriteCommit(acked)
  }

  // non-transactional: acknowledged batches cannot be rolled back
  override def abort(): Unit = ()

  override def close(): Unit = writer.close()
}

private[v2] class MongoScanBuilder(fullSchema: StructType,
                                   conf: MongoV2.Conf)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownTableSample
    with SupportsPushDownAggregates {

  // VARIANT columns (mixed-type fallback, Bson.VariantKey) never
  // push: their Spark value is a rendered JSON string while the wire
  // compares raw BSON values — equality and grouping semantics
  // diverge (e.g. int 5 vs double 5.0 group together on the server,
  // apart in the render), and a pushed filter is never re-checked
  private val variantCols: Set[String] =
    fullSchema.fields.filter(Bson.isVariantField).map(_.name).toSet

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var wireFilter: Seq[(String, BVal)] = Nil
  private var limit: Option[Int] = None
  private var sortDesc: Option[Boolean] = None
  private var hadResidual = false
  private var aggSpecs: Option[Seq[MongoV2.AggSpec]] = None
  private var groupAgg: Option[MongoV2.GroupAggSpec] = None
  private var sampleFraction: Option[Double] = None

  /** TABLESAMPLE / df.sample pushdown: the server draws the sample
    * (`$sample`), the wire carries only sampled documents. Accepted
    * only for the plain Bernoulli shape (no replacement, zero lower
    * bound). Under Spark's V2ScanRelationPushDown rule order the
    * sample pushes FIRST (before filters/aggregates/limits), so no
    * other pushdown state can exist here — the later hooks each
    * check `sampleFraction` themselves. The documented semantic
    * trade: the source draws an EXACT-size random sample (binomial
    * count variance under Spark's own Bernoulli sampler is not
    * preserved), and against a real server the draw is genuinely
    * random — rely on count and distribution, not on which documents
    * arrive. The seed CANNOT ride the wire (`$sample` takes no seed),
    * which is acceptable for a nondeterministic operator.
    */
  override def pushTableSample(lowerBound: Double, upperBound: Double,
                               withReplacement: Boolean,
                               seed: Long): Boolean =
    if (withReplacement || lowerBound != 0.0) false
    else {
      sampleFraction = Some(upperBound)
      true
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a filter ABOVE a pushed sample (df.sample(f).filter(p) — the
    // rule order pushes the sample first) must stay in Spark: pushing
    // it would run $match BEFORE $sample on the wire, inverting the
    // plan's operator order (the sample would then draw an exact-size
    // sample of the FILTERED set instead of filtering the sample)
    if (sampleFraction.isDefined) { hadResidual = filters.nonEmpty; return filters }
    val (ok, rest) = filters.partition(f =>
      f.references.forall(r => !variantCols.contains(r)) &&
        MongoV2.translateTree(f).isDefined)
    pushed = ok
    hadResidual = rest.nonEmpty
    // one wire conjunct per pushed filter (top-level entries of one
    // filter document are conjunctive; duplicate field keys are fine
    // — the evaluator folds every entry)
    wireFilter = ok.toSeq.flatMap(MongoV2.translateTree)
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = {
    // a limit above a pushed group-aggregate cannot ride the group
    // scan (partials per partition are not the final rows); above a
    // pushed sample, Spark keeps the global limit (partial contract)
    if (groupAgg.isDefined || aggSpecs.isDefined ||
        sampleFraction.isDefined) return false
    limit = Some(n)
    true
  }
  // every key-range partition applies the limit independently, so the
  // global operator must stay in Spark
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean =
    if (groupAgg.isDefined || aggSpecs.isDefined ||
        sampleFraction.isDefined) false
    else orders match {
      case Array(o) => o.expression() match {
        case ref: NamedReference
            if ref.fieldNames.sameElements(Array(conf.keyField)) =>
          sortDesc = Some(o.direction() == SortDirection.DESCENDING)
          limit = Some(n)
          true
        case _ => false
      }
      case _ => false
    }

  /** COUNT(*) / MIN(key) / MAX(key) with no GROUP BY become wire
    * commands (`count`, and 1-row sorted finds) — a 100 TB
    * collection's count is O(1) metadata on the server instead of a
    * full cursor scan. COMPLETE pushdown only, and only when every
    * filter was also pushed (a residual filter would make the wire
    * count wrong); anything else stays in Spark.
    */
  private def translateAgg(agg: Aggregation)
      : Option[Seq[MongoV2.AggSpec]] = {
    if (agg.groupByExpressions().nonEmpty || hadResidual) None
    else {
      def isKey(col: org.apache.spark.sql.connector.expressions.Expression)
          : Boolean = col match {
        case r: NamedReference =>
          r.fieldNames.sameElements(Array(conf.keyField))
        case _ => false
      }
      val keyType = fullSchema.fields
        .find(_.name == conf.keyField).map(_.dataType)
      val specs = agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Some(MongoV2.AggSpec("count", LongType))
        case m: Min if isKey(m.column()) =>
          keyType.map(MongoV2.AggSpec("min", _))
        case m: Max if isKey(m.column()) =>
          keyType.map(MongoV2.AggSpec("max", _))
        case _ => None
      }
      if (specs.exists(_.isEmpty) || specs.isEmpty) None
      else Some(specs.flatten)
    }
  }

  /** GROUP BY pushdown — PARTIAL: every key-range partition ships
    * its per-group partials (`$group` on the server, map-side
    * aggregation AT THE SOURCE) and Spark's final aggregate merges
    * across partitions. Accepted: grouping on exact-equality columns
    * (int/long/string/bool), COUNT(*) / COUNT(col) / MIN / MAX on
    * int/long/double, SUM on int/long (wrapping 64-bit, Spark's
    * non-ANSI overflow) and on decimals whose widened result still
    * fits decimal128's 34 digits. Strings are NOT accepted for
    * min/max (UTF-8 vs UTF-16 order, the pushdown collation rule).
    */
  private def translateGroupAgg(agg: Aggregation)
      : Option[MongoV2.GroupAggSpec] = {
    if (agg.groupByExpressions().isEmpty || hadResidual) return None
    def named(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    def typeOf(c: String): Option[DataType] =
      fullSchema.fields
        .find(f => f.name == c && !Bson.isVariantField(f))
        .map(_.dataType)
    val groups = agg.groupByExpressions().toSeq.map { e =>
      for {
        c <- named(e)
        t <- typeOf(c)
        if t == IntegerType || t == LongType || t == StringType ||
          t == BooleanType
      } yield (c, t)
    }
    val orderable = Set[DataType](IntegerType, LongType, DoubleType)
    val aggs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Some(MongoV2.GroupAggCol("countdocs", "", LongType))
      // COUNT(col) is NOT pushed: the real server has no count-non-
      // null accumulator in this pipeline subset, and inventing a
      // wire operator only the test double speaks would be a
      // compatibility lie — Spark computes it over the plain scan
      case m: Min =>
        for {
          f <- named(m.column()); t <- typeOf(f) if orderable(t)
        } yield MongoV2.GroupAggCol("min", f, t)
      case m: Max =>
        for {
          f <- named(m.column()); t <- typeOf(f) if orderable(t)
        } yield MongoV2.GroupAggCol("max", f, t)
      case s: org.apache.spark.sql.connector.expressions.aggregate.Sum
          if !s.isDistinct =>
        named(s.column()).flatMap { f =>
          typeOf(f) match {
            case Some(IntegerType) | Some(LongType) =>
              Some(MongoV2.GroupAggCol("sum", f, LongType))
            case Some(d: DecimalType) if d.precision + 10 <= 34 =>
              Some(MongoV2.GroupAggCol("sum", f,
                DecimalType(math.min(38, d.precision + 10), d.scale)))
            case _ => None
          }
        }
      case _ => None
    }
    if (groups.exists(_.isEmpty) || aggs.exists(_.isEmpty) ||
        aggs.isEmpty) None
    else Some(MongoV2.GroupAggSpec(groups.flatten, aggs.flatten))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    // an aggregate above a pushed sample must see SAMPLED rows; the
    // command paths (count / edge finds / $group) see the collection
    if (sampleFraction.isDefined) false
    else translateAgg(agg) match {
      case Some(s) => aggSpecs = Some(s); true
      case None => translateGroupAgg(agg) match {
        case Some(g) => groupAgg = Some(g); true
        case None => false
      }
    }

  override def build(): Scan = (aggSpecs, groupAgg) match {
    case (Some(specs), _) => new MongoAggScan(conf,
      wireFilter ++ MongoV2.windowConjuncts(conf), specs)
    case (None, Some(g)) => new MongoGroupScan(conf, wireFilter, g)
    case _ if sampleFraction.isDefined =>
      new MongoSampleScan(required, conf, wireFilter,
        sampleFraction.get)
    case _ =>
      new MongoScan(required, conf, pushed, wireFilter, limit,
        sortDesc)
  }
}

/** The partial-GROUP-BY scan: each key-range partition runs an
  * `aggregate` pipeline `[$match(range ∧ pushed filter), $group]`
  * and ships per-group PARTIALS; Spark's final aggregate merges
  * them. At 100 TB this moves group partials over the wire instead
  * of documents — the classic map-side combine, executed by the
  * source.
  */
private[v2] class MongoGroupScan(conf: MongoV2.Conf,
                                 wireFilter: Seq[(String, BVal)],
                                 spec: MongoV2.GroupAggSpec)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    spec.groupCols.map { case (n, t) => StructField(n, t) } ++
      spec.aggs.zipWithIndex.map { case (a, i) =>
        StructField(s"agg_$i", a.dataType)
      })

  override def description(): String =
    s"GraftMongoGroupScan ${conf.db}.${conf.coll} " +
      s"GroupBy: [${spec.groupCols.map(_._1).mkString(", ")}], " +
      s"PartialAggs: [${spec.aggs.map(a =>
        s"${a.kind}(${a.field})").mkString(", ")}], " +
      s"Filter: [${wireFilter.map(_._1).mkString(", ")}]"

  override def toBatch: Batch = this

  // probed/discovered ONCE per scan, like MongoScan
  private lazy val resolvedSpan: (Long, Long) = MongoV2.keySpan(conf)

  override def planInputPartitions(): Array[InputPartition] = {
    val (minKey, maxKeyExclusive) = resolvedSpan
    val parts =
      if (conf.chunkAligned)
        MongoV2.chunkRanges(conf, minKey, maxKeyExclusive)
      else MongoWire.splitRanges(minKey, maxKeyExclusive,
        conf.numPartitions)
    val ranges = if (parts.isEmpty) Seq((0L, 0L)) else parts
    val routes = MongoV2.readRoutes(conf, ranges.size)
    val rp = MongoV2.readPrefArg(conf)
    ranges.zip(routes).map { case ((lo, hi), (h, p)) =>
      MongoGroupPartition(h, p, conf.db, conf.coll,
        conf.keyField, lo, hi, conf.batchSize, wireFilter, spec,
        conf.compressMode, conf.auth, conf.tls,
        conf.soTimeoutMs, conf.maxTimeMs, rp): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        new MongoGroupReader(p.asInstanceOf[MongoGroupPartition])
    }
}

private[v2] final case class MongoGroupPartition(
    host: String, port: Int, db: String, coll: String,
    keyField: String, lo: Long, hi: Long, batchSize: Int,
    wireFilter: Seq[(String, BVal)], spec: MongoV2.GroupAggSpec,
    compressMode: String,
    auth: Option[graft.sources.Scram.Credential],
    tls: Option[graft.sources.Tls.Conf],
    soTimeoutMs: Int, maxTimeMs: Option[Long],
    readPref: Option[graft.sources.Bson.BDoc] = None)
  extends InputPartition

private[v2] class MongoGroupReader(p: MongoGroupPartition)
    extends PartitionReader[InternalRow] {

  private val cursor = {
    val matchDoc =
      MongoWire.mergedFilter(p.keyField, p.lo, p.hi, p.wireFilter)
    val groupDoc = BDoc(
      ("_id" -> (BDoc(p.spec.groupCols.map { case (c, _) =>
        (c, BString("$" + c): BVal)
      }): BVal)) +:
        p.spec.aggs.zipWithIndex.map { case (a, i) =>
          val acc: BVal = a.kind match {
            case "countdocs" => BDoc(Seq("$sum" -> BInt32(1)))
            case "sum" => BDoc(Seq("$sum" -> BString("$" + a.field)))
            case "min" => BDoc(Seq("$min" -> BString("$" + a.field)))
            case "max" => BDoc(Seq("$max" -> BString("$" + a.field)))
            case k => throw new IllegalStateException(k)
          }
          (s"agg_$i", acc)
        })
    new MongoWire.AggregateCursor(p.host, p.port, p.db, p.coll,
      Seq(BDoc(Seq("$match" -> matchDoc)),
        BDoc(Seq("$group" -> groupDoc))),
      p.batchSize, p.compressMode, p.auth, p.tls,
      p.soTimeoutMs, p.maxTimeMs, p.readPref)
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (cursor.hasNext) {
      val doc = cursor.next()
      val m = doc.v.toMap
      val idDoc = m.getOrElse("_id",
        throw new IllegalArgumentException(s"group doc missing _id"))
        .asInstanceOf[BDoc].v.toMap
      val groupVals = p.spec.groupCols.map { case (c, t) =>
        idDoc.get(c) match {
          case None | Some(BNull) => null
          case Some(v) => MongoV2.catalystValue(v, t, c)
        }
      }
      val aggVals = p.spec.aggs.zipWithIndex.map { case (a, i) =>
        m.get(s"agg_$i") match {
          case None | Some(BNull) => null
          case Some(v) => MongoV2.catalystValue(v, a.dataType,
            s"agg_$i")
        }
      }
      current = new GenericInternalRow(
        (groupVals ++ aggVals).toArray[Any])
      true
    } else false

  override def get(): InternalRow = current

  override def close(): Unit = cursor.close()
}

/** The fully-pushed-aggregate scan: ONE row, computed by wire
  * commands — `count` (with the pushed filter as its query), and
  * key min/max as 1-row sorted finds against the key index.
  */
private[v2] class MongoAggScan(conf: MongoV2.Conf,
                               wireFilter: Seq[(String, BVal)],
                               specs: Seq[MongoV2.AggSpec])
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(specs.zipWithIndex.map { case (s, i) =>
      StructField(s"${s.kind}_${conf.keyField}_$i", s.dataType)
    })

  override def description(): String =
    s"GraftMongoAggScan ${conf.db}.${conf.coll} " +
      s"PushedAggregates: [${specs.map(_.kind).mkString(", ")}], " +
      s"Filter: [${wireFilter.map(_._1).mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val (h, p) = MongoV2.readRoutes(conf, 1).head
    Array(MongoAggPartition(h, p, conf.db, conf.coll,
      conf.keyField, wireFilter, specs, conf.auth, conf.tls,
      MongoV2.readPrefArg(conf)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        new MongoAggReader(p.asInstanceOf[MongoAggPartition])
    }
}

private[v2] final case class MongoAggPartition(
    host: String, port: Int, db: String, coll: String,
    keyField: String, wireFilter: Seq[(String, BVal)],
    specs: Seq[MongoV2.AggSpec],
    auth: Option[graft.sources.Scram.Credential],
    tls: Option[graft.sources.Tls.Conf],
    readPref: Option[graft.sources.Bson.BDoc] = None)
  extends InputPartition

private[v2] class MongoAggReader(p: MongoAggPartition)
    extends PartitionReader[InternalRow] {

  private var emitted = false

  private def edgeKey(dir: Int): Option[Long] = {
    val cur = new MongoWire.FindCursor(p.host, p.port, p.db, p.coll,
      if (p.wireFilter.isEmpty) None
      else Some(MongoWire.andDoc(p.wireFilter)),
      Some(Seq(p.keyField)), Some((p.keyField, dir)), Some(1L), 2,
      auth = p.auth, tls = p.tls, readPref = p.readPref)
    try {
      if (!cur.hasNext) None
      else cur.next().v.collectFirst {
        case (f, BInt64(x)) if f == p.keyField => x
        case (f, BInt32(x)) if f == p.keyField => x.toLong
      }
    } finally cur.close()
  }

  override def next(): Boolean =
    if (emitted) false
    else {
      emitted = true
      true
    }

  override def get(): InternalRow = {
    val vals: Array[Any] = p.specs.map { s =>
      s.kind match {
        case "count" =>
          MongoWire.countDocs(p.host, p.port, p.db, p.coll,
            if (p.wireFilter.isEmpty) None
            else Some(MongoWire.andDoc(p.wireFilter)), p.auth, p.tls,
            p.readPref)
        case "min" | "max" =>
          edgeKey(if (s.kind == "min") 1 else -1) match {
            case None => null          // empty: MIN/MAX are NULL
            case Some(k) => s.dataType match {
              case IntegerType => k.toInt
              case _ => k
            }
          }
      }
    }.toArray
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}

private[v2] class MongoScan(required: StructType, conf: MongoV2.Conf,
                            pushed: Array[Filter],
                            wireFilter: Seq[(String, BVal)],
                            limit: Option[Int],
                            sortDesc: Option[Boolean])
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (join-derived) key filters — Spark's DSv2 dynamic
    * pruning hook: when this scan sits under a join on the key and
    * the other side is small, Spark hands the build side's key set
    * here BEFORE input partitions are planned. The IN-set becomes a
    * wire `$in` conjunct AND narrows the planned key ranges to
    * `[min, max]` (the binary-searched index window), so pruned
    * partitions never even open a cursor. Prune-only semantics:
    * a filter this scan cannot express is IGNORED (the join still
    * applies it), never an error.
    */
  private var runtimeWire: Seq[(String, BVal)] = Nil
  private var runtimeLo: Option[Long] = None
  private var runtimeHiIncl: Option[Long] = None

  // advertise the key ONLY when column pruning kept it: Spark
  // resolves filterAttributes against the scan OUTPUT, so a pruned
  // key would fail analysis (found by the catalog-join oracle row,
  // where the key column is projected away)
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (required.fieldNames.contains(conf.keyField))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(conf.keyField))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    def longOf(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    filters.foreach {
      case sources.In(a, vs) if a == conf.keyField =>
        val ks = vs.toSeq.map(longOf)
        if (ks.forall(_.isDefined)) {
          val keys = ks.flatten
          if (keys.isEmpty) { runtimeLo = Some(1L); runtimeHiIncl = Some(0L) }
          else {
            runtimeWire :+= (conf.keyField,
              BDoc(Seq("$in" -> BArr(keys.map(BInt64(_))))): BVal)
            runtimeLo = Some(runtimeLo.fold(keys.min)(math.max(_, keys.min)))
            runtimeHiIncl = Some(
              runtimeHiIncl.fold(keys.max)(math.min(_, keys.max)))
          }
        }
      case sources.EqualTo(a, v) if a == conf.keyField =>
        longOf(v).foreach { k =>
          runtimeWire :+= (conf.keyField,
            BDoc(Seq("$eq" -> BInt64(k))): BVal)
          runtimeLo = Some(runtimeLo.fold(k)(math.max(_, k)))
          runtimeHiIncl = Some(runtimeHiIncl.fold(k)(math.min(_, k)))
        }
      case _ => ()   // inexpressible runtime filter: prune-only, skip
    }
  }

  override def readSchema(): StructType = required

  /** Server statistics for Catalyst's cost model — WITHOUT this a
    * DSv2 source reports "unknown = assume huge" and a 25-row live
    * dimension under a join gets a sort-merge plan; WITH it the
    * optimizer auto-broadcasts small wire collections. `collStats`
    * supplies rows + bytes; a pushed filter refines the row count
    * through the `count` command and scales bytes by selectivity
    * (both O(1) server probes, computed once per plan).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (rows, bytes) =
      try {
        val pc = MongoV2.readConf(conf)   // metadata read: preference
        val (cnt, size, _) = MongoWire.collStats(pc.host, pc.port,
          pc.db, pc.coll, pc.auth, pc.tls)
        // the declared key window scopes the stats like the scan
        val eff = wireFilter ++ MongoV2.windowConjuncts(pc)
        if (eff.isEmpty || cnt == 0L) (cnt, size)
        else {
          val fc = MongoWire.countDocs(pc.host, pc.port, pc.db,
            pc.coll, Some(MongoWire.andDoc(eff)), pc.auth,
            pc.tls, MongoV2.readPrefArg(pc))
          (fc, math.max(size * fc / cnt, 1L))
        }
      } catch {
        // a stats probe must never fail the plan; fall back to
        // "unknown", which is what Spark assumes anyway
        case _: Exception => return new
            org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes() = java.util.OptionalLong.empty()
          override def numRows() = java.util.OptionalLong.empty()
        }
      }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes() = java.util.OptionalLong.of(bytes)
      override def numRows() = java.util.OptionalLong.of(rows)
    }
  }

  override def description(): String = {
    val f = pushed.mkString(", ")
    val cols = required.fieldNames.mkString(", ")
    s"GraftMongoScan ${conf.db}.${conf.coll} " +
      s"PushedFilters: [$f], ReadColumns: [$cols]" +
      limit.map(n => s", PushedLimit: $n").getOrElse("") +
      sortDesc.map(d => s", PushedSort: ${conf.keyField} " +
        (if (d) "DESC" else "ASC")).getOrElse("") +
      (if (conf.chunkAligned) ", ChunkAligned: true" else "")
  }

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    // the tail follows the PRIMARY: its watermark is the newest key,
    // and a secondary's replication lag would stall or re-order it
    new MongoMicroBatchStream(required, MongoV2.primaryConf(conf),
      wireFilter)

  // probed ONCE per scan (Spark may call planInputPartitions more
  // than once): one edge-probe pair and one topology discovery per
  // plan, not per call
  private lazy val resolvedSpan: (Long, Long) = MongoV2.keySpan(conf)
  private lazy val resolvedRoutes: Int => Seq[(String, Int)] = {
    val cache = scala.collection.mutable.Map
      .empty[Int, Seq[(String, Int)]]
    n => cache.getOrElseUpdate(n, MongoV2.readRoutes(conf, n))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (minKey0, maxKeyExclusive0) = resolvedSpan
    // runtime key filters narrow the planned window
    val minKey = runtimeLo.fold(minKey0)(math.max(minKey0, _))
    val maxKeyExclusive = runtimeHiIncl.fold(maxKeyExclusive0)(h =>
      if (h == Long.MaxValue) maxKeyExclusive0
      else math.min(maxKeyExclusive0, h + 1))
    // sharded: one partition per chunk group (single-shard targeted
    // cursors through mongos); otherwise uniform key splits
    val parts =
      if (conf.chunkAligned)
        MongoV2.chunkRanges(conf, minKey, maxKeyExclusive)
      else MongoWire.splitRanges(minKey, maxKeyExclusive,
        conf.numPartitions)
    val ranges = if (parts.isEmpty) Seq((0L, 0L)) else parts
    // replica-aware: partitions spread across the eligible members
    val routes = resolvedRoutes(ranges.size)
    val rp = MongoV2.readPrefArg(conf)
    ranges.zip(routes).map { case ((lo, hi), (h, p)) =>
      MongoInputPartition(h, p, conf.db, conf.coll,
        conf.keyField, lo, hi, conf.batchSize,
        wireFilter ++ runtimeWire,
        required.fieldNames.toSeq, limit, sortDesc, conf.compressMode,
        conf.auth, conf.tls, conf.soTimeoutMs,
        conf.maxTimeMs, conf.exhaust, rp): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoReaderFactory(required)
}

/** Stream offset = the exclusive upper key bound delivered so far,
  * plus a RESUME TOKEN in the change-stream shape: an opaque string
  * returned with every batch and accepted at restart, binding the
  * checkpoint to the stream it came from (`db.coll` rides inside),
  * exactly how a real server's change-stream `resumeAfter` works —
  * a token replayed against a DIFFERENT collection is refused
  * loudly instead of silently tailing the wrong data. The plain
  * `maxKeyExclusive` field stays for pre-token checkpoints.
  */
private[v2] class MongoOffset(val maxKeyExclusive: Long,
                              ns: Option[String] = None)
    extends Offset {
  override def json: String = ns match {
    case Some(n) =>
      s"""{"maxKeyExclusive":$maxKeyExclusive,"resumeToken":""" +
        s""""${MongoOffset.token(n, maxKeyExclusive)}"}"""
    case None => s"""{"maxKeyExclusive":$maxKeyExclusive}"""
  }
}

private[v2] object MongoOffset {
  private val Magic = "graft1"

  def token(ns: String, maxKeyExclusive: Long): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      s"$Magic:$ns:$maxKeyExclusive".getBytes("UTF-8"))

  /** Decodes a token → (namespace, watermark); loud on garbage. */
  def parseToken(tok: String): (String, Long) = {
    val raw =
      try new String(java.util.Base64.getUrlDecoder.decode(tok),
        "UTF-8")
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"graft-mongo: undecodable resume token '$tok'", e) }
    raw.split(":", 3) match {
      case Array(Magic, ns, k) => (ns, k.toLong)
      case _ => throw new IllegalArgumentException(
        s"graft-mongo: malformed resume token payload '$raw'")
    }
  }
}

/** `spark.readStream.format("graft-mongo")` — TAILS a collection by
  * its monotonically-increasing key: each micro-batch reads the key
  * window `(previous offset, current max]` as ranged cursors, the
  * same partitions/readers as the batch scan. This is the key-tailing
  * approximation of a change stream: EXACTLY-ONCE for inserts whose
  * keys are insertion-monotone (ObjectId `_id`s are — their leading
  * bytes are a timestamp), because offsets are key watermarks and a
  * window is never re-read. The stated contract: a straggler insert
  * whose key lands BELOW an already-delivered watermark is missed —
  * same trade every watermark system makes; use keys the writer
  * allocates monotonically.
  *
  * `latestOffset` is one 1-row sorted find against the key index —
  * O(1) per trigger on the server, no scan. Offsets are monotone by
  * construction (`math.max` against the last), so a server rollback
  * can never re-deliver or crash the query.
  */
private[v2] class MongoMicroBatchStream(required: StructType,
                                        conf: MongoV2.Conf,
                                        wireFilter: Seq[(String, BVal)])
    extends MicroBatchStream {

  private def edge(dir: Int): Option[Long] = {
    val cur = new MongoWire.FindCursor(conf.host, conf.port, conf.db,
      conf.coll, None, Some(Seq(conf.keyField)),
      Some((conf.keyField, dir)), Some(1L), 2, auth = conf.auth,
      tls = conf.tls)
    try {
      if (!cur.hasNext) None
      else cur.next().v.collectFirst {
        case (f, BInt64(x)) if f == conf.keyField => x
        case (f, BInt32(x)) if f == conf.keyField => x.toLong
      }
    } finally cur.close()
  }

  // an INITIALLY-EMPTY collection starts the watermark at the key
  // space's floor: a 0 default would permanently skip later inserts
  // with negative keys (every window is [start, latest))
  private def ns: String = s"${conf.db}.${conf.coll}"

  private lazy val initial: MongoOffset =
    new MongoOffset(
      conf.minKey.getOrElse(edge(1).getOrElse(Long.MinValue)),
      Some(ns))

  @volatile private var lastLatest: Long = Long.MinValue

  override def initialOffset(): Offset = initial

  override def latestOffset(): Offset = {
    // the watermark is an EXCLUSIVE upper bound: a max key of
    // Long.MaxValue has no representable bound and `+ 1` would
    // overflow to Long.MinValue, pinning the watermark so rows near
    // the key-space ceiling are silently never delivered — refuse it
    // loudly instead
    val probed = edge(-1).map { k =>
      if (k == Long.MaxValue) throw new IllegalStateException(
        s"graft-mongo tail: key ${Long.MaxValue} (Long.MaxValue) in " +
          s"${conf.db}.${conf.coll} cannot be watermarked by an " +
          "exclusive upper bound; keep keys below Long.MaxValue")
      k + 1
    }.getOrElse(initial.maxKeyExclusive)
    lastLatest = math.max(lastLatest,
      math.max(probed, initial.maxKeyExclusive))
    new MongoOffset(lastLatest, Some(ns))
  }


  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[MongoOffset].maxKeyExclusive
    val hi = end.asInstanceOf[MongoOffset].maxKeyExclusive
    // overflow-safe: [Long.MinValue, hi) does not fit a Long span
    val parts = MongoWire.splitRanges(lo, hi, conf.numPartitions)
    parts.map { case (a, b) =>
      MongoInputPartition(conf.host, conf.port, conf.db, conf.coll,
        conf.keyField, a, b, conf.batchSize, wireFilter,
        required.fieldNames.toSeq, None, None,
        conf.compressMode, conf.auth, conf.tls,
        conf.soTimeoutMs, conf.maxTimeMs,
        conf.exhaust): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoReaderFactory(required)

  override def deserializeOffset(json: String): Offset = {
    val tokenForm =
      """\{"maxKeyExclusive":(-?\d+),"resumeToken":"([^"]+)"\}""".r
    val plainForm = """\{"maxKeyExclusive":(-?\d+)\}""".r
    json match {
      case tokenForm(n, tok) =>
        // the change-stream resume rule: a token is only valid on
        // the stream it came from — restarting a checkpoint against
        // a different collection is a configuration error, refused
        // loudly instead of silently tailing the wrong data
        val (tokNs, tokKey) = MongoOffset.parseToken(tok)
        require(tokNs == ns,
          s"graft-mongo: resume token belongs to '$tokNs' but this " +
            s"stream tails '$ns' — a checkpoint cannot be replayed " +
            "against a different collection")
        require(tokKey == n.toLong,
          s"graft-mongo: resume token watermark $tokKey disagrees " +
            s"with the offset's $n — corrupted checkpoint")
        new MongoOffset(tokKey, Some(ns))
      case plainForm(n) =>   // pre-token checkpoints stay readable
        new MongoOffset(n.toLong, Some(ns))
      case _ => throw new IllegalArgumentException(
        s"graft-mongo: bad offset json: $json")
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[v2] final case class MongoInputPartition(
    host: String, port: Int, db: String, coll: String,
    keyField: String, lo: Long, hi: Long, batchSize: Int,
    wireFilter: Seq[(String, BVal)], columns: Seq[String],
    limit: Option[Int], sortDesc: Option[Boolean],
    compressMode: String,
    auth: Option[graft.sources.Scram.Credential],
    tls: Option[graft.sources.Tls.Conf],
    soTimeoutMs: Int, maxTimeMs: Option[Long],
    exhaust: Boolean, readPref: Option[graft.sources.Bson.BDoc] = None)
    extends InputPartition

/** The pushed-TABLESAMPLE scan: ONE `aggregate` pipeline
  * `[$match?, $sample {size}, $project?]` on one partition (a sample
  * is small by contract — the MongoWire.sample precedent). `size` =
  * floor(fraction x matching-count + 0.5), the count taken by the
  * O(1) `count` command at plan time, scoped by the declared key
  * window. At 100 TB this is the difference between shipping the
  * collection to sample it and shipping only the sample.
  *
  * Real-server caveat (documented divergence): when the requested
  * size is below ~5% of the collection, a real server's `$sample`
  * may take its pseudo-random-cursor path, which CAN return the same
  * document more than once — so a pushed TABLESAMPLE against a real
  * deployment can emit duplicate rows, where Spark's own Bernoulli
  * sampler never would. Deduplicate downstream by key if exact
  * without-replacement semantics matter, or disable the pushdown by
  * sampling after a materializing operator. The in-process double's
  * draw is deterministic and duplicate-free (md5-keyed top-n), so
  * oracle rows are unaffected.
  */
private[v2] class MongoSampleScan(required: StructType,
                                  conf: MongoV2.Conf,
                                  wireFilter: Seq[(String, BVal)],
                                  fraction: Double)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    f"GraftMongoSampleScan ${conf.db}.${conf.coll} " +
      f"Sample: $fraction%.4f, " +
      s"Filter: [${wireFilter.map(_._1).mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // ONE member resolution for both the plan-time count and the
    // sample cursor: the count sizes the $sample against the same
    // member that will serve it (consistent under replication lag)
    val pc = MongoV2.readConf(conf)
    val eff = wireFilter ++ MongoV2.windowConjuncts(pc)
    val n = MongoWire.countDocs(pc.host, pc.port, pc.db,
      pc.coll,
      if (eff.isEmpty) None else Some(MongoWire.andDoc(eff)),
      pc.auth, pc.tls, MongoV2.readPrefArg(pc))
    val size = math.floor(fraction * n + 0.5).toLong
    val stages = Seq.newBuilder[BDoc]
    if (eff.nonEmpty)
      stages += BDoc(Seq("$match" -> MongoWire.andDoc(eff)))
    stages += BDoc(Seq("$sample" ->
      BDoc(Seq("size" -> BInt64(size)))))
    if (required.nonEmpty)
      stages += BDoc(Seq("$project" -> BDoc(
        required.fieldNames.toSeq.map(f => f -> (BInt32(1): BVal)))))
    Array(MongoSamplePartition(pc.host, pc.port, conf.db,
      conf.coll, stages.result(), conf.batchSize,
      conf.compressMode, conf.auth, conf.tls,
      conf.soTimeoutMs, conf.maxTimeMs, MongoV2.readPrefArg(pc)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoSampleReaderFactory(required)
}

private[v2] class MongoSampleReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] =
    new MongoSampleReader(p.asInstanceOf[MongoSamplePartition],
      required)
}

private[v2] final case class MongoSamplePartition(
    host: String, port: Int, db: String, coll: String,
    pipeline: Seq[BDoc], batchSize: Int, compressMode: String,
    auth: Option[graft.sources.Scram.Credential],
    tls: Option[graft.sources.Tls.Conf],
    soTimeoutMs: Int, maxTimeMs: Option[Long],
    readPref: Option[graft.sources.Bson.BDoc] = None)
  extends InputPartition

private[v2] class MongoSampleReader(p: MongoSamplePartition,
                                    required: StructType)
    extends PartitionReader[InternalRow] {

  private val cursor = new MongoWire.AggregateCursor(p.host, p.port,
    p.db, p.coll, p.pipeline, p.batchSize, p.compressMode, p.auth,
    p.tls, p.soTimeoutMs, p.maxTimeMs, p.readPref)

  private var current: InternalRow = _

  override def next(): Boolean =
    if (cursor.hasNext) {
      val doc = cursor.next()
      val m = doc.v.toMap
      val vals = required.fields.map { f =>
        m.get(f.name) match {
          case None | Some(BNull) => null
          case Some(v) => MongoV2.fieldValue(v, f)
        }
      }
      current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = cursor.close()
}

private[v2] class MongoReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MongoInputPartition]
    new MongoPartitionReader(p, required)
  }
}

/** One ranged cursor → InternalRows; the pushed filter conjuncts ride
  * in the same `find` as the range, the projection is the pruned
  * column set, sort/limit apply within the range (partial pushdown —
  * Spark re-applies the global operator).
  */
private[v2] class MongoPartitionReader(p: MongoInputPartition,
                                       required: StructType)
    extends PartitionReader[InternalRow] {

  private val cursor = new MongoWire.FindCursor(
    p.host, p.port, p.db, p.coll,
    Some(MongoWire.mergedFilter(p.keyField, p.lo, p.hi, p.wireFilter)),
    Some(p.columns),
    p.sortDesc.map(d => (p.keyField, if (d) -1 else 1)),
    p.limit.map(_.toLong), p.batchSize, p.compressMode, p.auth,
    p.tls, p.soTimeoutMs, p.maxTimeMs, p.exhaust, p.readPref)

  private var current: InternalRow = _

  override def next(): Boolean =
    if (cursor.hasNext) {
      val doc = cursor.next()
      val m = doc.v.toMap
      val vals = required.fields.map { f =>
        m.get(f.name) match {
          case None | Some(BNull) => null
          case Some(v) => MongoV2.fieldValue(v, f)
        }
      }
      current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      true
    } else false

  override def get(): InternalRow = current

  override def close(): Unit = cursor.close()
}
