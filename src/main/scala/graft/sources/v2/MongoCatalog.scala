package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Bson._
import graft.sources.MongoWire

/** A V2 `TableCatalog` over one wire-protocol database, so live
  * collections answer PLAIN SQL with the whole pushdown surface:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.m", classOf[MongoCatalog].getName)
  * spark.conf.set("spark.sql.catalog.m.host", host)
  * spark.conf.set("spark.sql.catalog.m.port", port.toString)
  * spark.conf.set("spark.sql.catalog.m.database", "graft")
  * spark.conf.set("spark.sql.catalog.m.keyfield.customer", "c_custkey")
  * spark.sql("SELECT count(*) FROM m.graft.customer WHERE ...")
  * }}}
  *
  * `listTables` is the wire `listCollections` command; `loadTable`
  * infers the schema from `$sample`d documents (the reference's
  * analyser flow, now addressable as a catalog) and hands back the
  * same [[MongoTable]] the `format("graft-mongo")` path builds, so
  * SQL gets every pushdown (columns, filters, limit, top-N, complete
  * COUNT/MIN/MAX). Each collection's range-partition key comes from
  * `keyfield.<collection>` (falling back to the catalog-level
  * `keyfield`, default `_id` — a live server's collections all carry
  * `_id`).
  *
  * READ + APPEND catalog: DDL (create/alter/drop/rename) is refused
  * loudly — the engine's catalog of record is the lake; the wire
  * catalog exposes what the server has.
  */
class MongoCatalog extends TableCatalog {

  private var catalogName: String = _
  private var options: CaseInsensitiveStringMap = _

  override def initialize(name: String,
                          opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts
  }

  override def name(): String = catalogName

  private def opt(k: String): String = {
    val v = options.get(k)
    require(v != null, s"catalog $catalogName: missing option '$k'")
    v
  }

  private def db: String = opt("database")

  // mirrors MongoV2.Conf's validation: a half-specified pair must
  // fail HERE with the clear message, not later as an opaque
  // code-13 Unauthorized from listTables on an auth-required server
  private def auth: Option[graft.sources.Scram.Credential] =
    (Option(options.get("user")), Option(options.get("password"))) match {
      case (Some(u), Some(pw)) =>
        Some(graft.sources.Scram.Credential(u, pw,
          Option(options.get("authdb")).getOrElse("admin")))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        s"catalog $catalogName: user and password options come " +
          "together (authdb optional, default 'admin')")
    }

  private def tlsConf: Option[graft.sources.Tls.Conf] =
    if (Option(options.get("tls")).exists(_.toBoolean))
      Some(graft.sources.Tls.Conf(
        Option(options.get("tlstruststore")),
        Option(options.get("tlstruststorepassword"))))
    else None

  /** The endpoint catalog-level admin commands (listCollections)
    * run against: the single configured host, or — when `host` is a
    * replica-set seed list (inline ports), or a set name / read
    * preference is declared — ONE read-eligible member under the
    * catalog's read preference, so a `readpreference=secondary`
    * catalog keeps even its metadata traffic off the primary.
    */
  private def adminHostPort: (String, Int) = {
    val seeds = graft.sources.Replica.parseSeeds(opt("host"),
      opt("port").toInt)
    val setName = Option(options.get("replicaset"))
    val mode = Option(options.get("readpreference"))
      .map(graft.sources.Replica.parseMode).getOrElse("primary")
    if (seeds.lengthCompare(1) == 0 && setName.isEmpty &&
        mode == "primary") seeds.head
    else {
      val topo = graft.sources.Replica.discover(seeds, tlsConf,
        setName)
      val m = graft.sources.Replica.selectForRead(topo, mode, 0,
        Option(options.get("readpreferencetags"))
          .map(graft.sources.Replica.parseTagSets).getOrElse(Nil))
      (m.host, m.port)
    }
  }

  private def checkNamespace(ns: Array[String]): Unit =
    require(ns.sameElements(Array(db)),
      s"catalog $catalogName serves exactly one namespace '$db', " +
        s"got ${ns.mkString(".")}")

  override def listTables(namespace: Array[String])
      : Array[Identifier] = {
    checkNamespace(namespace)
    val (ah, ap) = adminHostPort
    val reply = MongoWire.command(ah, ap,
      BDoc(Seq("listCollections" -> BInt32(1),
        "$db" -> BString(db))), auth, tlsConf)
    val cur = reply.v.collectFirst { case ("cursor", c: BDoc) => c }
      .getOrElse(throw new IllegalArgumentException(
        s"listCollections reply missing cursor: $reply"))
    val batch = cur.v.collectFirst {
      case ("firstBatch", BArr(ds)) => ds
    }.getOrElse(Seq.empty)
    batch.map {
      case d: BDoc => d.v.collectFirst {
        case ("name", BString(n)) => Identifier.of(namespace, n)
      }.getOrElse(throw new IllegalArgumentException(s"bad doc: $d"))
      case other => throw new IllegalArgumentException(
        s"bad listCollections doc: $other")
    }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    checkNamespace(ident.namespace())
    val coll = ident.name()
    val keyField = Option(options.get(s"keyfield.$coll"))
      .orElse(Option(options.get("keyfield")))
      .getOrElse("_id")
    val confMap = new util.HashMap[String, String]()
    confMap.put("host", opt("host"))
    // with a seed-list host ("h1:p1,h2:p2") the port option is
    // optional and unused — Conf evaluates it lazily
    Option(options.get("port")).foreach(confMap.put("port", _))
    confMap.put("database", db)
    confMap.put("collection", coll)
    confMap.put("keyfield", keyField)
    // EVERY table-level option the reader/writer surface understands
    // forwards — a catalog configured with e.g. writeconcernw=majority
    // must not silently write with the default concern
    Seq("numpartitions", "batchsize", "samplesize", "user",
        "password", "authdb", "tls", "tlstruststore",
        "tlstruststorepassword", "tlshandshaketimeoutms",
        "tlskeystore", "tlskeystorepassword", "authmechanism",
        "tlsminprotocol", "writeconcernw", "writeconcernj",
        "retrywrites", "varianttype", "compress", "sockettimeoutms",
        "maxtimems", "readpreference", "replicaset",
        "readpreferencetags", "exhaust",
        "chunkaligned").foreach { k =>
      Option(options.get(k)).foreach(confMap.put(k, _))
    }
    val conf = MongoV2.Conf(new CaseInsensitiveStringMap(confMap))
    val schema = MongoV2.inferSchema(conf)
    // LOUD at plan time: on a real server the '_id' default is an
    // ObjectId (inferred string), and a non-integral key would make
    // every ranged scan silently empty (keySpan probes by key type)
    schema.fields.find(_.name == keyField) match {
      case Some(f) if f.dataType == org.apache.spark.sql.types
            .LongType || f.dataType == org.apache.spark.sql.types
            .IntegerType => ()
      case Some(f) => throw new IllegalArgumentException(
        s"catalog $catalogName: keyfield '$keyField' of collection " +
          s"'$coll' inferred as ${f.dataType.simpleString}; ranged " +
          "scans need an int/long key — set the " +
          s"keyfield.$coll catalog option to an integral field")
      case None => throw new IllegalArgumentException(
        s"catalog $catalogName: keyfield '$keyField' is absent from " +
          s"sampled documents of '$coll' — set the keyfield.$coll " +
          "catalog option to an always-present integral field")
    }
    new MongoTable(schema, conf)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : Table =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is read+append over a live server; " +
        "collections are created by the server's owner, not DDL here")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"catalog $catalogName does not alter live collections")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"catalog $catalogName does not drop live collections")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"catalog $catalogName does not rename live collections")
}
