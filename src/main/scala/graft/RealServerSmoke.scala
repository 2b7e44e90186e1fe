package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Bson, MongoWire, Scram, Tls}
import graft.sources.Bson._

/** One-command smoke check against a REAL mongod — the day a server
  * is reachable, this converts the sandbox's environmental gap (no
  * mongod binary; every `mongo_*` oracle row runs against the
  * in-process protocol double) into a direct check of the same
  * claims. SKIPPED BY DEFAULT: exits 0 with a SKIP line unless
  * `MONGO_HOST`/`MONGO_PORT` are set.
  *
  * {{{
  * MONGO_HOST=... MONGO_PORT=27017 [MONGO_USER=.. MONGO_PASSWORD=..
  *   MONGO_AUTHDB=admin] [MONGO_DB=graft_smoke] [MONGO_TLS=true
  *   MONGO_TLS_TRUSTSTORE=/path/trust.p12
  *   MONGO_TLS_TRUSTSTORE_PASSWORD=..] \
  *   sbt "runMain graft.RealServerSmoke"
  * }}}
  *
  * What it drives (writes only to `MONGO_DB.graft_smoke`, dropped
  * first and after): hello + compressor negotiation; the V2 writer
  * (kind-1 insert sections); the ranged cursor scan; filter/
  * projection pushdown; complete COUNT/MIN/MAX; partial GROUP BY
  * with long and decimal SUM partials; TABLESAMPLE count contract
  * ($sample is genuinely random on a real server — content is NOT
  * checked, by design); newest-N; listCollections/collStats;
  * variant-column inference over a deliberately mixed-typed field;
  * replica discovery + a read-preference-routed seed-list scan when
  * `MONGO_SEEDS` is set (optional `MONGO_REPLICASET`,
  * `MONGO_READPREF`, `MONGO_READPREF_TAGS`); a chunk-aligned scan
  * from the real `config.chunks` map when `MONGO_SHARDED=true`
  * against a mongos (shards the smoke collection first);
  * SCRAM auth when credentials are given; TLS when `MONGO_TLS=true`
  * (managed deployments require it — point
  * `MONGO_TLS_TRUSTSTORE[_PASSWORD]` at a PKCS12 holding the
  * server's CA, or omit for the JVM default trust). Each check
  * prints PASS/FAIL; any FAIL exits nonzero.
  */
object RealServerSmoke {

  private var failures = 0

  private def check(name: String)(body: => Boolean): Unit = {
    val ok =
      try body
      catch {
        case e: Exception =>
          println(s"FAIL $name: ${e.getMessage}")
          failures += 1
          return
      }
    if (ok) println(s"PASS $name")
    else { println(s"FAIL $name"); failures += 1 }
  }

  def main(args: Array[String]): Unit = {
    val host = sys.env.get("MONGO_HOST")
    val port = sys.env.get("MONGO_PORT").map(_.toInt)
    if (host.isEmpty || port.isEmpty) {
      println("SKIP real-server smoke: set MONGO_HOST and MONGO_PORT " +
        "(optional MONGO_USER/MONGO_PASSWORD/MONGO_AUTHDB, MONGO_DB)")
      return
    }
    val (h, p) = (host.get, port.get)
    val db = sys.env.getOrElse("MONGO_DB", "graft_smoke")
    val coll = "graft_smoke"
    val auth = (sys.env.get("MONGO_USER"),
      sys.env.get("MONGO_PASSWORD")) match {
      case (Some(u), Some(pw)) => Some(Scram.Credential(u, pw,
        sys.env.getOrElse("MONGO_AUTHDB", "admin")))
      case _ => None
    }
    val tls =
      if (sys.env.get("MONGO_TLS").exists(_.toBoolean))
        Some(Tls.Conf(sys.env.get("MONGO_TLS_TRUSTSTORE"),
          sys.env.get("MONGO_TLS_TRUSTSTORE_PASSWORD"),
          // mTLS client identity: a PKCS12 with the client cert +
          // key; with MONGO_X509=true the smoke also authenticates
          // as the certificate subject (MONGODB-X509)
          keyStorePath = sys.env.get("MONGO_TLS_KEYSTORE"),
          keyStorePassword =
            sys.env.get("MONGO_TLS_KEYSTORE_PASSWORD")))
      else None
    val spark = SparkSession.builder()
      .appName("graft-real-server-smoke").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      check("hello handshake") {
        val r = MongoWire.hello(h, p, tls = tls)
        r.v.exists(_._1 == "ok")
      }
      val negotiated = MongoWire.negotiate(h, p, tls = tls)
      println("INFO server negotiates compressor: " +
        negotiated.map(MongoWire.WireCompress.nameOf)
          .getOrElse("none"))

      def drop(c: String = coll): Unit =
        try MongoWire.command(h, p, BDoc(Seq(
          "drop" -> BString(c), "$db" -> BString(db))), auth, tls)
        catch { case _: Exception => () }   // ns-not-found is fine
      drop()

      val n = 1000
      val df = (0 until n).map(i => (i.toLong, s"name$i", i % 7,
          BigDecimal(i * 3 + 1).setScale(2) / 4))
        .toDF("k", "name", "grp", "amt")
        .withColumn("amt", col("amt").cast(
          org.apache.spark.sql.types.DecimalType(12, 2)))

      check("V2 writer (kind-1 insert sections)") {
        var w = df.repartition(2).write.format("graft-mongo")
          .mode("append")
          .option("host", h).option("port", p.toString)
          .option("database", db).option("collection", coll)
          .option("keyfield", "k")
        auth.foreach { c =>
          w = w.option("user", c.user).option("password", c.password)
            .option("authdb", c.authDb)
        }
        tls.foreach { t =>
          w = w.option("tls", "true")
          t.trustStorePath.foreach(x =>
            w = w.option("tlstruststore", x))
          t.trustStorePassword.foreach(x =>
            w = w.option("tlstruststorepassword", x))
        }
        w.save()
        true
      }

      def read0 = {
        var r = spark.read.format("graft-mongo").schema(df.schema)
          .option("host", h).option("port", p.toString)
          .option("database", db).option("collection", coll)
          .option("keyfield", "k").option("numpartitions", "4")
        auth.foreach { c =>
          r = r.option("user", c.user).option("password", c.password)
            .option("authdb", c.authDb)
        }
        tls.foreach { t =>
          r = r.option("tls", "true")
          t.trustStorePath.foreach(x =>
            r = r.option("tlstruststore", x))
          t.trustStorePassword.foreach(x =>
            r = r.option("tlstruststorepassword", x))
        }
        r.load()
      }

      check("ranged cursor scan")(read0.count() == n.toLong)
      check("filter + projection pushdown") {
        read0.filter(col("k") >= 500L && col("grp") === 3)
          .select("k", "name").count() ==
          (500 until n).count(_ % 7 == 3).toLong
      }
      check("complete COUNT/MIN/MAX pushdown") {
        val r = read0.agg(count(lit(1)), min(col("k")), max(col("k")))
          .head()
        (r.getLong(0), r.getLong(1), r.getLong(2)) ==
          ((n.toLong, 0L, (n - 1).toLong))
      }
      check("partial GROUP BY pushdown (long + decimal SUM)") {
        val got = read0.groupBy(col("grp"))
          .agg(count(lit(1)).as("c"), sum(col("k")).as("sk"),
            sum(col("amt")).as("sa"))
          .collect().map(r => (r.getInt(0), r.getLong(1),
            r.getLong(2), r.getDecimal(3))).sortBy(_._1).toSeq
        val want = df.groupBy(col("grp"))
          .agg(count(lit(1)).as("c"), sum(col("k")).as("sk"),
            sum(col("amt")).as("sa"))
          .collect().map(r => (r.getInt(0), r.getLong(1),
            r.getLong(2), r.getDecimal(3))).sortBy(_._1).toSeq
        got == want
      }
      check("TABLESAMPLE count contract (content is random on a " +
          "real server)") {
        val c = read0.sample(withReplacement = false, fraction = 0.2,
          seed = 42L).count()
        c == math.floor(0.2 * n + 0.5).toLong
      }
      check("newest-N wire sort+limit") {
        MongoWire.newest(spark, h, p, db, coll, df.schema, "k", 5,
          auth = auth, tls = tls).collect().map(_.getLong(0)).sorted.toSeq ==
          Seq(995L, 996L, 997L, 998L, 999L)
      }
      check("listCollections contains the smoke collection") {
        MongoWire.listCollectionNames(h, p, db, auth, tls)
          .contains(coll)
      }
      check("collStats count agrees with count") {
        val (c, _, _) = MongoWire.collStats(h, p, db, coll, auth, tls)
        c == MongoWire.countDocs(h, p, db, coll, auth = auth,
          tls = tls)
      }
      // Replica set (opt-in: MONGO_SEEDS="h1:p1,h2:p2[,...]"; the
      // smoke host must be a member): discovery from the seed list,
      // then a full scan routed by MONGO_READPREF (default
      // secondaryPreferred — works on any healthy set) with the
      // optional MONGO_REPLICASET name pinned and
      // MONGO_READPREF_TAGS tag sets applied. Count equality proves
      // the routed scan is content-transparent; WHERE it routed is
      // only observable on the double (per-member stats), so the
      // real-server claim here is "discovery + selection + the
      // $readPreference field are accepted end to end".
      sys.env.get("MONGO_SEEDS").foreach { seeds =>
        check("replica discovery from the seed list") {
          val topo = graft.sources.Replica.discover(
            graft.sources.Replica.parseSeeds(seeds, p),
            tls, sys.env.get("MONGO_REPLICASET"))
          println(s"INFO replica set " +
            s"${topo.setName.getOrElse("?")}: primary=" +
            s"${topo.primary.map(_.address).getOrElse("none")} " +
            s"secondaries=${topo.secondaries.map(_.address)
              .mkString(",")}")
          topo.members.nonEmpty
        }
        check("seed-list scan routed by read preference") {
          var r = spark.read.format("graft-mongo").schema(df.schema)
            .option("host", seeds)
            .option("database", db).option("collection", coll)
            .option("keyfield", "k").option("numpartitions", "4")
            .option("readpreference",
              sys.env.getOrElse("MONGO_READPREF", "secondaryPreferred"))
          sys.env.get("MONGO_REPLICASET").foreach(x =>
            r = r.option("replicaset", x))
          sys.env.get("MONGO_READPREF_TAGS").foreach(x =>
            r = r.option("readpreferencetags", x))
          auth.foreach { c =>
            r = r.option("user", c.user).option("password", c.password)
              .option("authdb", c.authDb)
          }
          tls.foreach { t =>
            r = r.option("tls", "true")
            t.trustStorePath.foreach(x =>
              r = r.option("tlstruststore", x))
            t.trustStorePassword.foreach(x =>
              r = r.option("tlstruststorepassword", x))
          }
          r.load().count() == n.toLong
        }
      }
      // Sharded cluster (opt-in: MONGO_SHARDED=true; the target must
      // be a mongos): shard the smoke collection on its key, then a
      // chunk-aligned scan plans from the REAL config.chunks map —
      // count equality proves the chunk tiling is complete against a
      // real cluster's catalog (MinKey/MaxKey endpoints included).
      if (sys.env.get("MONGO_SHARDED").exists(_.toBoolean)) {
        check("chunk-aligned scan from the real config.chunks map") {
          val hello = MongoWire.hello(h, p, tls = tls)
          require(hello.v.contains(("msg", BString("isdbgrid"))),
            "MONGO_SHARDED needs a mongos target (hello lacks " +
              "msg=isdbgrid)")
          def admin(cmd: (String, BVal)*): Unit =
            MongoWire.command(h, p, BDoc(cmd.toSeq :+
              ("$db" -> (BString("admin"): BVal))), auth, tls)
          try admin("enableSharding" -> BString(db))
          catch { case _: Exception => () }   // already enabled
          admin("shardCollection" -> BString(s"$db.$coll"),
            "key" -> BDoc(Seq("k" -> BInt32(1))))
          var r = spark.read.format("graft-mongo").schema(df.schema)
            .option("host", h).option("port", p.toString)
            .option("database", db).option("collection", coll)
            .option("keyfield", "k")
            .option("minkey", "0").option("maxkey", n.toString)
            .option("chunkaligned", "true")
          auth.foreach { c =>
            r = r.option("user", c.user).option("password", c.password)
              .option("authdb", c.authDb)
          }
          tls.foreach { t =>
            r = r.option("tls", "true")
            t.trustStorePath.foreach(x =>
              r = r.option("tlstruststore", x))
            t.trustStorePassword.foreach(x =>
              r = r.option("tlstruststorepassword", x))
          }
          r.load().count() == n.toLong
        }
      }
      // MONGODB-X509 (opt-in: MONGO_X509=true + a client key store):
      // authenticates as the client certificate's subject against
      // $external and scans — the managed-deployment cert-auth path
      if (sys.env.get("MONGO_X509").exists(_.toBoolean))
        check("MONGODB-X509 certificate auth + scan") {
          val t = tls.getOrElse(throw new IllegalArgumentException(
            "MONGO_X509 needs MONGO_TLS=true"))
          require(t.keyStorePath.isDefined,
            "MONGO_X509 needs MONGO_TLS_KEYSTORE")
          val sock = MongoWire.openSocket(h, p, Some(t))
          try {
            Scram.authenticate(sock,
              Scram.x509Credential(sys.env.get("MONGO_X509_USER")))
            MongoWire.runCommandOk(sock, BDoc(Seq(
              "count" -> BString(coll), "$db" -> BString(db))), 30)
            true
          } finally sock.close()
        }
      check("variant-column inference over a mixed-typed field") {
        val mixedColl = coll + "_mixed"
        drop(mixedColl)
        val sock = MongoWire.openSocket(h, p, tls)
        try {
          auth.foreach(Scram.authenticate(sock, _))
          val docs = (0 until 64).map { i =>
            val v: BVal = i % 3 match {
              case 0 => BInt32(i)
              case 1 => BString(s"s$i")
              case _ => BBool(i % 2 == 0)
            }
            BDoc(Seq("k" -> BInt64(i.toLong), "payload" -> v))
          }
          MongoWire.insertBatch(sock, db, mixedColl, docs, 7)
        } finally sock.close()
        var r = spark.read.format("graft-mongo")
          .option("host", h).option("port", p.toString)
          .option("database", db).option("collection", mixedColl)
          .option("keyfield", "k").option("samplesize", "64")
        auth.foreach { c =>
          r = r.option("user", c.user).option("password", c.password)
            .option("authdb", c.authDb)
        }
        tls.foreach { t =>
          r = r.option("tls", "true")
          t.trustStorePath.foreach(x =>
            r = r.option("tlstruststore", x))
          t.trustStorePassword.foreach(x =>
            r = r.option("tlstruststorepassword", x))
        }
        val inferred = r.load()
        val f = inferred.schema("payload")
        val ok = Bson.isVariantField(f) &&
          inferred.count() == 64L
        drop(mixedColl)
        ok
      }

      drop()
      if (failures > 0) {
        println(s"$failures check(s) FAILED")
        sys.exit(1)
      }
      println("real-server smoke: all checks passed")
    } finally spark.stop()
  }
}
