package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bson, InProcessMongod, MongoWire}
import graft.sources.Bson._

/** The wire-protocol command surface beyond the ranged scan (filters,
  * projection, sort+limit, insert, admin commands) and the DSv2
  * connector's pushdowns — each pushdown proven BOTH by plan state
  * (the scan's description) and by the server's served-work meters
  * (fewer documents / bytes actually crossed the socket).
  */
class MongoV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i =>
        (i, s"name$i", (i % 25).toInt, i * 1.5 + 0.25, i % 3 == 0))
      .toDF("k", "name", "grp", "bal", "flag")
  }

  private def dsv2(srv: InProcessMongod, schema: Option[StructType],
                   extra: (String, String)*): DataFrame = {
    var r = spark.read.format("graft-mongo")
      .option("host", "127.0.0.1").option("port", srv.port.toString)
      .option("database", "db").option("collection", "c")
      .option("keyfield", "k")
    schema.foreach(s => r = r.schema(s))
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def scanDescription(df: DataFrame): String = {
    // aggregates bring exchanges, which wrap the plan in AQE
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(fail(s"no BatchScanExec in plan: $plan"))
  }

  test("byte-level projectRaw and extractRaw agree with full decode " +
      "on every supported type, and never re-encode spliced values") {
    val doc = BDoc(Seq(
      "d" -> BDouble(-0.125), "s" -> BString("héllo ✓"),
      "sub" -> BDoc(Seq("x" -> BInt32(7), "y" -> BString("z"))),
      "arr" -> BArr(Seq(BInt64(1L), BNull, BBool(true))),
      "bin" -> BBinary(4, Array[Byte](1, 2, 3)),
      "oid" -> BObjectId(Array.tabulate(12)(_.toByte)),
      "b" -> BBool(false), "dt" -> BDateTime(1704067200123L),
      "n" -> BNull, "i" -> BInt32(Int.MinValue),
      "l" -> BInt64(Long.MaxValue)))
    val bytes = Bson.encode(doc)
    // projection = decode-then-filter, for every 2-subset
    val names = doc.v.map(_._1)
    for (a <- names; b <- names if a != b) {
      val spliced = Bson.decode(Bson.projectRaw(bytes, Set(a, b)))
      val expected = BDoc(doc.v.filter(kv => kv._1 == a || kv._1 == b))
      assert(spliced.v.map(_._1) == expected.v.map(_._1))
    }
    // extraction = decode field lookup; absent = None
    assert(Bson.extractRaw(bytes, "i").contains(BInt32(Int.MinValue)))
    assert(Bson.extractRaw(bytes, "dt")
      .contains(BDateTime(1704067200123L)))
    assert(Bson.extractRaw(bytes, "nope").isEmpty)
    // the spliced projection is a byte-range copy: the original
    // element bytes appear verbatim inside the projected frame
    val proj = Bson.projectRaw(bytes, Set("s"))
    val needle = Bson.encode(BDoc(Seq("s" -> BString("héllo ✓"))))
    assert(proj.toSeq == needle.toSeq)
  }

  test("wire filter semantics match the public operator contract: " +
      "$ne matches missing, $ne null means exists-and-not-null, " +
      "$eq null matches missing-or-null, cross-type ranges never " +
      "match, $in is any-of") {
    // hand-built docs so 'x' can be genuinely MISSING (not null)
    val docs = IndexedSeq(
      (0L, Bson.encode(BDoc(Seq("k" -> BInt64(0L), "x" -> BInt32(5))))),
      (1L, Bson.encode(BDoc(Seq("k" -> BInt64(1L), "x" -> BNull)))),
      (2L, Bson.encode(BDoc(Seq("k" -> BInt64(2L))))),
      (3L, Bson.encode(BDoc(Seq("k" -> BInt64(3L),
        "x" -> BString("5"))))))
    val srv = new InProcessMongod(docs, "k", "db", "c")
    try {
      def ks(filter: BDoc): Seq[Long] = {
        val cur = new MongoWire.FindCursor("127.0.0.1", srv.port,
          "db", "c", Some(filter), None, None, None, 10)
        try cur.map(d => d.v.collectFirst {
          case ("k", BInt64(x)) => x
        }.get).toList
        finally cur.close()
      }
      def f(op: String, v: BVal): BDoc =
        BDoc(Seq("x" -> BDoc(Seq(op -> v))))
      assert(ks(f("$eq", BInt32(5))) == Seq(0L))
      assert(ks(f("$eq", BNull)) == Seq(1L, 2L))       // null or missing
      assert(ks(f("$ne", BInt32(5))) == Seq(1L, 2L, 3L)) // missing matches
      assert(ks(f("$ne", BNull)) == Seq(0L, 3L))       // exists, not null
      assert(ks(f("$gt", BInt32(4))) == Seq(0L))       // "5" is bracketed out
      assert(ks(f("$gte", BString("5"))) == Seq(3L))   // 5 is bracketed out
      assert(ks(f("$in", BArr(Seq(BInt32(5), BString("5"))))) ==
        Seq(0L, 3L))
      // conjunction across fields, with the key window pruning
      assert(ks(BDoc(Seq(
        "k" -> BDoc(Seq("$gte" -> BInt64(1L), "$lt" -> BInt64(3L))),
        "x" -> BDoc(Seq("$eq" -> BNull))))) == Seq(1L, 2L))
      // unknown operator is a loud error, never a silent true
      intercept[Exception](ks(f("$regex", BString(".*"))))
    } finally srv.close()
  }

  test("sort desc + limit over the wire is the newest-N scan, and " +
      "MongoWire.newest returns exactly orderBy-desc-limit") {
    val df = fixtureDf(500)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val got = MongoWire.newest(spark, "127.0.0.1", srv.port, "db",
        "c", df.schema, "k", 17, batchSize = 5)
      val a = got.collect().map(_.getLong(0)).toSeq
      assert(a == (499L to 483L by -1L))
      // limit larger than the data is the full reversed scan
      assert(MongoWire.newest(spark, "127.0.0.1", srv.port, "db", "c",
        df.schema, "k", 1000).count() == 500)
    } finally srv.close()
  }

  test("write path: per-partition insert batches are acknowledged, " +
      "round-trip equals the source, int keys accepted") {
    val df = fixtureDf(300).repartition(3)
    val srv = InProcessMongod.serveEmpty("db", "out", "k")
    try {
      val acked = MongoWire.write(df, "127.0.0.1", srv.port, "db",
        "out", batchSize = 64)
      assert(acked == 300L)
      val back = MongoWire.read(spark, "127.0.0.1", srv.port, "db",
        "out", df.schema, "k", 0L, 300L, numPartitions = 3)
      assert(back.count() == 300)
      val a = back.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      val b = df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
      // inserting into an undeclared collection is a loud error
      intercept[Exception](MongoWire.write(df, "127.0.0.1", srv.port,
        "db", "nope"))
    } finally srv.close()
  }

  test("cursor snapshot isolation: a cursor opened before an insert " +
      "pages over the pre-insert store and never sees new documents") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "name")
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val cur = new MongoWire.FindCursor("127.0.0.1", srv.port, "db",
        "c", None, None, None, None, 10)
      val first = cur.take(10).map(d => d.v.collectFirst {
        case ("k", BInt64(x)) => x }.get).toList
      // splice 50 new docs into the middle of the key space
      MongoWire.write((1000L until 1050L).map(i => (i, s"new$i"))
        .toDF("k", "name"), "127.0.0.1", srv.port, "db", "c")
      val rest = cur.map(d => d.v.collectFirst {
        case ("k", BInt64(x)) => x }.get).toList
      assert((first ++ rest) == (0L until 100L).toList)
      // a NEW cursor sees the post-insert store
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "c") ==
        150L)
    } finally srv.close()
  }

  test("admin commands: listCollections, count with a query, " +
      "collStats, and the cross-checked adminProbe") {
    val a = fixtureDf(120)
    val b = fixtureDf(45)
    val srv = InProcessMongod.serveAll("db",
      Seq(("alpha", "k", a), ("beta", "k", b)))
    try {
      assert(MongoWire.listCollections(spark, "127.0.0.1", srv.port,
        "db").collect().map(_.getString(0)).toSeq ==
        Seq("alpha", "beta"))
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db",
        "alpha") == 120L)
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "beta",
        Some(BDoc(Seq("grp" -> BDoc(Seq("$lt" -> BInt32(5))))))) ==
        b.filter(col("grp") < 5).count())
      val (n, size, avg) = MongoWire.collStats("127.0.0.1", srv.port,
        "db", "alpha")
      assert(n == 120L && size > 0L &&
        math.abs(avg - size.toDouble / 120) < 1e-9)
      val probe = MongoWire.adminProbe(spark, "127.0.0.1", srv.port,
        "db").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(probe == Seq(("alpha", 120L), ("beta", 45L)))
    } finally srv.close()
  }

  test("DSv2 full scan: format(\"graft-mongo\") equals the served " +
      "table, one input partition per key range") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val got = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400", "numpartitions" -> "5",
        "batchsize" -> "32")
      assert(got.rdd.getNumPartitions == 5)
      val x = got.collect().map(_.getLong(0)).sorted.toSeq
      assert(x == (0L until 400L).toSeq)
      // omitted minkey/maxkey: probed with two 1-row sorted finds
      val probed = dsv2(srv, Some(df.schema), "numpartitions" -> "3")
      assert(probed.count() == 400)
    } finally srv.close()
  }

  test("DSv2 filter pushdown: the scan description carries the " +
      "filters, the server ships only matching documents, results " +
      "equal the unpushed plan") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400")
      val q = base.filter(col("grp") === 3 && col("bal") > 100.0)
      val desc = scanDescription(q)
      assert(desc.contains("GraftMongoScan"))
      assert(desc.contains("grp") && desc.contains("bal"),
        s"filters missing from scan description: $desc")
      val before = srv.stats.servedDocs.get()
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      val served = srv.stats.servedDocs.get() - before
      val expect = df.filter(col("grp") === 3 && col("bal") > 100.0)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect)
      assert(served == expect.size.toLong,
        s"server shipped $served docs for ${expect.size} matches — " +
          "the filter did not reach the server")
    } finally srv.close()
  }

  test("DSv2 column pruning: the projection reaches the server and " +
      "fewer bytes cross the socket") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def bytesFor(q: DataFrame): Long = {
        val before = srv.stats.servedBytes.get()
        q.collect()
        srv.stats.servedBytes.get() - before
      }
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400")
      val full = bytesFor(base)
      val pruned = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400").select("k", "grp")
      assert(scanDescription(pruned).contains("ReadColumns: [k, grp]"))
      val narrow = bytesFor(pruned)
      assert(narrow < full / 2,
        s"projection did not shrink the wire: $narrow vs $full")
      assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 400L).toSeq)
    } finally srv.close()
  }

  test("DSv2 limit and top-N pushdown: each partition ships at most " +
      "the limit, Spark keeps the global operator, order is exact") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400", "numpartitions" -> "4")
      // plain limit: ≤ limit docs per partition leave the server
      val lim = base.limit(5)
      assert(scanDescription(lim).contains("PushedLimit: 5"))
      val before = srv.stats.servedDocs.get()
      assert(lim.collect().length == 5)
      assert(srv.stats.servedDocs.get() - before <= 20L) // 4 parts × 5
      // top-N on the key: pushed as sort+limit, globally re-sorted
      val top = base.orderBy(col("k").desc).limit(7)
      val d = scanDescription(top)
      assert(d.contains("PushedSort: k DESC") &&
        d.contains("PushedLimit: 7"), d)
      assert(top.collect().map(_.getLong(0)).toSeq ==
        (399L to 393L by -1L))
      // top-N on a NON-key column must NOT push: order would be wrong
      val nk = base.orderBy(col("bal").desc).limit(3)
      assert(!scanDescription(nk).contains("PushedSort"))
      assert(nk.collect().map(_.getLong(0)).toSeq ==
        Seq(399L, 398L, 397L))
    } finally srv.close()
  }

  test("DSv2 string ranges are NOT pushed (UTF-8 vs UTF-16 order) " +
      "but string equality is, and unpushed filters still apply") {
    val df = fixtureDf(100)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "100")
      val eq = base.filter(col("name") === "name42")
      assert(scanDescription(eq).contains("name"),
        scanDescription(eq))
      assert(eq.collect().map(_.getLong(0)).toSeq == Seq(42L))
      val range = base.filter(col("name") > "name95")
      // pushed set must not contain the range (IsNotNull may push)
      assert(!scanDescription(range).contains("GreaterThan(name"),
        scanDescription(range))
      assert(range.collect().map(_.getLong(0)).sorted.toSeq ==
        df.filter(col("name") > "name95").collect()
          .map(_.getLong(0)).sorted.toSeq)
    } finally srv.close()
  }

  test("aggregate pipeline over the wire: $match + $sort + $skip + " +
      "$limit + $project compose like the find surface, $count is " +
      "the count command, unknown stages are loud errors") {
    val df = fixtureDf(300)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def agg(stages: BDoc*): Seq[BDoc] = {
        val cur = new MongoWire.AggregateCursor("127.0.0.1", srv.port,
          "db", "c", stages, 16)
        try cur.toList finally cur.close()
      }
      val got = agg(
        BDoc(Seq("$match" -> BDoc(Seq("grp" ->
          BDoc(Seq("$lt" -> BInt32(5))))))),
        BDoc(Seq("$sort" -> BDoc(Seq("k" -> BInt32(-1))))),
        BDoc(Seq("$skip" -> BInt32(2))),
        BDoc(Seq("$limit" -> BInt32(10))),
        BDoc(Seq("$project" -> BDoc(Seq("k" -> BInt32(1))))))
      val expect = df.filter(col("grp") < 5)
        .orderBy(col("k").desc).collect().map(_.getLong(0))
        .drop(2).take(10).toSeq
      assert(got.map(d => d.v.collectFirst {
        case ("k", BInt64(x)) => x }.get) == expect)
      // projection really dropped the other fields
      assert(got.forall(_.v.map(_._1) == Seq("k")))
      // $count after $match
      val n = agg(
        BDoc(Seq("$match" -> BDoc(Seq("flag" -> BBool(true))))),
        BDoc(Seq("$count" -> BString("total"))))
      assert(n == Seq(BDoc(Seq("total" ->
        BInt32(df.filter(col("flag")).count().toInt)))))
      intercept[Exception](agg(BDoc(Seq("$unwind" -> BString("x")))))
    } finally srv.close()
  }

  test("$sample is the documented deterministic md5-ordered draw " +
      "(oracle-replayable), caps at the collection size, and " +
      "composes with $count") {
    val df = fixtureDf(200)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def sample(n: Int): Seq[Long] = {
        val cur = new MongoWire.AggregateCursor("127.0.0.1", srv.port,
          "db", "c", Seq(BDoc(Seq("$sample" ->
            BDoc(Seq("size" -> BInt32(n)))))), 64)
        try cur.map(_.v.collectFirst {
          case ("k", BInt64(x)) => x }.get).toList
        finally cur.close()
      }
      // the contract: first n keys ordered by md5("<coll>:<key>")
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(k: Long): String = {
        md.reset()
        md.digest(s"c:$k".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      }
      val expect = (0L until 200L).sortBy(h).take(30)
      assert(sample(30) == expect)
      // repeatable, and a bigger ask returns everything
      assert(sample(30) == expect)
      assert(sample(1000).sorted == (0L until 200L))
      // MongoWire.sample returns the same rows as a DataFrame
      val viaDf = MongoWire.sample(spark, "127.0.0.1", srv.port,
        "db", "c", df.schema, 30).collect().map(_.getLong(0)).toSeq
      assert(viaDf == expect)
    } finally srv.close()
  }

  test("DSv2 aggregate pushdown: COUNT(*)/MIN(key)/MAX(key) become " +
      "wire commands (no scan), a pushed filter rides the count, " +
      "residual filters and GROUP BY refuse the pushdown") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400")
      // plain: one row computed by commands, zero cursor docs served
      val before = srv.stats.servedDocs.get()
      val q = base.agg(count(lit(1)).as("n"),
        min(col("k")).as("lo"), max(col("k")).as("hi"))
      assert(scanDescription(q).contains("GraftMongoAggScan"))
      val r = q.collect().head
      assert(r.getLong(0) == 400L && r.getLong(1) == 0L &&
        r.getLong(2) == 399L)
      // only the two 1-row min/max edge finds crossed the wire
      assert(srv.stats.servedDocs.get() - before <= 2L)
      // a fully-pushed filter rides the count command's query
      val fq = base.filter(col("grp") === 3)
        .agg(count(lit(1)).as("n"))
      assert(scanDescription(fq).contains("GraftMongoAggScan"))
      assert(fq.collect().head.getLong(0) ==
        df.filter(col("grp") === 3).count())
      // residual (string-range) filter: aggregate must NOT push
      val rq = base.filter(col("name") > "name95")
        .agg(count(lit(1)).as("n"))
      assert(!scanDescription(rq).contains("GraftMongoAggScan"))
      assert(rq.collect().head.getLong(0) ==
        df.filter(col("name") > "name95").count())
      // GROUP BY: not pushable, the plain scan feeds Spark's agg
      val gq = base.groupBy(col("grp")).count()
      assert(!scanDescription(gq).contains("GraftMongoAggScan"))
      assert(gq.collect().map(r => (r.getInt(0), r.getLong(1)))
        .toMap == df.groupBy(col("grp")).count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap)
      // MIN on a NON-key column: not pushable, still correct
      val nq = base.agg(min(col("bal")).as("m"))
      assert(!scanDescription(nq).contains("GraftMongoAggScan"))
      assert(nq.collect().head.getDouble(0) == 0.25)
    } finally srv.close()
  }

  test("streaming tail: readStream delivers each key window exactly " +
      "once across insert waves; a straggler below the watermark is " +
      "missed by the stated contract") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType)))
    val srv = InProcessMongod.serveEmpty("db", "tail", "k")
    try {
      val stream = spark.readStream.format("graft-mongo")
        .schema(schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "tail")
        .option("keyfield", "k").option("numpartitions", "2")
        .load()
      val q = stream.writeStream.format("memory")
        .queryName("mongo_tail_spec").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(100))
        .start()
      try {
        def wave(lo: Long, hi: Long): Unit = {
          MongoWire.write((lo until hi).map(i => (i, s"v$i"))
            .toDF("k", "name"), "127.0.0.1", srv.port, "db", "tail")
          q.processAllAvailable()
        }
        wave(0L, 50L)
        val t1 = spark.table("mongo_tail_spec").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(t1 == (0L until 50L))
        wave(100L, 130L)
        val t2 = spark.table("mongo_tail_spec").collect()
          .map(_.getLong(0)).sorted.toSeq
        // exactly once: no re-delivery of wave 1, no dup, no gap
        assert(t2 == ((0L until 50L) ++ (100L until 130L)))
        // straggler: key 60 is BELOW the delivered watermark (130)
        wave(60L, 61L)
        val t3 = spark.table("mongo_tail_spec").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(t3 == t2, "a below-watermark insert must be missed " +
          "by the stated key-tailing contract")
        // but a fresh key above the watermark still arrives
        wave(200L, 201L)
        val t4 = spark.table("mongo_tail_spec").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(t4 == (t2 :+ 200L))
      } finally q.stop()
    } finally srv.close()
  }

  test("GROUP BY decimal SUM pushdown: exact partial sums ride as " +
      "decimal128 and merge exactly; precision beyond the widened " +
      "decimal128 bound refuses to push") {
    import spark.implicits._
    val df = (0L until 400L).map(i =>
        (i, (i % 5).toInt, BigDecimal(i).setScale(2) / 8))
      .toDF("k", "g", "amt")
      .withColumn("amt", col("amt").cast(DecimalType(12, 2)))
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400", "numpartitions" -> "4")
      val q = base.groupBy(col("g")).agg(sum(col("amt")).as("s"))
      assert(scanDescription(q).contains("GraftMongoGroupScan"),
        scanDescription(q))
      val got = q.collect().map(r => (r.getInt(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      val expect = df.groupBy(col("g")).agg(sum(col("amt")).as("s"))
        .collect().map(r => (r.getInt(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      assert(got == expect)
    } finally srv.close()
    // a column whose +10 widening exceeds decimal128's 34 digits
    // cannot carry exact partials: refuse AT THE SOURCE SCHEMA
    // (decimal(30,2) + 10 = 40 > 34), stay in Spark
    val wdf = (0L until 100L).map(i =>
        (i, (i % 5).toInt, BigDecimal(i).setScale(2)))
      .toDF("k", "g", "amt")
      .withColumn("amt", col("amt").cast(DecimalType(30, 2)))
    val wsrv = InProcessMongod.serve(wdf, "k", "db", "c")
    try {
      val wide = dsv2(wsrv, Some(wdf.schema),
        "minkey" -> "0", "maxkey" -> "100")
        .groupBy(col("g")).agg(sum(col("amt")).as("s"))
      assert(!scanDescription(wide).contains("GraftMongoGroupScan"),
        scanDescription(wide))
      val got = wide.collect().map(r => (r.getInt(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      val expect = wdf.groupBy(col("g")).agg(sum(col("amt")).as("s"))
        .collect().map(r => (r.getInt(0), r.getDecimal(1)))
        .sortBy(_._1).toSeq
      assert(got == expect)
    } finally wsrv.close()
  }

  test("review hardening: a windowed table aggregates ONLY its " +
      "window, early-closed cursors are killed server-side, " +
      "listCollections pages past one batch, negative keys tail, " +
      "pre-epoch timestamps floor to the millisecond") {
    import spark.implicits._
    val df = fixtureDf(1000)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // 1. the complete COUNT/MIN/MAX honors minkey/maxkey: before
      // the fix it counted the WHOLE collection for a windowed table
      val windowed = dsv2(srv, Some(df.schema),
        "minkey" -> "100", "maxkey" -> "200")
      val aq = windowed.agg(count(lit(1)).as("n"),
        min(col("k")).as("lo"), max(col("k")).as("hi"))
      assert(scanDescription(aq).contains("GraftMongoAggScan"))
      val ar = aq.collect().head
      assert((ar.getLong(0), ar.getLong(1), ar.getLong(2)) ==
        ((100L, 100L, 199L)))
      // …and agrees with the scan and the group pushdown over the
      // same window (they disagreed before the fix)
      assert(windowed.count() == 100L)
      val gr = windowed.groupBy(col("flag")).agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
      assert(gr == 100L)
      // 2. an early-closed cursor KILLS its server cursor: no
      // snapshot pinned for the server's lifetime
      val cur = new MongoWire.FindCursor("127.0.0.1", srv.port, "db",
        "c", None, None, None, None, 10)
      assert(cur.take(15).toList.size == 15)   // mid-stream, live
      assert(srv.openCursors == 1)
      cur.close()
      assert(srv.openCursors == 0)
    } finally srv.close()
    // 3. listCollections pages: 250 collections at the command's
    // default batch of 101 = three pages, client drains them all
    val many = new InProcessMongod("db",
      (0 until 250).map(i => (f"coll$i%03d", "k",
        IndexedSeq.empty[(Long, Array[Byte])])), 1000, None)
    try {
      val names = MongoWire.listCollectionNames("127.0.0.1",
        many.port, "db")
      assert(names.size == 250 &&
        names == names.sorted && names.head == "coll000")
    } finally many.close()
    // 4. a tail on an initially-EMPTY collection delivers documents
    // with NEGATIVE keys (the old 0 floor skipped them silently)
    val tailSrv = InProcessMongod.serveEmpty("db", "tail", "k")
    try {
      val schema = StructType(Seq(StructField("k", LongType),
        StructField("name", StringType)))
      val q = spark.readStream.format("graft-mongo").schema(schema)
        .option("host", "127.0.0.1")
        .option("port", tailSrv.port.toString)
        .option("database", "db").option("collection", "tail")
        .option("keyfield", "k").option("numpartitions", "2")
        .load()
        .writeStream.format("memory")
        .queryName("mongo_tail_negative").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(100))
        .start()
      try {
        MongoWire.write((-50L until -10L).map(i => (i, s"v$i"))
          .toDF("k", "name"), "127.0.0.1", tailSrv.port, "db", "tail")
        q.processAllAvailable()
        assert(spark.table("mongo_tail_negative").collect()
          .map(_.getLong(0)).sorted.toSeq == (-50L until -10L))
      } finally q.stop()
    } finally tailSrv.close()
    // 5. pre-epoch sub-millisecond timestamps floor (floorDiv), so
    // the V2 writer cannot shift them forward a millisecond
    val tsSrv = InProcessMongod.serveEmpty("db", "ts", "k")
    try {
      val ts = java.sql.Timestamp.from(
        java.time.Instant.EPOCH.minusNanos(1500000))   // −1.5 ms
      val tdf = Seq((1L, ts)).toDF("k", "when")
      tdf.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1")
        .option("port", tsSrv.port.toString)
        .option("database", "db").option("collection", "ts")
        .option("keyfield", "k").save()
      val raw = new MongoWire.FindCursor("127.0.0.1", tsSrv.port,
        "db", "ts", None, None, None, None, 10)
      try {
        val ms = raw.next().v.collectFirst {
          case ("when", BDateTime(x)) => x }.get
        assert(ms == -2L, s"floor(-1.5ms) must be -2ms, got $ms")
      } finally raw.close()
    } finally tsSrv.close()
  }

  test("streaming tail checkpoint recovery: a RESTARTED query " +
      "resumes from the persisted key watermark (deserializeOffset) " +
      "— no re-delivery, no gap") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType)))
    val srv = InProcessMongod.serveEmpty("db", "tail", "k")
    val dst = InProcessMongod.serveEmpty("db", "out", "k")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tail_recovery").toString
    try {
      // wire-to-wire with a checkpoint (the memory sink refuses
      // recovery by design; our V2 sink does not)
      def startQuery() = spark.readStream.format("graft-mongo")
        .schema(schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "tail")
        .option("keyfield", "k").option("numpartitions", "2")
        .load()
        .writeStream.format("graft-mongo")
        .option("host", "127.0.0.1").option("port", dst.port.toString)
        .option("database", "db").option("collection", "out")
        .option("keyfield", "k")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(100))
        .start()
      def sunk(): Seq[Long] = {
        val cur = new MongoWire.FindCursor("127.0.0.1", dst.port,
          "db", "out", None, None, None, None, 512)
        try cur.map(_.v.collectFirst {
          case ("k", BInt64(x)) => x }.get).toList.sorted
        finally cur.close()
      }
      val q1 = startQuery()
      try {
        MongoWire.write((0L until 40L).map(i => (i, s"v$i"))
          .toDF("k", "name"), "127.0.0.1", srv.port, "db", "tail")
        q1.processAllAvailable()
        assert(sunk() == (0L until 40L))
      } finally q1.stop()
      // while the query is DOWN, more documents arrive
      MongoWire.write((100L until 130L).map(i => (i, s"v$i"))
        .toDF("k", "name"), "127.0.0.1", srv.port, "db", "tail")
      // restart from the checkpoint: the offset json round-trips
      // through deserializeOffset; exactly the missed window is
      // appended — no re-delivery of wave 1, no gap
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        assert(sunk() == ((0L until 40L) ++ (100L until 130L)),
          s"restart must append exactly the missed window")
      } finally q2.stop()
      // the persisted offsets carry the change-stream-shaped resume
      // token (opaque, binds the checkpoint to db.coll)
      val offsetFiles = new java.io.File(ckpt, "offsets").listFiles()
      assert(offsetFiles != null && offsetFiles.nonEmpty)
      val lastOffset = scala.io.Source.fromFile(
        offsetFiles.maxBy(_.getName)).mkString
      assert(lastOffset.contains("resumeToken"),
        s"offset log must carry the resume token: $lastOffset")
      // resume-token rule: the SAME checkpoint replayed against a
      // DIFFERENT collection is refused loudly (the token names the
      // stream it came from), never silently tails the wrong data
      val other = InProcessMongod.serveEmpty("db", "othercoll", "k")
      try {
        val q3 = spark.readStream.format("graft-mongo")
          .schema(schema)
          .option("host", "127.0.0.1")
          .option("port", other.port.toString)
          .option("database", "db").option("collection", "othercoll")
          .option("keyfield", "k").option("numpartitions", "2")
          .load()
          .writeStream.format("graft-mongo")
          .option("host", "127.0.0.1")
          .option("port", dst.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        val e = intercept[org.apache.spark.sql.streaming
            .StreamingQueryException] {
          q3.processAllAvailable()
          q3.awaitTermination(10000)
        }
        def chain(t: Throwable): Seq[Throwable] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .take(8).toSeq
        assert(chain(e).exists(t => Option(t.getMessage)
            .exists(_.contains("different collection"))),
          s"expected the resume-token refusal, got: $e")
        try q3.stop() catch { case _: Exception => () }
      } finally other.close()
    } finally {
      srv.close(); dst.close()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(ckpt))
    }
  }

  test("GROUP BY pushdown: per-partition $group partials merge to " +
      "exact results across partition-split groups; strings group " +
      "but never min/max; counts skip nulls like Spark") {
    val df = fixtureDf(1000)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // every grp value spans all 4 key-range partitions: the final
      // merge is load-bearing, not a formality
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "1000", "numpartitions" -> "4")
      val q = base.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("lo"),
          max(col("bal")).as("hib"), sum(col("k")).as("sk"))
      assert(scanDescription(q).contains("GraftMongoGroupScan"),
        scanDescription(q))
      val before = srv.stats.servedDocs.get()
      val got = q.collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getLong(4))).sortBy(_._1)
      // ≤ 25 groups × 4 partitions of partials ever crossed the wire
      assert(srv.stats.servedDocs.get() - before <= 100L)
      val expect = df.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("lo"),
          max(col("bal")).as("hib"), sum(col("k")).as("sk"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getLong(2), r.getDouble(3), r.getLong(4))).sortBy(_._1)
      assert(got.toSeq == expect.toSeq)
      // string GROUPING is fine (equality is collation-safe)…
      val sq = base.groupBy(col("name")).agg(count(lit(1)).as("n"))
      assert(scanDescription(sq).contains("GraftMongoGroupScan"))
      assert(sq.collect().length == 1000)
      // …but string MIN/MAX must NOT push (UTF-8 vs UTF-16 order)
      val smin = base.groupBy(col("grp"))
        .agg(min(col("name")).as("m"))
      assert(!scanDescription(smin).contains("GraftMongoGroupScan"))
      assert(smin.collect().length == 25)
      // COUNT(col) must NOT push: the real server has no count-non-
      // null accumulator in this pipeline subset, and a wire
      // operator only the test double speaks would be a
      // compatibility lie — Spark computes it over the plain scan
      val docs = (0L until 100L).map { i =>
        val fields = Seq("k" -> BInt64(i), "g" -> BInt32((i % 2).toInt)) ++
          (if (i % 4 == 0L) Seq("x" -> BInt64(i))
           else if (i % 4 == 1L) Seq("x" -> BNull)
           else Nil)
        (i, Bson.encode(BDoc(fields)))
      }.toIndexedSeq
      val srv2 = new InProcessMongod(docs, "k", "db", "c")
      try {
        val schema2 = StructType(Seq(StructField("k", LongType),
          StructField("g", IntegerType), StructField("x", LongType)))
        val df2 = dsv2(srv2, Some(schema2), "numpartitions" -> "3")
        val cq = df2.groupBy(col("g")).agg(count(col("x")).as("nx"),
          count(lit(1)).as("n"))
        assert(!scanDescription(cq).contains("GraftMongoGroupScan"),
          scanDescription(cq))
        val r = cq.collect().map(x => (x.getInt(0), x.getLong(1),
          x.getLong(2))).sortBy(_._1).toSeq
        // non-null x exists only where i%4==0, which is always g=0
        assert(r == Seq((0, 25L, 50L), (1, 0L, 50L)))
      } finally srv2.close()
    } finally srv.close()
  }

  test("SupportsRuntimeFiltering: a join-derived key IN-set narrows " +
      "the wire filter AND the planned key ranges before cursors " +
      "open; inexpressible runtime filters are prune-only no-ops") {
    import spark.implicits._
    val df = fixtureDf(10000)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // mechanics: hand the scan a runtime IN-set, then plan — the
      // order Spark's executor uses (filter() resolves from the
      // dynamic-pruning subquery BEFORE filteredPartitions plans)
      val wire = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "10000", "numpartitions" -> "4")
      val scan = wire.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b.scan }.get
        .asInstanceOf[
          org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      assert(scan.filterAttributes().map(_.describe()).toSeq ==
        Seq("k"))
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("k",
          Array[Any](5L, 17L, 300L)),
        org.apache.spark.sql.sources.StringContains("name", "x")))
      val batch = scan.asInstanceOf[
        org.apache.spark.sql.connector.read.Scan].toBatch
      val parts = batch.planInputPartitions()
      // the planned window narrowed to [5, 301): 4 partitions over
      // a 296-key span, none outside it
      val factory = batch.createReaderFactory()
      val before = srv.stats.servedDocs.get()
      val got = parts.flatMap { p =>
        val r = factory.createReader(p)
        val out = Iterator.continually(
          if (r.next()) Some(r.get().getLong(0)) else None)
          .takeWhile(_.isDefined).flatten.toList
        r.close(); out
      }.sorted.toSeq
      assert(got == Seq(5L, 17L, 300L))
      // the narrowed window + $in: only matching docs ever shipped
      assert(srv.stats.servedDocs.get() - before == 3L)
      // the natural path: joined under a small broadcast dim, Spark
      // injects the runtime filter itself (dynamic pruning)
      val wire2 = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "10000", "numpartitions" -> "4")
      val dim = Seq((3L, "a"), (42L, "b"), (9999L, "c"),
          (77L, "zz"), (123L, "zz"))
        .toDF("dk", "tag")
      // the selective build-side predicate dynamic pruning wants
      val joined = wire2.join(broadcast(dim.filter(col("tag") < "z")),
        col("k") === col("dk"))
      val b2 = srv.stats.servedDocs.get()
      val rows = joined.collect()
      assert(rows.length == 3)
      val served2 = srv.stats.servedDocs.get() - b2
      val plan = joined.queryExecution.executedPlan.toString
      if (plan.contains("dynamicpruning")) {
        assert(served2 <= 10L,
          s"runtime filter present but $served2 docs served")
      } else {
        // Spark chose not to inject one here — record, don't fail:
        // the mechanics above already prove the contract end to end
        info(s"no dynamic pruning injected by this Spark version " +
          s"for this join shape (served $served2)")
      }
    } finally srv.close()
  }

  test("SupportsReportStatistics: server collStats/count feed the " +
      "cost model, so a small live collection under a join is " +
      "auto-broadcast (no explicit broadcast hint)") {
    import spark.implicits._
    val dim = fixtureDf(25)
    val srv = InProcessMongod.serve(dim, "k", "db", "dim")
    try {
      val wire = dsv2(srv, Some(dim.schema), "collection" -> "dim")
      // filtered stats: numRows refined by the count command
      val scan = wire.filter(col("grp") < 5).queryExecution
        .executedPlan.collectLeaves().collectFirst {
          case b: BatchScanExec => b.scan
        }.get
      val st = scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      assert(st.numRows().getAsLong ==
        dim.filter(col("grp") < 5).count())
      assert(st.sizeInBytes().getAsLong > 0)
      // the join: a big local fact × the 25-row wire dim — WITHOUT
      // statistics DSv2 reports unknown=huge and this would plan a
      // sort-merge join; the stats make it a broadcast
      val fact = (0L until 50000L).map(i => (i, i % 25))
        .toDF("fid", "dimk")
      val joined = fact.join(wire, col("dimk") === col("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(joined.count() == 50000L)
    } finally srv.close()
  }

  test("hello handshake, compress=auto negotiation, and error " +
      "replies: a failed command returns {ok:0, errmsg, code} and " +
      "the connection survives for the next command") {
    val df = fixtureDf(50)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // handshake advertises zlib; auto negotiates to it
      val h = MongoWire.hello("127.0.0.1", srv.port)
      assert(h.v.collectFirst {
        case ("compression", BArr(cs)) => cs
      }.contains(Seq(BString("zlib"))))
      assert(MongoWire.negotiateZlib("127.0.0.1", srv.port))
      val auto = dsv2(srv, Some(df.schema), "compress" -> "auto")
      assert(auto.collect().length == 50)
      // error replies: the server's message arrives, the socket lives
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        val bad = MongoWire.runCommand(sock, BDoc(Seq(
          "find" -> BString("nope"), "$db" -> BString("db"))), 1)
        assert(bad.v.contains("ok" -> BDouble(0.0)))
        val errmsg = bad.v.collectFirst {
          case ("errmsg", BString(m)) => m }.get
        assert(errmsg.contains("unknown collection"))
        // SAME socket, next command still works
        val good = MongoWire.runCommand(sock, BDoc(Seq(
          "count" -> BString("c"), "$db" -> BString("db"))), 2)
        assert(good.v.contains("n" -> BInt32(50)))
      } finally sock.close()
      // the cursor client surfaces the server's message
      val e = intercept[Exception] {
        new MongoWire.FindCursor("127.0.0.1", srv.port, "db", "nope",
          None, None, None, None, 10).toList
      }
      assert(e.getMessage.contains("unknown collection"))
    } finally srv.close()
  }

  test("OP_COMPRESSED: snappy, zlib, and zstd frames each " +
      "round-trip bit-equal and fewer bytes cross the socket for " +
      "the same rows") {
    import spark.implicits._
    // a compressible payload column (real documents compress well)
    val df = (0L until 500L).map(i =>
        (i, ("the quick brown fox " * 20) + i))
      .toDF("k", "text")
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def wireBytes(compress: String): (Long, Seq[(Long, String)]) = {
        val before = srv.stats.wireBytesOut.get()
        val rows = dsv2(srv, Some(df.schema),
          "minkey" -> "0", "maxkey" -> "500", "batchsize" -> "64",
          "compress" -> compress)
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .sortBy(_._1).toSeq
        (srv.stats.wireBytesOut.get() - before, rows)
      }
      val (plainBytes, plainRows) = wireBytes("none")
      for (name <- Seq("snappy", "zlib", "zstd")) {
        val (packedBytes, packedRows) = wireBytes(name)
        assert(packedRows == plainRows, s"$name rows diverge")
        assert(packedRows.map(_._1) == (0L until 500L))
        assert(packedBytes < plainBytes / 2,
          s"$name did not shrink the wire: $packedBytes vs " +
            s"$plainBytes")
      }
      // an unsupported compressor name is a loud error
      intercept[Exception](dsv2(srv, Some(df.schema),
        "compress" -> "lz4").collect())
    } finally srv.close()
  }

  test("compressor negotiation follows the drivers-spec CLIENT-" +
      "preference rule per connection; a zlib-only client against " +
      "a snappy-only server falls back to plain frames; a FORCED " +
      "unsupported compressor fails loudly client-side; a " +
      "compressed frame on a connection that never negotiated it " +
      "is dropped by the server") {
    val df = fixtureDf(50)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      // client's own order wins: the default offer lists snappy
      // first, so snappy wins whatever the server's echo order is
      assert(MongoWire.negotiate("127.0.0.1", srv.port)
        .contains(MongoWire.WireCompress.SnappyId))
      // server speaks zlib+zstd (echoes in ITS order, zstd first
      // here); a client offering zlib BEFORE zstd gets zlib — the
      // client's preference, not the echo head (drivers spec)
      srv.setCompressors(Seq("zstd", "zlib"))
      assert(MongoWire.negotiate("127.0.0.1", srv.port,
        offered = Seq("zlib", "zstd"))
        .contains(MongoWire.WireCompress.ZlibId))
      // and the same offer order flipped gets zstd
      assert(MongoWire.negotiate("127.0.0.1", srv.port,
        offered = Seq("zstd", "zlib"))
        .contains(MongoWire.WireCompress.ZstdId))
      // zlib-only client vs snappy-only server: no common
      // compressor — negotiate reports none, auto reads run PLAIN
      srv.setCompressors(Seq("snappy"))
      assert(MongoWire.negotiate("127.0.0.1", srv.port,
        offered = Seq("zlib")).isEmpty)
      assert(!MongoWire.negotiateZlib("127.0.0.1", srv.port))
      val auto = dsv2(srv, Some(df.schema), "compress" -> "auto")
      assert(auto.count() == 50L)
      // forcing zlib against the snappy-only server: the
      // connection's own handshake fails to negotiate it and the
      // client refuses LOUDLY — never a silent plaintext downgrade
      val forced = intercept[Exception](dsv2(srv, Some(df.schema),
        "compress" -> "zlib").collect())
      assert(Option(forced.getMessage).exists(_.contains("zlib")) ||
        forced.getCause != null)
      srv.setCompressors(Seq("snappy", "zlib", "zstd"))
      // negotiation is per CONNECTION: a raw socket that never sent
      // a hello cannot send compressed frames — the server treats it
      // as a frame violation and drops the connection
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try intercept[java.io.IOException] {
        MongoWire.runCommand(sock, BDoc(Seq(
          "count" -> BString("c"), "$db" -> BString("db"))), 1,
          compress = Some(MongoWire.WireCompress.ZlibId))
      } finally sock.close()
    } finally srv.close()
  }

  test("endSessions: the V2 writer ends its implicit session on " +
      "close, so server sessions do not accumulate across " +
      "partitioned writes") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"row$i")).toDF("k", "name")
    val srv = InProcessMongod.serveEmpty("db", "w", "k")
    try {
      assert(srv.activeSessionCount == 0)
      assert(MongoWire.write(df.repartition(4), "127.0.0.1",
        srv.port, "db", "w") == 100L)
      // 4 partitions = 4 implicit sessions, every one ended at close
      assert(srv.activeSessionCount == 0,
        s"writer leaked ${srv.activeSessionCount} server sessions")
      // and ending the session killed its retryable-write records:
      // a fresh writer reusing nothing, rows all present exactly once
      val back = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "w", None, Some(Seq("k")), None, None, 64)
      try assert(back.size == 100) finally back.close()
    } finally srv.close()
  }

  test("DSv2 OR-tree pushdown: disjunctions of translatable leaves " +
      "push whole ($or on the wire), served == matched, and a tree " +
      "with one untranslatable leaf stays in Spark entirely") {
    val df = fixtureDf(400)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "400")
      val pred = col("grp") === 3 || col("bal") > 550.0
      val q = base.filter(pred)
      assert(scanDescription(q).contains("Or("), scanDescription(q))
      val before = srv.stats.servedDocs.get()
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      val served = srv.stats.servedDocs.get() - before
      val expect = df.filter(pred).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == expect && served == expect.size.toLong,
        s"served=$served expected=${expect.size}")
      // nested: (grp = 3 AND flag) OR k < 5 — whole tree on the wire
      val nested = (col("grp") === 3 && col("flag")) || col("k") < 5
      val nq = base.filter(nested)
      assert(nq.collect().map(_.getLong(0)).sorted.toSeq ==
        df.filter(nested).collect().map(_.getLong(0)).sorted.toSeq)
      // one untranslatable leaf (string range) poisons the whole
      // tree: it must NOT appear pushed, and results stay correct
      val mixed = col("grp") === 3 || col("name") > "name95"
      val mq = base.filter(mixed)
      assert(!scanDescription(mq).contains("Or("),
        scanDescription(mq))
      assert(mq.collect().map(_.getLong(0)).sorted.toSeq ==
        df.filter(mixed).collect().map(_.getLong(0)).sorted.toSeq)
    } finally srv.close()
  }

  test("TableCatalog: SHOW TABLES is the wire listCollections, " +
      "plain SQL gets the full pushdown surface, DDL is refused") {
    val a = fixtureDf(120)
    val b = fixtureDf(45)
    val srv = InProcessMongod.serveAll("graft",
      Seq(("alpha", "k", a), ("beta", "k", b)))
    try {
      // port-unique catalog name: a fresh instance per server
      val cat = s"wiremongo${srv.port}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.MongoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.host", "127.0.0.1")
      spark.conf.set(s"spark.sql.catalog.$cat.port",
        srv.port.toString)
      spark.conf.set(s"spark.sql.catalog.$cat.database", "graft")
      spark.conf.set(s"spark.sql.catalog.$cat.keyfield", "k")
      assert(spark.sql(s"SHOW TABLES IN $cat.graft").collect()
        .map(_.getString(1)).sorted.toSeq == Seq("alpha", "beta"))
      // complete COUNT(*) pushdown THROUGH SQL over the catalog
      val cq = spark.sql(
        s"SELECT count(*) AS n FROM $cat.graft.alpha WHERE grp = 3")
      assert(scanDescription(cq).contains("GraftMongoAggScan"))
      assert(cq.collect().head.getLong(0) ==
        a.filter(col("grp") === 3).count())
      // filter + projection pushdown through SQL, inferred schema
      val rows = spark.sql(s"SELECT k, bal FROM $cat.graft.alpha " +
        "WHERE k < 10 ORDER BY k").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        (0L until 10L).map(i => (i, i * 1.5 + 0.25)))
      // DDL refuses loudly
      intercept[Exception](
        spark.sql(s"DROP TABLE $cat.graft.alpha").collect())
    } finally srv.close()
  }

  test("DSv2 decimal128 and ObjectId: inference widens scales, " +
      "reads land exactly, writes carry decimals back as decimal128") {
    import java.math.{BigDecimal => JBD}
    val docs = IndexedSeq(
      (0L, Bson.encode(BDoc(Seq("k" -> BInt64(0L),
        "price" -> BDecimal128(new JBD("10.5")),
        "oid" -> BObjectId(Array.tabulate(12)(_.toByte)))))),
      (1L, Bson.encode(BDoc(Seq("k" -> BInt64(1L),
        "price" -> BDecimal128(new JBD("2.125")),
        "oid" -> BObjectId(Array.tabulate(12)(i =>
          (i + 1).toByte)))))))
    val srv = new InProcessMongod(docs, "k", "db", "c")
    try {
      val df = dsv2(srv, None)
      // scales 1 and 3 merge to DecimalType(38, 3); ObjectId → hex
      assert(df.schema("price").dataType == DecimalType(38, 3))
      assert(df.schema("oid").dataType == StringType)
      val rows = df.orderBy("k").collect()
      assert(rows(0).getDecimal(1) == new JBD("10.500"))
      assert(rows(1).getDecimal(1) == new JBD("2.125"))
      assert(rows(0).getString(2) == "000102030405060708090a0b")
      // write path: DecimalType columns ship back as decimal128
      val out = InProcessMongod.serveEmpty("db", "out", "k")
      try {
        df.select(col("k"), col("price")).write
          .format("graft-mongo").mode("append")
          .option("host", "127.0.0.1")
          .option("port", out.port.toString)
          .option("database", "db").option("collection", "out")
          .option("keyfield", "k").save()
        val back = dsv2(out, Some(StructType(Seq(
            StructField("k", LongType),
            StructField("price", DecimalType(38, 3))))),
          "collection" -> "out")
          .orderBy("k").collect()
        assert(back.map(_.getDecimal(1)).toSeq ==
          Seq(new JBD("10.500"), new JBD("2.125")))
      } finally out.close()
    } finally srv.close()
  }

  test("DSv2 batch write: df.write.format(\"graft-mongo\") ships " +
      "acknowledged insert batches per partition and round-trips") {
    val df = fixtureDf(250).repartition(3)
    val srv = InProcessMongod.serveEmpty("db", "c", "k")
    try {
      df.write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k").option("batchsize", "64")
        .save()
      assert(MongoWire.countDocs("127.0.0.1", srv.port, "db", "c") ==
        250L)
      val back = dsv2(srv, Some(df.schema), "numpartitions" -> "3")
      val a = back.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      val b = df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    } finally srv.close()
  }

  test("wire-to-wire streaming pipeline: tail one collection, sink " +
      "into another over the wire, contents converge exactly") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType)))
    val src = InProcessMongod.serveEmpty("db", "a", "k")
    val dst = InProcessMongod.serveEmpty("db", "b", "k")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_wire2wire").toString
    try {
      val q = spark.readStream.format("graft-mongo").schema(schema)
        .option("host", "127.0.0.1").option("port", src.port.toString)
        .option("database", "db").option("collection", "a")
        .option("keyfield", "k").option("numpartitions", "2")
        .load()
        .writeStream.format("graft-mongo")
        .option("host", "127.0.0.1").option("port", dst.port.toString)
        .option("database", "db").option("collection", "b")
        .option("keyfield", "k")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(100))
        .start()
      try {
        def wave(lo: Long, hi: Long): Unit = {
          MongoWire.write((lo until hi).map(i => (i, s"v$i"))
            .toDF("k", "name"), "127.0.0.1", src.port, "db", "a")
          q.processAllAvailable()
        }
        wave(0L, 40L)
        wave(40L, 90L)
        val out = MongoWire.read(spark, "127.0.0.1", dst.port, "db",
          "b", schema, "k", 0L, 1000L, numPartitions = 2)
          .collect().map(r => (r.getLong(0), r.getString(1))).sorted
        assert(out.toSeq == (0L until 90L).map(i => (i, s"v$i")))
      } finally q.stop()
    } finally {
      src.close(); dst.close()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(ckpt))
    }
  }

  test("DSv2 schema inference: sampled-document union with numeric " +
      "widening; conflicts fall back to VARIANT columns (r16); " +
      "all-null fields stay loud errors") {
    val df = fixtureDf(80)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val inferred = dsv2(srv, None)
      assert(inferred.schema.fields.map(f => (f.name, f.dataType))
        .toSeq == Seq(("k", LongType), ("name", StringType),
          ("grp", IntegerType), ("bal", DoubleType),
          ("flag", BooleanType)))
      assert(inferred.count() == 80)
    } finally srv.close()
    // widening: x arrives as int32 in one doc, int64 in another
    val widen = new InProcessMongod(IndexedSeq(
      (0L, Bson.encode(BDoc(Seq("k" -> BInt64(0L), "x" -> BInt32(1))))),
      (1L, Bson.encode(BDoc(Seq("k" -> BInt64(1L),
        "x" -> BInt64(5L)))))), "k", "db", "c")
    try {
      val s = dsv2(widen, None).schema
      assert(s("x").dataType == LongType)
    } finally widen.close()
    // conflict: int vs string — a VARIANT column (StringType +
    // marker metadata, relaxed Extended JSON values), the
    // reference's mixed-type analyser semantics (was a loud error
    // until r16; MongoHardeningSpec covers the full decode/pushdown
    // contract)
    val clash = new InProcessMongod(IndexedSeq(
      (0L, Bson.encode(BDoc(Seq("k" -> BInt64(0L), "x" -> BInt32(1))))),
      (1L, Bson.encode(BDoc(Seq("k" -> BInt64(1L),
        "x" -> BString("s")))))), "k", "db", "c")
    try {
      val s = dsv2(clash, None).schema
      assert(s("x").dataType == StringType &&
        Bson.isVariantField(s("x")))
    } finally clash.close()
    // all-null: refuse to guess
    val nul = new InProcessMongod(IndexedSeq(
      (0L, Bson.encode(BDoc(Seq("k" -> BInt64(0L), "x" -> BNull))))),
      "k", "db", "c")
    try {
      val e = intercept[Exception](dsv2(nul, None).schema)
      assert(e.getMessage.contains("'x'"))
    } finally nul.close()
  }
  test("batchsize is the ROUND-TRIP knob a high-latency link needs: " +
      "a 5x larger batch cuts getMore round trips 9x to 1, same " +
      "rows either way") {
    val df = fixtureDf(500)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      def trips(bs: Int): Long = {
        srv.stats.getMores.set(0L)
        val rows = dsv2(srv, Some(df.schema), "minkey" -> "0",
          "maxkey" -> "500", "numpartitions" -> "1",
          "batchsize" -> bs.toString).collect()
        assert(rows.length == 500)
        srv.stats.getMores.get()
      }
      // 500 docs: find serves the first batch, getMore the rest
      assert(trips(50) == 9L)
      assert(trips(250) == 1L)
    } finally srv.close()
  }

  test("native VariantType (varianttype=true): mixed-type fields " +
      "infer as Spark 4 VariantType, variant_get/to_json work, " +
      "filters on the variant column still refuse pushdown") {
    val docs = (0L until 60L).map { i =>
      val payload: BVal = (i % 3) match {
        case 0 => BInt32(i.toInt)
        case 1 => BString(s"s$i")
        case _ => BBool(i % 2 == 0)
      }
      val base = Seq[(String, BVal)]("k" -> BInt64(i),
        "payload" -> payload)
      val all = if (i % 2 == 0)
        base :+ ("sub" -> (BDoc(Seq(
          "a" -> BInt32((i % 10).toInt))): BVal))
      else base
      (i, Bson.encode(BDoc(all)))
    }.toIndexedSeq
    val srv = new InProcessMongod(docs, "k", "db", "c")
    try {
      val df = dsv2(srv, None, "varianttype" -> "true",
        "samplesize" -> "60", "minkey" -> "0", "maxkey" -> "60")
      // inferred as the NATIVE type, still marked variant
      assert(df.schema("payload").dataType ==
        org.apache.spark.sql.types.VariantType)
      assert(Bson.isVariantField(df.schema("payload")))
      assert(df.schema("sub").dataType ==
        org.apache.spark.sql.types.VariantType)
      // variant-aware expressions: scalar cast + nested path
      val got = df.selectExpr("k",
        "variant_get(payload, '$', 'string') AS p",
        "variant_get(sub, '$.a', 'long') AS a")
        .collect().map(r => (r.getLong(0),
          Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got.size == 60)
      assert(got(0) == ((0L, Some("0"), 0L)))
      assert(got(1) == ((1L, Some("s1"), -1L)))
      assert(got(2) == ((2L, Some("true"), 2L)))
      assert(got(5) == ((5L, Some("false"), -1L)))
      // to_json renders the variant losslessly
      val js = df.filter(col("k") === 4L)
        .selectExpr("to_json(sub) AS j").head().getString(0)
      assert(js == """{"a":4}""", js)
      // pushdown still refused: equality on the variant column is a
      // residual filter, never a wire conjunct
      val filtered = df.filter(
        expr("variant_get(payload, '$', 'string')") === "s1")
      assert(scanDescription(filtered).contains("PushedFilters: []"),
        scanDescription(filtered))
      assert(filtered.count() == 1L)
    } finally srv.close()
  }

  test("TABLESAMPLE pushdown: df.sample plans GraftMongoSampleScan, " +
      "the server draws exactly floor(fraction*n+0.5) docs (the " +
      "deterministic md5 draw), the wire ships only the sample, and " +
      "replacement/limit shapes refuse") {
    val df = fixtureDf(100)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val base = dsv2(srv, Some(df.schema),
        "minkey" -> "0", "maxkey" -> "100")
      val sampled = base.sample(withReplacement = false,
        fraction = 0.25, seed = 42L).select("k", "name")
      assert(scanDescription(sampled).contains("GraftMongoSampleScan"),
        scanDescription(sampled))
      srv.stats.servedDocs.set(0L)
      val got = sampled.collect().map(_.getLong(0)).sorted.toSeq
      // server work = the 25 sampled docs, not the collection
      assert(srv.stats.servedDocs.get() == 25L,
        s"served ${srv.stats.servedDocs.get()}")
      // the double draws deterministically by md5("<coll>:<key>"):
      // content is exactly that prefix
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(k: Long): String = {
        md.reset()
        md.digest(s"c:$k".getBytes("UTF-8")).map(b => f"$b%02x")
          .mkString
      }
      val expect = (0L until 100L).sortBy(h).take(25).sorted.toSeq
      assert(got == expect)
      // a count above the sample sees SAMPLED rows (a complete-agg
      // pushdown over the collection would answer 100)
      assert(base.sample(withReplacement = false, fraction = 0.25,
        seed = 7L).count() == 25L)
      // filter + sample: Spark's pushdown rule order (sample before
      // filters) keeps the Sample in Spark — the filter still pushes
      // and the result stays correct (Bernoulli in Spark), it just
      // is not the wire's draw. Document, don't pretend.
      val filtered = base.filter(col("k") < 40L)
        .sample(withReplacement = false, fraction = 0.5, seed = 1L)
      assert(!scanDescription(filtered)
        .contains("GraftMongoSampleScan"))
      assert(scanDescription(filtered).contains("LessThan(k,40)"))
      assert(filtered.count() <= 40L)
      // sample THEN filter (df.sample(f).filter(p)): the sample
      // pushes (rule order runs it first), and the filter must NOT —
      // a pushed $match would run BEFORE $sample on the wire,
      // inverting the plan's operator order (the wire would draw an
      // exact-size sample of the FILTERED set). The filter stays in
      // Spark, applied to the shipped sample.
      val sf = base.sample(withReplacement = false, fraction = 0.25,
        seed = 3L).filter(col("k") < 40L).select("k")
      val sfDesc = scanDescription(sf)
      assert(sfDesc.contains("GraftMongoSampleScan"), sfDesc)
      assert(sfDesc.contains("Filter: []"), sfDesc)
      srv.stats.servedDocs.set(0L)
      val sfGot = sf.collect().map(_.getLong(0)).sorted.toSeq
      // the wire ships the full 25-doc draw; Spark filters after
      assert(srv.stats.servedDocs.get() == 25L,
        s"served ${srv.stats.servedDocs.get()}")
      assert(sfGot ==
        (0L until 100L).sortBy(h).take(25).filter(_ < 40L).sorted.toSeq)
      // replacement sampling is not expressible on the wire: refuse
      val wr = base.sample(withReplacement = true, fraction = 0.25,
        seed = 42L)
      assert(!scanDescription(wr).contains("GraftMongoSampleScan"))
    } finally srv.close()
  }

}
