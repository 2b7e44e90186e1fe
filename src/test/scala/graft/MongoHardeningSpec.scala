package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bson, InProcessMongod, MongoWire}
import graft.sources.Bson._

/** Edge-of-the-keyspace and wire-document-shape hardening for the
  * connector: duplicate-free filter documents, Long extreme keys,
  * loud non-integral-keyfield failures.
  */
class MongoHardeningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i", (i % 5).toInt))
      .toDF("k", "name", "grp")
  }

  private def read(srv: InProcessMongod, schema: StructType): DataFrame =
    spark.read.format("graft-mongo")
      .schema(schema)
      .option("host", "127.0.0.1").option("port", srv.port.toString)
      .option("database", "db").option("collection", "c")
      .option("keyfield", "k").option("numpartitions", "2")
      .load()

  private def topLevelKeys(d: BDoc): Seq[String] = d.v.map(_._1)

  test("merged filter documents never carry duplicate top-level keys: " +
      "range conjunct + pushed filters ride a single $and") {
    val df = fixtureDf(20)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val out = read(srv, df.schema)
        .filter(col("k") >= 2L && col("name") === "name5")
        .select("k", "name").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(5L))
      val filterDoc = srv.stats.lastFind
        .flatMap(f => f.v.collectFirst { case ("filter", d: BDoc) => d })
        .getOrElse(fail("no filter document reached the server"))
      val keys = topLevelKeys(filterDoc)
      assert(keys.distinct == keys,
        s"duplicate top-level keys in filter doc: $keys")
      // range + pushed k-filter + pushed name-filter = several
      // conjuncts: they must arrive as ONE $and array
      assert(keys == Seq("$and"), s"expected a single $$and, got $keys")
      val arms = filterDoc.v.head._2 match {
        case BArr(ds) => ds.map { case d: BDoc => topLevelKeys(d) }
        case other => fail(s"$$and wants an array, got $other")
      }
      assert(arms.forall(_.size == 1))
      assert(arms.flatten.count(_ == "k") >= 2,
        "both the range conjunct and the pushed k-filter must arrive")
    } finally srv.close()
  }

  test("descending wire $sort orders Long.MinValue LAST (negation " +
      "overflow would put it first)") {
    import spark.implicits._
    val df = Seq((Long.MinValue, "lo"), (0L, "mid"), (5L, "hi"))
      .toDF("k", "name")
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val cur = new MongoWire.AggregateCursor("127.0.0.1", srv.port,
        "db", "c",
        Seq(BDoc(Seq("$sort" -> BDoc(Seq("k" -> BInt32(-1)))))), 16)
      val keys =
        try cur.map(_.v.collectFirst { case ("k", BInt64(x)) => x }.get)
          .toList
        finally cur.close()
      assert(keys == List(5L, 0L, Long.MinValue))
    } finally srv.close()
  }

  test("streaming tail REFUSES a key of Long.MaxValue loudly instead " +
      "of pinning the watermark and dropping rows") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType)))
    val df = Seq((1L, "a"), (Long.MaxValue, "ceiling")).toDF("k", "name")
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val q = spark.readStream.format("graft-mongo").schema(schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .load()
        .writeStream.format("memory").queryName("maxkey_tail")
        .outputMode("append").start()
      // the query must FAIL (not silently drop the ceiling row);
      // a dead query's processAllAvailable returns instead of
      // throwing, so poll the query's terminal exception
      val deadline = System.currentTimeMillis() + 20000
      try q.processAllAvailable() catch { case _: Exception => () }
      while (q.exception.isEmpty && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      val ex = q.exception.getOrElse(
        fail("query should fail loudly on a Long.MaxValue key"))
      assert(causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("watermarked"))),
        s"expected the loud watermark refusal, got: $ex")
      try q.stop() catch { case _: Exception => () }
    } finally srv.close()
  }

  test("OP_MSG kind-1 document sequences: frame layout per spec, " +
      "insert ships documents as a sequence (plain and compressed), " +
      "and a payload duplicated in the body is refused") {
    import spark.implicits._
    // frame layout: 0x01 | int32 size incl itself | cstring | docs
    val d1 = BDoc(Seq("a" -> BInt32(1)))
    val d2 = BDoc(Seq("b" -> BString("x")))
    val sec = graft.sources.MongoWire.kind1Section("documents",
      Seq(d1, d2))
    assert(sec(0) == 1.toByte)
    val bb = java.nio.ByteBuffer.wrap(sec, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == sec.length - 1,
      "size covers everything after the kind byte, including itself")
    val ident = sec.slice(5, 5 + "documents".length)
    assert(new String(ident, "UTF-8") == "documents" &&
      sec(5 + "documents".length) == 0.toByte)
    assert(sec.drop(6 + "documents".length).toSeq ==
      (Bson.encode(d1) ++ Bson.encode(d2)).toSeq)

    // write path end to end over kind-1 frames, then compressed
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val srv = InProcessMongod.serveEmpty("db", "w", "k")
    try {
      assert(MongoWire.write(df, "127.0.0.1", srv.port, "db", "w")
        == 3L)
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        // compressed insert with a kind-1 sequence — negotiation is
        // per connection, so THIS socket's hello must offer zlib
        // before any compressed frame (the server drops
        // un-negotiated compressed frames)
        val (_, negotiated) =
          MongoWire.connectionHandshake(sock, None, "zlib")
        assert(negotiated.contains(MongoWire.WireCompress.ZlibId))
        val r = MongoWire.runCommand(sock, BDoc(Seq(
          "insert" -> BString("w"), "$db" -> BString("db"))), 7,
          compress = negotiated,
          docSeq = Some(("documents",
            Seq(BDoc(Seq("k" -> BInt64(4L), "name" -> BString("d")))))))
        assert(r.v.contains(("n", BInt32(1))), r.toString)
        // duplicate payload name (body AND sequence): loud refusal
        val dup = intercept[IllegalArgumentException] {
          MongoWire.runCommandOk(sock, BDoc(Seq(
            "insert" -> BString("w"),
            "documents" -> BArr(Seq(d1)),
            "$db" -> BString("db"))), 8,
            docSeq = Some(("documents", Seq(d1))))
        }
        assert(dup.getMessage.contains("both"), dup.getMessage)
      } finally sock.close()
      val back = new MongoWire.FindCursor("127.0.0.1", srv.port,
        "db", "w", None, None, None, None, 16)
      try assert(back.map(_.v.collectFirst {
        case ("k", BInt64(x)) => x }.get).toList == List(1L, 2L, 3L, 4L))
      finally back.close()
    } finally srv.close()
  }

  private def mixedDocs(n: Int): IndexedSeq[(Long, Array[Byte])] =
    (0L until n.toLong).map { i =>
      val payload: BVal = (i % 5) match {
        case 0 => BInt32((i % 1000).toInt)
        case 1 => BString("s" + i)
        case 2 => BDouble(i / 8.0)
        case 3 => BBool(i % 2 == 0)
        case _ => BNull
      }
      val base = Seq[(String, BVal)]("k" -> BInt64(i),
        "payload" -> payload)
      val all = if (i % 3 == 0)
        base :+ ("sub" -> (BDoc(Seq("a" -> BInt32((i % 100).toInt)))
          : BVal))
      else base
      (i, Bson.encode(BDoc(all)))
    }.toIndexedSeq

  test("mixed-type wire fields infer as VARIANT columns (relaxed " +
      "Extended JSON render), filters/groups on them never push, " +
      "and values decode losslessly") {
    val srv = new InProcessMongod(mixedDocs(100), "k", "db", "c")
    try {
      val df = spark.read.format("graft-mongo")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k").option("numpartitions", "2")
        .option("samplesize", "100")
        .load()
      // inference: k stays typed, payload and sub fall back
      val byName = df.schema.fields.map(f => f.name -> f).toMap
      assert(byName("k").dataType == LongType)
      assert(byName("payload").dataType == StringType &&
        Bson.isVariantField(byName("payload")))
      assert(Bson.isVariantField(byName("sub")))
      // values: every arm renders as its relaxed Extended JSON
      val rows = df.orderBy("k").collect()
      assert(rows(0).getString(1) == "0")           // int
      assert(rows(1).getString(1) == "\"s1\"")      // string
      assert(rows(2).getString(1) == "0.25")        // double
      assert(rows(3).getString(1) == "false")       // bool (3 % 2 != 0)
      assert(rows(4).isNullAt(1))                   // BNull -> null
      assert(rows(0).getString(2) == "{\"a\":0}")   // nested doc
      assert(rows(1).isNullAt(2))                   // absent
      // a filter on the variant column is NOT pushed (the wire would
      // compare raw BSON while Spark compares the render) — but it
      // still evaluates correctly in Spark, over all served docs
      srv.stats.servedDocs.set(0L)
      val t = df.filter(col("payload") === "true").count()
      assert(t == (0L until 100L).count(i => i % 5 == 3 && i % 2 == 0))
      assert(srv.stats.servedDocs.get() >= 100L,
        "variant filter must scan all docs, not push " +
          s"(served ${srv.stats.servedDocs.get()}; edge probes add " +
          "a few)")
      // group pushdown refuses a variant group column (int 5 and
      // double 5.0 group together on the server, apart in the render)
      val g = df.groupBy(col("payload")).count()
      val plan = g.queryExecution.executedPlan.toString
      assert(!plan.contains("GraftMongoGroupScan"), plan)
      assert(g.count() > 0)
    } finally srv.close()
  }

  test("variant columns flow through the streaming tail: mixed-type " +
      "inserts arrive as their relaxed Extended JSON renders") {
    val schema = StructType(Seq(StructField("k", LongType),
      graft.sources.Bson.variantField("payload")))
    val srv = InProcessMongod.serveEmpty("db", "vt", "k")
    try {
      val q = spark.readStream.format("graft-mongo").schema(schema)
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("database", "db").option("collection", "vt")
        .option("keyfield", "k")
        .load()
        .writeStream.format("memory").queryName("variant_tail")
        .outputMode("append").start()
      try {
        val sock = new java.net.Socket("127.0.0.1", srv.port)
        try MongoWire.insertBatch(sock, "db", "vt", Seq(
          BDoc(Seq("k" -> BInt64(1L), "payload" -> BInt32(7))),
          BDoc(Seq("k" -> BInt64(2L), "payload" -> BString("x"))),
          BDoc(Seq("k" -> BInt64(3L),
            "payload" -> BDoc(Seq("a" -> BBool(true)))))), 1)
        finally sock.close()
        q.processAllAvailable()
        val got = spark.table("variant_tail").orderBy("k")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(got == Seq((1L, "7"), (2L, "\"x\""),
          (3L, "{\"a\":true}")))
      } finally q.stop()
    } finally srv.close()
  }

  test("catalog loadTable fails LOUDLY when the keyfield resolves to " +
      "a non-integral column (the real-server '_id' ObjectId trap)") {
    val df = fixtureDf(10)
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    val cat = s"hardmongo${srv.port}"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.MongoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.host", "127.0.0.1")
      spark.conf.set(s"spark.sql.catalog.$cat.port", srv.port.toString)
      spark.conf.set(s"spark.sql.catalog.$cat.database", "db")
      // keyfield left at its '_id' default — absent from documents
      val exAbsent = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.c").collect()
      }
      assert(exAbsent.getMessage.contains("keyfield.c") ||
        Option(exAbsent.getCause).exists(
          _.getMessage.contains("keyfield.c")),
        s"expected the keyfield.<collection> hint, got: $exAbsent")
      // keyfield pointed at a STRING column — same loud refusal
      spark.conf.set(s"spark.sql.catalog.$cat.keyfield.c", "name")
      val exString = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.c").collect()
      }
      def msgs(t: Throwable): String =
        Option(t).map(x => x.getMessage + msgs(x.getCause)).getOrElse("")
      assert(msgs(exString).contains("integral"),
        s"expected the integral-keyfield refusal, got: $exString")
    } finally srv.close()
  }
}
