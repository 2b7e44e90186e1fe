package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bson, InProcessMongod, MongoWire}
import graft.sources.Bson._
import graft.sources.v2.MongoV2

/** Sharded-cluster support: the mongos double (isdbgrid hello,
  * shard-merged reads with targeted-vs-scatter metering, routed
  * inserts, the `config` catalog), MinKey/MaxKey codec arms, and the
  * connector's chunk-aligned partition planning — every cursor a
  * single-shard targeted query, partition sizes following the
  * cluster's real chunk map instead of uniform key arithmetic.
  */
class ShardSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i", (i % 5).toInt))
      .toDF("k", "name", "grp")
  }

  test("MinKey/MaxKey round the BSON codec (0xFF / 0x7F) and render " +
      "the extended-JSON forms") {
    val doc = BDoc(Seq("lo" -> BMinKey, "hi" -> BMaxKey,
      "k" -> BInt64(7L)))
    assert(Bson.decode(Bson.encode(doc)) == doc)
    assert(Bson.relaxedJson(BMinKey) == "{\"$minKey\":1}")
    assert(Bson.relaxedJson(BMaxKey) == "{\"$maxKey\":1}")
  }

  test("mongos hello says isdbgrid and advertises sessions; a full " +
      "wire scan merges every shard in key order") {
    val df = fixtureDf(60)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 3, nChunks = 6)
    try {
      val h = MongoWire.hello("127.0.0.1", sc.mongos.port)
      assert(h.v.contains(("msg", BString("isdbgrid"))))
      assert(h.v.exists(_._1 == "logicalSessionTimeoutMinutes"))
      val cur = new MongoWire.FindCursor("127.0.0.1", sc.mongos.port,
        "db", "c", None, None, None, None, 100)
      val keys = try cur.toVector.map(d => d.v.collectFirst {
        case ("k", BInt64(x)) => x
      }.get) finally cur.close()
      assert(keys == (0L until 60L).toVector,
        "the shard merge must preserve global key order")
      // every shard contributed
      sc.shards.foreach(s => assert(s.stats.servedDocs.get > 0L))
    } finally sc.close()
  }

  test("a range find inside ONE chunk is a TARGETED read (one shard " +
      "touched); the unbounded find is a scatter-gather") {
    val df = fixtureDf(100)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 3, nChunks = 6)
    try {
      val r = sc.router
      // pick an inner chunk and query strictly inside it
      val (clo, chi, shardIdx) = r.chunkBounds(3)
      val before = sc.shards.map(_.stats.servedDocs.get)
      val cur = new MongoWire.FindCursor("127.0.0.1", sc.mongos.port,
        "db", "c", Some(BDoc(Seq("k" -> BDoc(Seq(
          "$gte" -> BInt64(clo), "$lt" -> BInt64(chi)))))),
        None, None, None, 100)
      val got = try cur.toVector.size finally cur.close()
      assert(got > 0)
      assert(r.targetedFinds.get == 1L && r.scatterFinds.get == 0L)
      sc.shards.indices.foreach { i =>
        val moved = sc.shards(i).stats.servedDocs.get - before(i)
        if (i == shardIdx) assert(moved > 0L)
        else assert(moved == 0L,
          s"targeted read touched shard $i outside the owning chunk")
      }
      val all = new MongoWire.FindCursor("127.0.0.1", sc.mongos.port,
        "db", "c", None, None, None, None, 100)
      try all.toVector finally all.close()
      assert(r.scatterFinds.get == 1L)
    } finally sc.close()
  }

  test("the config catalog serves collections (shard key + uuid) " +
      "and uuid-keyed chunks with MinKey/MaxKey endpoints") {
    val df = fixtureDf(40)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 2, nChunks = 4)
    try {
      val cc = new MongoWire.FindCursor("127.0.0.1", sc.mongos.port,
        "config", "collections",
        Some(BDoc(Seq("_id" -> BString("db.c")))), None, None,
        Some(1L), 2)
      val cdoc = try { assert(cc.hasNext); cc.next() }
        finally cc.close()
      assert(cdoc.v.collectFirst { case ("key", kd: BDoc) => kd }
        .exists(_.v.headOption.exists(_._1 == "k")))
      val uuid = cdoc.v.collectFirst {
        case ("uuid", b: BBinary) => b }.get
      val ch = new MongoWire.FindCursor("127.0.0.1", sc.mongos.port,
        "config", "chunks", Some(BDoc(Seq("uuid" -> (uuid: BVal)))),
        None, None, None, 100)
      val chunks = try ch.toVector finally ch.close()
      assert(chunks.size == 4)
      def boundTag(d: BDoc, part: String): String =
        d.v.collectFirst { case (`part`, b: BDoc) => b }.get
          .v.head._2 match {
            case BMinKey => "min"; case BMaxKey => "max"
            case _: BInt64 => "val"
            case other => s"?$other"
          }
      assert(chunks.count(c => boundTag(c, "min") == "min") == 1)
      assert(chunks.count(c => boundTag(c, "max") == "max") == 1)
      assert(chunks.forall(c =>
        c.v.exists(kv => kv._1 == "shard")))
    } finally sc.close()
  }

  test("inserts through the mongos route each document to the chunk " +
      "owner; the count comes back through the same merge") {
    val df = fixtureDf(30)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 2, nChunks = 4)
    try {
      val r = sc.router
      // two new docs in chunks on DISTINCT shards: chunk 2 (shard
      // 2%2=0) and the open-ended last chunk 3 (shard 1, owns any
      // key beyond the data range)
      val kInner = r.chunkBounds(2)._1   // first key of chunk 2
      val shInner = r.chunkBounds(2)._3
      val shLast = r.chunkBounds.last._3
      assert(shInner != shLast)
      val beforeInner = sc.shards(shInner).localDocCount("c")
      val beforeLast = sc.shards(shLast).localDocCount("c")
      val sock = MongoWire.openSocket("127.0.0.1", sc.mongos.port,
        None)
      try MongoWire.insertBatch(sock, "db", "c", Seq(
        BDoc(Seq("k" -> BInt64(1000L), "name" -> BString("x"),
          "grp" -> BInt32(0))),
        BDoc(Seq("k" -> BInt64(kInner), "name" -> BString("y"),
          "grp" -> BInt32(0)))), 1)
      finally sock.close()
      assert(sc.shards(shInner).localDocCount("c") ==
        beforeInner + 1)
      assert(sc.shards(shLast).localDocCount("c") ==
        beforeLast + 1)
      assert(MongoWire.countDocs("127.0.0.1", sc.mongos.port,
        "db", "c") == 32L)
    } finally sc.close()
  }

  test("chunkaligned=true: the DSv2 scan plans one cursor per chunk " +
      "group, every cursor is TARGETED (zero scatter), rows match; " +
      "uniform splits over the same cluster DO scatter") {
    val df = fixtureDf(600)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 3, nChunks = 6)
    try {
      val r = sc.router
      def read(aligned: Boolean) = spark.read.format("graft-mongo")
        .schema(df.schema)
        .option("host", "127.0.0.1")
        .option("port", sc.mongos.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .option("minkey", "0").option("maxkey", "600")
        .option("numpartitions", "4")
        .option("chunkaligned", aligned.toString)
        .load()
      val out = read(aligned = true).collect()
      assert(out.length == 600)
      assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 600L))
      assert(r.scatterFinds.get == 0L,
        "chunk-aligned cursors must never scatter-gather")
      assert(r.targetedFinds.get >= 6L,
        "one targeted cursor per chunk group")
      sc.shards.foreach(s => assert(s.stats.servedDocs.get > 0L))
      // the contrast: uniform key quarters cross chunk boundaries
      assert(read(aligned = false).collect().length == 600)
      assert(r.scatterFinds.get > 0L,
        "uniform splits over geometric chunks must scatter")
    } finally sc.close()
  }

  test("chunkaligned=true against a non-sharded server is a loud " +
      "error naming config.collections; a keyfield that is not the " +
      "shard key is refused") {
    val df = fixtureDf(10)
    val plain = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val e = intercept[Exception] {
        spark.read.format("graft-mongo").schema(df.schema)
          .option("host", "127.0.0.1")
          .option("port", plain.port.toString)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k")
          .option("minkey", "0").option("maxkey", "10")
          .option("chunkaligned", "true")
          .load().collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(chain.contains("config.collections") ||
        chain.contains("unknown collection"))
    } finally plain.close()
    val sc = InProcessMongod.serveShardedCluster(fixtureDf(20), "k",
      "db", "c", nShards = 2, nChunks = 4)
    try {
      val e2 = intercept[Exception] {
        spark.read.format("graft-mongo")
          .schema(fixtureDf(1).schema)
          .option("host", "127.0.0.1")
          .option("port", sc.mongos.port.toString)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "grp")
          .option("minkey", "0").option("maxkey", "5")
          .option("chunkaligned", "true")
          .load().collect()
      }
      val chain2 = Iterator.iterate[Throwable](e2)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(chain2.contains("shard key"))
    } finally sc.close()
  }

  test("the V2 writer through the mongos: sessions gate opens on " +
      "isdbgrid, rows route to their chunk owners, and the " +
      "chunk-aligned read-back equals the written frame") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"w$i"))
      .toDF("k", "name")
    val sc = InProcessMongod.serveShardedCluster(
      df.filter($"k" < 25L), "k", "db", "w", nShards = 2,
      nChunks = 4)
    try {
      // the chunk map comes from the first half; the second half
      // written through the mongos routes into it (the high keys
      // land in the open-ended last chunk)
      df.filter($"k" >= 25L).write.format("graft-mongo").mode("append")
        .option("host", "127.0.0.1")
        .option("port", sc.mongos.port.toString)
        .option("database", "db").option("collection", "w")
        .option("keyfield", "k")
        .save()
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", "127.0.0.1")
        .option("port", sc.mongos.port.toString)
        .option("database", "db").option("collection", "w")
        .option("keyfield", "k")
        .option("minkey", "0").option("maxkey", "50")
        .option("chunkaligned", "true")
        .load().collect()
      assert(out.length == 50)
      assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 50L))
      // both shards hold part of the written frame
      sc.shards.foreach(s =>
        assert(s.localDocCount("w") > 0))
    } finally sc.close()
  }

  test("pushed partial GROUP BY through the mongos: chunk-aligned " +
      "group cursors are TARGETED by their leading $match (zero " +
      "scatter) and the aggregate equals the frame's") {
    val df = fixtureDf(300)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 3, nChunks = 6)
    try {
      val r = sc.router
      val got = spark.read.format("graft-mongo")
        .schema(df.schema)
        .option("host", "127.0.0.1")
        .option("port", sc.mongos.port.toString)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .option("minkey", "0").option("maxkey", "300")
        .option("chunkaligned", "true")
        .load()
        .groupBy("grp").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("k").as("sk"))
        .collect().map(rr => (rr.getInt(0), rr.getLong(1),
          rr.getLong(2))).sortBy(_._1).toSeq
      val want = df.groupBy("grp").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("k").as("sk"))
        .collect().map(rr => (rr.getInt(0), rr.getLong(1),
          rr.getLong(2))).sortBy(_._1).toSeq
      assert(got == want)
      assert(r.scatterFinds.get == 0L,
        "chunk-aligned group cursors must target one shard each")
      assert(r.targetedFinds.get >= 6L)
    } finally sc.close()
  }

  test("readpreference against a MONGOS is forwarded, not selected " +
      "client-side: the scan succeeds (a lone router has no " +
      "secondaries) and $readPreference rides the cursor commands " +
      "for the router to route") {
    val df = fixtureDf(40)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 2, nChunks = 4)
    try {
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", s"127.0.0.1:${sc.mongos.port}")
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .option("minkey", "0").option("maxkey", "40")
        .option("numpartitions", "2")
        .option("readpreference", "secondaryPreferred")
        .option("readpreferencetags", "nodeType:ANALYTICS;")
        .load().collect()
      assert(out.length == 40)
      val rp = sc.mongos.stats.lastFind.get.v.collectFirst {
        case ("$readPreference", d: BDoc) => d
      }
      assert(rp.exists(_.v.contains(
        ("mode", BString("secondaryPreferred")))),
        s"the cursor must FORWARD the mode to the router, got $rp")
      // tag sets forward too — the router routes by them across its
      // shards' replica sets (the trailing empty set included)
      assert(rp.exists(_.v.contains(("tags", BArr(Seq(
        BDoc(Seq("nodeType" -> BString("ANALYTICS"))),
        BDoc(Seq())))))),
        s"the cursor must FORWARD the tag sets to the router, got $rp")
    } finally sc.close()
  }

  test("a GAP or OVERLAP in the chunk map is a loud refusal — a " +
      "scan over a torn catalog must never silently drop rows") {
    // a doctored config catalog: chunks [MinKey,10) and [20,MaxKey)
    // — the rows with keys in [10,20) belong to NO cursor
    val uuid = Array.tabulate[Byte](16)(_.toByte)
    def chunk(i: Long, min: BVal, max: BVal): (Long, Array[Byte]) =
      (i, Bson.encode(BDoc(Seq(
        "_id" -> BString(s"c-$i"), "uuid" -> BBinary(4, uuid),
        "min" -> BDoc(Seq("k" -> min)),
        "max" -> BDoc(Seq("k" -> max)),
        "shard" -> BString("sh0")))))
    val collDoc = IndexedSeq((0L, Bson.encode(BDoc(Seq(
      "_id" -> BString("db.c"),
      "key" -> BDoc(Seq("k" -> BInt32(1))),
      "uuid" -> BBinary(4, uuid))))))
    val torn = new InProcessMongod("config", Seq(
      ("collections", "_ck", collDoc),
      ("chunks", "_ck", IndexedSeq(
        chunk(0, BMinKey, BInt64(10L)),
        chunk(1, BInt64(20L), BMaxKey)))), 1000, None)
    try {
      val conf = MongoV2.Conf(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of(
            "host", "127.0.0.1", "port", torn.port.toString,
            "database", "db", "collection", "c", "keyfield", "k")))
      val e = intercept[IllegalArgumentException] {
        MongoV2.chunkRanges(conf, 0L, 100L)
      }
      assert(e.getMessage.contains("GAP"))
    } finally torn.close()
  }

  test("the PRODUCTION topology end to end — a sharded cluster of " +
      "REPLICA SETS: the forwarded $readPreference routes INSIDE " +
      "each shard, so a secondary+tags scan lands only on each " +
      "shard's ANALYTICS member while every shard primary serves " +
      "zero documents") {
    val df = fixtureDf(120)
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 2, nChunks = 4, membersPerShard = 3)
    try {
      // per shard: members.head is the initial primary; tag ONE
      // secondary as the analytics node
      val analytics = sc.shardSets.map { members =>
        val ana = members(1)
        ana.setMemberTags(Map("nodeType" -> "ANALYTICS"))
        members(2).setMemberTags(Map("dc" -> "west"))
        ana
      }
      val out = spark.read.format("graft-mongo").schema(df.schema)
        .option("host", s"127.0.0.1:${sc.mongos.port}")
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k")
        .option("minkey", "0").option("maxkey", "120")
        .option("chunkaligned", "true")
        .option("readpreference", "secondary")
        .option("readpreferencetags", "nodeType:ANALYTICS")
        .load().collect()
      assert(out.length == 120)
      assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 120L))
      assert(sc.router.scatterFinds.get == 0L)
      sc.shardSets.zip(analytics).foreach { case (members, ana) =>
        assert(members.head.stats.servedDocs.get == 0L,
          s"shard primary ${members.head.meAddr} must serve zero " +
            "under the forwarded secondary preference")
        assert(ana.stats.servedDocs.get > 0L,
          s"the ANALYTICS member ${ana.meAddr} must serve its " +
            "shard's documents")
        assert(members(2).stats.servedDocs.get == 0L,
          "the non-matching secondary must serve zero (tag sets " +
            "route inside the shard too)")
      }
      // mode secondary with NO matching tag on a shard: loud
      val e = intercept[Exception] {
        spark.read.format("graft-mongo").schema(df.schema)
          .option("host", s"127.0.0.1:${sc.mongos.port}")
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k")
          .option("minkey", "0").option("maxkey", "120")
          .option("chunkaligned", "true")
          .option("readpreference", "secondary")
          .option("readpreferencetags", "nodeType:NOSUCH")
          .load().collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(chain.contains("NOSUCH"))
    } finally sc.close()
  }

  test("chunkRanges coalesces ADJACENT same-shard chunks and clamps " +
      "to the scan window") {
    val df = fixtureDf(80)
    // nShards=1: every chunk on the same shard -> one coalesced range
    val sc = InProcessMongod.serveShardedCluster(df, "k", "db", "c",
      nShards = 1, nChunks = 4)
    try {
      val conf = MongoV2.Conf(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of(
            "host", "127.0.0.1", "port", sc.mongos.port.toString,
            "database", "db", "collection", "c", "keyfield", "k")))
      val ranges = MongoV2.chunkRanges(conf, 10L, 70L)
      assert(ranges == Seq((10L, 70L)),
        s"same-shard chunks must coalesce and clamp, got $ranges")
    } finally sc.close()
  }
}
