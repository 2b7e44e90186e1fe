package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bson, InProcessMongod, MongoWire, Replica}
import graft.sources.Bson._

/** Replica-set awareness: topology discovery from any seed, the five
  * read-preference modes routing the data path, the real secondary
  * read/write refusals (13435 / 10107), failover-aware retryable
  * writes, and session records shared across members (the replicated
  * sessions collection that makes cross-failover replay exactly-once).
  */
class ReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixtureDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name$i", (i % 5).toInt))
      .toDF("k", "name", "grp")
  }

  private def readRs(rs: InProcessMongod.ReplicaSet,
                     schema: org.apache.spark.sql.types.StructType,
                     pref: String,
                     parts: Int = 4,
                     seeds: Option[String] = None): DataFrame =
    spark.read.format("graft-mongo")
      .schema(schema)
      .option("host", seeds.getOrElse(rs.seeds))
      .option("database", "db").option("collection", "c")
      .option("keyfield", "k")
      .option("numpartitions", parts.toString)
      .option("readpreference", pref)
      .option("replicaset", rs.setName)
      .load()

  test("discovery from a SECONDARY seed finds the whole set: hosts " +
      "learned from the hello, each member's own role read back") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(10), "k",
      "db", "c", setName = "rsdisc", n = 3)
    try {
      val sec = rs.secondaries.head
      val topo = Replica.discover(Seq(("127.0.0.1", sec.port)))
      assert(topo.setName.contains("rsdisc"))
      assert(topo.members.size == 3)
      assert(topo.primary.map(_.address).contains(rs.primary.meAddr))
      assert(topo.secondaries.map(_.address).toSet ==
        rs.secondaries.map(_.meAddr).toSet)
    } finally rs.close()
  }

  test("a member of the WRONG replica set is a loud error, never a " +
      "silent read") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(5), "k",
      "db", "c", setName = "rsa", n = 1)
    try {
      val e = intercept[IllegalArgumentException] {
        Replica.discover(Seq(("127.0.0.1", rs.primary.port)),
          expectSetName = Some("rsb"))
      }
      assert(e.getMessage.contains("rsa") &&
        e.getMessage.contains("rsb"))
    } finally rs.close()
  }

  test("a secondary refuses a bare read with the real code 13435 " +
      "NotPrimaryNoSecondaryOk, and serves it under a non-primary " +
      "$readPreference") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(8), "k",
      "db", "c", n = 2)
    try {
      val sec = rs.secondaries.head
      def find(rp: Option[String]) = {
        val cur = new MongoWire.FindCursor("127.0.0.1", sec.port,
          "db", "c", None, None, None, None, 100,
          readPref = rp.map(m => BDoc(Seq("mode" -> BString(m)))))
        try cur.toVector finally cur.close()
      }
      val e = intercept[MongoWire.ServerError] { find(None) }
      assert(e.code == 13435)
      assert(e.codeName == "NotPrimaryNoSecondaryOk")
      // mode "primary" is NOT a secondaryOk signal either
      val e2 = intercept[MongoWire.ServerError] {
        find(Some("primary"))
      }
      assert(e2.code == 13435)
      assert(find(Some("secondaryPreferred")).size == 8)
    } finally rs.close()
  }

  test("a secondary refuses writes with 10107 NotWritablePrimary") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(3), "k",
      "db", "c", n = 2)
    try {
      val sec = rs.secondaries.head
      val sock = MongoWire.openSocket("127.0.0.1", sec.port, None)
      try {
        val e = intercept[MongoWire.ServerError] {
          MongoWire.insertBatch(sock, "db", "c",
            Seq(BDoc(Seq("k" -> BInt64(100L)))), 1)
        }
        assert(e.code == 10107)
        assert(MongoWire.RetryableCodes(e.code))
      } finally sock.close()
    } finally rs.close()
  }

  test("readpreference=secondary: the scan's rows match, the PRIMARY " +
      "serves zero documents, and the partitions SPREAD across every " +
      "secondary") {
    val df = fixtureDf(40)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 3)
    try {
      val out = readRs(rs, df.schema, "secondary").collect()
      assert(out.length == 40)
      assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 40L))
      assert(rs.primary.stats.servedDocs.get == 0L,
        "a secondary read must never touch the primary — not even " +
          "the key-span probes (metadata reads follow the preference)")
      rs.secondaries.foreach { s =>
        assert(s.stats.servedDocs.get > 0L,
          s"partition spread left ${s.meAddr} idle")
      }
      // 40 data docs + exactly ONE span-probe pair (the scan caches
      // the probed span across planInputPartitions calls), all on
      // secondaries
      assert(rs.secondaries.map(_.stats.servedDocs.get).sum == 42L)
    } finally rs.close()
  }

  test("readpreference=primaryPreferred routes everything to the " +
      "primary when one exists") {
    val df = fixtureDf(12)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 3)
    try {
      val out = readRs(rs, df.schema, "primaryPreferred").collect()
      assert(out.length == 12)
      // 12 data docs + the one span-probe pair, all on the primary
      assert(rs.primary.stats.servedDocs.get == 14L)
      rs.secondaries.foreach(s =>
        assert(s.stats.servedDocs.get == 0L))
    } finally rs.close()
  }

  test("readpreference=secondary against a set with NO secondary is " +
      "a loud selection error; secondaryPreferred falls back to the " +
      "primary") {
    val df = fixtureDf(6)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 1)
    try {
      val e = intercept[Exception] {
        readRs(rs, df.schema, "secondary").collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(chain.contains("readpreference=secondary"))
      val out = readRs(rs, df.schema, "secondaryPreferred").collect()
      assert(out.length == 6)
    } finally rs.close()
  }

  test("nearest selects within the set; a dead first seed is skipped " +
      "during discovery") {
    val df = fixtureDf(10)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 3)
    try {
      // port 1 never listens: discovery must fail past it to the
      // live seeds instead of failing the scan
      val seeds = s"127.0.0.1:1,${rs.seeds}"
      val out = readRs(rs, df.schema, "nearest",
        seeds = Some(seeds)).collect()
      assert(out.length == 10)
    } finally rs.close()
  }

  test("a BLACKHOLED seed (accepts, never replies) costs one bounded " +
      "timeout and lands in the failure list — discovery never hangs " +
      "the plan") {
    val df = fixtureDf(5)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 1)
    // accept-queue only: connects succeed, reads hang forever
    val blackhole = new java.net.ServerSocket(0)
    try {
      val t0 = System.nanoTime()
      val topo = Replica.discover(Seq(
        ("127.0.0.1", blackhole.getLocalPort),
        ("127.0.0.1", rs.primary.port)), helloTimeoutMs = 500)
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(topo.members.size == 1)
      assert(topo.primary.map(_.port).contains(rs.primary.port))
      assert(elapsedMs < 10000,
        s"discovery took ${elapsedMs}ms — the blackholed seed must " +
          "cost one bounded timeout, not a hang")
    } finally {
      blackhole.close()
      rs.close()
    }
  }

  test("discovery with NO reachable seed is a loud error naming the " +
      "failures") {
    val e = intercept[IllegalArgumentException] {
      Replica.discover(Seq(("127.0.0.1", 1)))
    }
    assert(e.getMessage.contains("no replica-set member reachable"))
    assert(e.getMessage.contains("127.0.0.1:1"))
  }

  test("failover write: a step-down between batches costs ONE " +
      "replayed batch on the re-discovered primary — retrywrites=false " +
      "surfaces the 10107 instead") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(0), "k",
      "db", "c", n = 2)
    try {
      val seeds = rs.seeds.split(",").toSeq.map { hp =>
        val i = hp.lastIndexOf(':')
        (hp.substring(0, i), hp.substring(i + 1).toInt)
      }
      val docs1 = (0L until 5L).map(i => BDoc(Seq("k" -> BInt64(i))))
      val docs2 = (5L until 9L).map(i => BDoc(Seq("k" -> BInt64(i))))
      val w = new MongoWire.RetryableWriter("ignored", 0, "db", "c",
        seeds = seeds)
      try {
        assert(w.insert(docs1) == 5L)       // lands on the primary
        val newPrimary = rs.secondaries.head
        rs.stepDownTo(newPrimary)           // election between batches
        assert(w.insert(docs2) == 4L)       // 10107 → re-discover → replay
        assert(rs.primary.meAddr == newPrimary.meAddr)
      } finally w.close()
      // the shared store saw every row exactly once
      val cur = new MongoWire.FindCursor("127.0.0.1",
        rs.primary.port, "db", "c", None, None, None, None, 100,
        readPref = Some(BDoc(Seq(
          "mode" -> BString("primaryPreferred")))))
      try assert(cur.map(_.v.head._2).toVector ==
        (0L until 9L).map(BInt64(_)).toVector)
      finally cur.close()

      // without retryable writes the step-down is the caller's error
      val rs2 = InProcessMongod.serveReplicaSet(fixtureDf(0), "k",
        "db", "c", n = 2)
      try {
        val seeds2 = Seq(("127.0.0.1", rs2.primary.port),
          ("127.0.0.1", rs2.secondaries.head.port))
        val w2 = new MongoWire.RetryableWriter("ignored", 0, "db",
          "c", retryWrites = false, seeds = seeds2)
        try {
          assert(w2.insert(docs1) == 5L)
          rs2.stepDownTo(rs2.secondaries.head)
          val e = intercept[MongoWire.ServerError] { w2.insert(docs2) }
          assert(e.code == 10107)
        } finally w2.close()
      } finally rs2.close()
    } finally rs.close()
  }

  test("writer topology discovery is CACHED JVM-wide: a second " +
      "writer against the same seeds opens straight to the known " +
      "primary with NO per-member hello sweep (a 10k-partition " +
      "write must not pay 10k discoveries), and the shared store " +
      "still sees every row") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(0), "k",
      "db", "c", n = 2)
    try {
      val seeds = rs.seeds.split(",").toSeq.map { hp =>
        val i = hp.lastIndexOf(':')
        (hp.substring(0, i), hp.substring(i + 1).toInt)
      }
      val docs1 = (0L until 3L).map(i => BDoc(Seq("k" -> BInt64(i))))
      val docs2 = (3L until 6L).map(i => BDoc(Seq("k" -> BInt64(i))))
      val w1 = new MongoWire.RetryableWriter("ignored", 0, "db", "c",
        seeds = seeds)
      try assert(w1.insert(docs1) == 3L) finally w1.close()
      val sec = rs.secondaries.head
      val before = sec.stats.commands.get
      val w2 = new MongoWire.RetryableWriter("ignored", 0, "db", "c",
        seeds = seeds)
      try assert(w2.insert(docs2) == 3L) finally w2.close()
      assert(sec.stats.commands.get == before,
        "the second writer must hit the topology cache — zero " +
          "commands (no discovery hello) on the secondary")
      assert(MongoWire.countDocs("127.0.0.1", rs.primary.port,
        "db", "c") == 6L)
    } finally rs.close()
  }

  test("session records are SHARED across members (the replicated " +
      "sessions collection): a (lsid, txnNumber) recorded before a " +
      "step-down replays as the recorded ack on the NEW primary, " +
      "never a second apply") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(0), "k",
      "db", "c", n = 2)
    try {
      val lsid = Array.tabulate[Byte](16)(_.toByte)
      val docs = Seq(BDoc(Seq("k" -> BInt64(7L))))
      val p0 = MongoWire.openSocket("127.0.0.1", rs.primary.port, None)
      try assert(MongoWire.insertBatch(p0, "db", "c", docs, 1,
        session = Some((lsid, 1L))) == 1L)
      finally p0.close()
      val next = rs.secondaries.head
      rs.stepDownTo(next)
      val p1 = MongoWire.openSocket("127.0.0.1", next.port, None)
      try assert(MongoWire.insertBatch(p1, "db", "c", docs, 2,
        session = Some((lsid, 1L))) == 1L)   // the RECORDED ack
      finally p1.close()
      assert(MongoWire.countDocs("127.0.0.1", next.port, "db", "c",
        readPref = Some(BDoc(Seq(
          "mode" -> BString("primaryPreferred"))))) == 1L,
        "the replay must not re-apply")
    } finally rs.close()
  }

  test("replica hello: role fields flip on step-down with no restart") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(1), "k",
      "db", "c", setName = "rsflip", n = 2)
    try {
      def role(port: Int): (Boolean, Boolean, String) = {
        val h = MongoWire.hello("127.0.0.1", port)
        (h.v.collectFirst { case ("isWritablePrimary", BBool(b)) => b }
          .get,
          h.v.collectFirst { case ("secondary", BBool(b)) => b }.get,
          h.v.collectFirst { case ("primary", BString(s)) => s }.get)
      }
      val first = rs.primary
      val second = rs.secondaries.head
      assert(role(first.port) == (true, false, first.meAddr))
      assert(role(second.port) == (false, true, first.meAddr))
      rs.stepDownTo(second)
      assert(role(first.port) == (false, true, second.meAddr))
      assert(role(second.port) == (true, false, second.meAddr))
    } finally rs.close()
  }

  test("authenticated replica scan: SCRAM on every member, secondary " +
      "routing unchanged") {
    val df = fixtureDf(9)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 2)
    try {
      rs.requireAuth("analyst", "pw")
      val out = spark.read.format("graft-mongo")
        .schema(df.schema)
        .option("host", rs.seeds)
        .option("database", "db").option("collection", "c")
        .option("keyfield", "k").option("numpartitions", "3")
        .option("readpreference", "secondary")
        .option("user", "analyst").option("password", "pw")
        .load().collect()
      assert(out.length == 9)
      assert(rs.primary.stats.servedDocs.get == 0L)
    } finally rs.close()
  }

  test("tag sets: readpreferencetags routes the scan to ONLY the " +
      "matching secondaries (the analytics-node story); ordered " +
      "fallback sets and the trailing empty set follow the public " +
      "first-match rule") {
    val df = fixtureDf(20)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 3)
    try {
      val Seq(secA, secB) = rs.secondaries.toSeq
      secA.setMemberTags(Map("nodeType" -> "ANALYTICS", "dc" -> "east"))
      secB.setMemberTags(Map("dc" -> "west"))
      def scan(tags: String): Long = {
        val before =
          rs.members.map(m => m.meAddr -> m.stats.servedDocs.get).toMap
        val out = spark.read.format("graft-mongo")
          .schema(df.schema)
          .option("host", rs.seeds)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k").option("numpartitions", "4")
          .option("readpreference", "secondary")
          .option("readpreferencetags", tags)
          .load().collect()
        assert(out.length == 20)
        // docs served by members OUTSIDE the expected target set
        rs.members.map(m =>
          m.stats.servedDocs.get - before(m.meAddr))
          .zip(rs.members).collect {
            case (d, m) if m.meAddr != secA.meAddr => d
          }.sum
      }
      // only the ANALYTICS-tagged secondary is eligible: everyone
      // else (primary + the west secondary) serves zero
      assert(scan("nodeType:ANALYTICS") == 0L)
      // first set matches nobody -> fall through to the second
      assert(scan("nodeType:NOSUCH;nodeType:ANALYTICS") == 0L)
      // trailing empty set = match-anything fallback: both
      // secondaries share the scan again
      val spill = scan("nodeType:NOSUCH;")
      assert(spill > 0L,
        "the empty fallback set must re-admit the untagged secondary")
      // no set matches and no fallback: loud, names the tags
      val e = intercept[Exception] {
        scan("nodeType:NOSUCH")
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(chain.contains("nodeType:NOSUCH"))
      assert(rs.primary.stats.servedDocs.get == 0L,
        "no tag-set arm may ever touch the primary under secondary")
    } finally rs.close()
  }

  test("tag sets with readpreference=primary are a loud option " +
      "error (the public drivers rule), and a malformed pair is " +
      "refused") {
    val rs = InProcessMongod.serveReplicaSet(fixtureDf(3), "k",
      "db", "c", n = 1)
    try {
      val e = intercept[Exception] {
        spark.read.format("graft-mongo")
          .schema(fixtureDf(1).schema)
          .option("host", rs.seeds)
          .option("database", "db").option("collection", "c")
          .option("keyfield", "k")
          .option("readpreferencetags", "dc:east")
          .load().collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(chain.contains("non-primary"))
      intercept[IllegalArgumentException] {
        Replica.parseTagSets("dceast")
      }
      // shapes that must parse
      assert(Replica.parseTagSets("a:1,b:2;a:1;") ==
        Seq(Map("a" -> "1", "b" -> "2"), Map("a" -> "1"),
          Map.empty[String, String]))
    } finally rs.close()
  }

  test("catalog over a seed list: port option absent, listTables and " +
      "table reads route by the catalog's read preference — the " +
      "primary serves zero documents") {
    val df = fixtureDf(15)
    val rs = InProcessMongod.serveReplicaSet(df, "k", "db", "c", n = 3)
    val cat = s"rscat${rs.primary.port}"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.MongoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.host", rs.seeds)
      spark.conf.set(s"spark.sql.catalog.$cat.database", "db")
      spark.conf.set(s"spark.sql.catalog.$cat.keyfield", "k")
      spark.conf.set(s"spark.sql.catalog.$cat.readpreference",
        "secondary")
      spark.conf.set(s"spark.sql.catalog.$cat.replicaset", "rs0")
      val tables = spark.sql(s"SHOW TABLES IN $cat.db").collect()
      assert(tables.map(_.getString(1)).toSet == Set("c"))
      val out = spark.sql(s"SELECT k FROM $cat.db.c").collect()
      assert(out.length == 15)
      assert(rs.primary.stats.servedDocs.get == 0L,
        "a secondary-preference catalog must keep schema inference, " +
          "span probes, and the scan itself off the primary")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      rs.close()
    }
  }
}
