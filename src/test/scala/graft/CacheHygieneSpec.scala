package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{Curation, Dedup, Relational}
import graft.sources.Tables

/** Cache-lifetime audit for the operators that run their OWN actions
  * (eager summaries / Bloom collects / CC rounds): having an action
  * inside the call gives them a safe release point, so unlike the
  * lazily-returned near-dup plans they must leave NO cached RDD or
  * checkpoint block behind once their result materializes — a library
  * consumer in a long-lived session should not have to clearCache()
  * after them.
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  private def withCleanCache[A](body: => A): A = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    body
  }

  private def cachedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("funnel leaves no cached RDDs after its summaries materialize") {
    withCleanCache {
      val ev = Tables.load(spark, dir, "events")
      val out = Relational.funnel(ev,
        Seq("login", "search", "purchase")).collect()
      assert(out.nonEmpty)
      assert(cachedCount == 0,
        s"funnel left $cachedCount cached RDDs behind")
    }
  }

  test("curateModern leaves no cached RDDs — branch point is staged " +
      "to parquet, not persisted") {
    withCleanCache {
      val docs = Tables.load(spark, dir, "documents")
      val out = Curation.curateModern(docs).collect()
      assert(out.nonEmpty)
      assert(cachedCount == 0,
        s"curateModern left $cachedCount cached RDDs behind")
    }
  }

  test("q15 and rfm leave no cached RDDs — their shared views are " +
      "staged, not persisted") {
    withCleanCache {
      assert(Relational.q15(spark, dir).collect().nonEmpty)
      val ev = Tables.load(spark, dir, "events")
      assert(Relational.rfm(ev).collect().nonEmpty)
      assert(cachedCount == 0,
        s"q15/rfm left $cachedCount cached RDDs behind")
    }
  }

  test("connectedGroups (distributed path) releases every round's " +
      "checkpoint blocks and the staged labels back the result") {
    withCleanCache {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
        (12L, 13L), (20L, 21L))
        .toDf(spark)
      val out = Dedup.connectedGroups(pairs, localEdgeLimit = 0L)
      val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(3L) == 1L && rows(13L) == 10L && rows(21L) == 20L)
      assert(cachedCount == 0,
        s"connectedGroups left $cachedCount cached RDDs behind")
    }
  }

  test("stage(): clearStaging deletes every auto-created temp dir " +
      "(the disk-side counterpart of the cache sweep)") {
    val staged = graft.util.Utils.stage(
      spark.range(10).toDF("id"), "spec_probe")
    assert(staged.count() == 10)
    val dir = new java.io.File(
      new java.net.URI(staged.inputFiles.head)).getParentFile
    assert(dir.exists)
    graft.util.Utils.clearStaging()
    assert(!dir.exists,
      s"staging dir $dir survived clearStaging()")
  }

  test("stage(): graft.staging.dir conf wins over the temp default, " +
      "each call gets a unique subdir, and conf-resolved dirs are " +
      "never swept by clearStaging") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_conf_stage").toString
    spark.conf.set("graft.staging.dir", base)
    try {
      val a = graft.util.Utils.stage(spark.range(5).toDF("id"), "probe")
      val b = graft.util.Utils.stage(spark.range(7).toDF("id"), "probe")
      assert(a.count() == 5 && b.count() == 7)
      val dirs = (a.inputFiles ++ b.inputFiles)
        .map(f => new java.io.File(new java.net.URI(f)).getParent).distinct
      assert(dirs.length == 2, s"same-tag stagings collided: $dirs")
      assert(dirs.forall(_.startsWith(base)),
        s"staging ignored graft.staging.dir: $dirs")
      graft.util.Utils.clearStaging()
      assert(dirs.forall(d => new java.io.File(d).exists),
        "clearStaging swept a conf-resolved (caller-owned) dir")
    } finally {
      spark.conf.unset("graft.staging.dir")
      val p = java.nio.file.Paths.get(base)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("clearStaging(owner): sweeps only the named session's temp " +
      "dirs, leaving other sessions' staged files readable") {
    val other = spark.newSession()
    val mine = graft.util.Utils.stage(
      spark.range(3).toDF("id"), "owner_probe")
    val theirs = graft.util.Utils.stage(
      other.range(4).toDF("id"), "owner_probe")
    def dirOf(df: org.apache.spark.sql.DataFrame) = new java.io.File(
      new java.net.URI(df.inputFiles.head)).getParentFile
    val mineDir = dirOf(mine); val theirsDir = dirOf(theirs)
    graft.util.Utils.clearStaging(Some(spark))
    assert(!mineDir.exists, "owner sweep missed the owned dir")
    assert(theirsDir.exists && theirs.count() == 4,
      "owner sweep deleted another session's staged files")
    graft.util.Utils.clearStaging(Some(other))
    assert(!theirsDir.exists)
  }

  private implicit class PairsOps(s: Seq[(Long, Long)]) {
    def toDf(sp: org.apache.spark.sql.SparkSession)
        : org.apache.spark.sql.DataFrame = {
      import sp.implicits._
      s.toDF("id1", "id2")
    }
  }
}
