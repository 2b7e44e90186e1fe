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

  private implicit class PairsOps(s: Seq[(Long, Long)]) {
    def toDf(sp: org.apache.spark.sql.SparkSession)
        : org.apache.spark.sql.DataFrame = {
      import sp.implicits._
      s.toDF("id1", "id2")
    }
  }
}
