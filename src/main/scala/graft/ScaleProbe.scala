package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Curation, Similarity}
import graft.sources.Tables

/** Dev-only scaling probe (NOT part of the driver contract): times the
  * `semantic_keep_best` pipeline over its two LSH configuration
  * policies on a given sf dir —
  *
  *   fixed: embeddingNearDups(threshold=0.5, tables=16, planes=6),
  *          the declared-oracle configuration
  *   auto:  embeddingNearDupsAuto(threshold=0.5, tables=16, occ=32),
  *          the occupancy-scaled at-scale policy
  *
  * and prints wall seconds + pair/group/keep counts for each, so
  * SCALE.md's superlinearity claim about fixed-depth LSH is measured,
  * not argued. Usage:
  *
  *   sbt "runMain graft.ScaleProbe /root/repo/scale-data/sf1"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val docs = Tables.load(spark, sfDir, "documents")
    val n = e.count()
    println(s"n_vectors=$n autoPlanes=${Similarity.autoPlanes(n)}")

    def run(tag: String)(pairs: => org.apache.spark.sql.DataFrame)
        : Unit = {
      val t0 = System.nanoTime()
      val p = pairs
      val nPairs = p.count()
      val kept = Curation.semanticKeepBest(p, docs)
      val nKept = kept.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-6s pairs=$nPairs%-8d groups_kept=$nKept%-6d " +
        f"wall=$secs%.1fs")
      graft.util.Utils.clearStaging(Some(spark))
      spark.catalog.clearCache()
    }
    run("fixed")(Similarity.embeddingNearDups(e, threshold = 0.5,
      tables = 16, planesPerTable = 6))
    run("auto")(Similarity.embeddingNearDupsAuto(e, threshold = 0.5,
      tables = 16))
    spark.stop()
  }
}
