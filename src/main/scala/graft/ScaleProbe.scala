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

    // structural work metric, independent of VM noise: Σ_buckets
    // occ·(occ−1)/2 — the candidate cosines the bucket join must score
    def candidates(planes: Int): Long = {
      import org.apache.spark.sql.functions.{col, explode, expr, sum}
      e.select(explode(Similarity.lshTables(col("embedding"), 16,
          planes, 64)).as("tb"))
        .groupBy(col("tb.tbl"), col("tb.bucket"))
        .agg(expr("count(*) AS occ"))
        .agg(sum(expr("(occ * (occ - 1)) div 2")).as("c"))
        .collect()(0).getLong(0)
    }
    println(s"candidates fixed(6)=${candidates(6)} " +
      s"auto(${Similarity.autoPlanes(n)})=" +
      s"${candidates(Similarity.autoPlanes(n))}")

    // min-of-2 per variant with a GC between, like Bench: run order
    // must not decide the compare (the first run pays JIT + page-cache
    // warmup that has nothing to do with either policy)
    def run(tag: String)(pairs: => org.apache.spark.sql.DataFrame)
        : Unit = {
      val times = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val p = pairs
        val nPairs = p.count()
        val tPairs = (System.nanoTime() - t0) / 1e9
        val nKept = Curation.semanticKeepBest(p, docs).count()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.util.Utils.clearStaging(Some(spark))
        spark.catalog.clearCache()
        (secs, tPairs, nPairs, nKept)
      }
      val (secs, tPairs, nPairs, nKept) = times.minBy(_._1)
      println(f"$tag%-6s pairs=$nPairs%-8d groups_kept=$nKept%-6d " +
        f"pairs_stage=$tPairs%.1fs wall=$secs%.1fs")
    }
    run("fixed")(Similarity.embeddingNearDups(e, threshold = 0.5,
      tables = 16, planesPerTable = 6))
    run("auto")(Similarity.embeddingNearDupsAuto(e, threshold = 0.5,
      tables = 16))
    spark.stop()
  }
}
