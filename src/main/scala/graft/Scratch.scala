package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf-investigation harness (not part of the library
  * surface): times bench hotspot queries cold at a given SF dir.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hot = Seq("dedup_jaccard_pairs", "dedup_simhash_pairs",
      "dedup_minhash_pairs", "catalog_schema", "profile_fast_lineitem",
      "profile_full_events", "embedding_near_dups", "ann_lsh_topk",
      "profile_stats_lineitem", "profile_quantiles_lineitem",
      "collection_stats")
    hot.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      System.gc()
      println(f"HOT $name%-26s ${times.map(_._1).min}%8.2f s  rows=${times.head._2}")
    }
    spark.stop()
  }
}
