package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf-investigation harness (not part of the library
  * surface): times bench hotspot queries cold at a given SF dir.
  */
object Scratch {

  private def session(extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIME $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("hot")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    mode match {
      case "hot"     => hot(sfDir)
      case "stats"   => stats(sfDir)
      case "minhash" => minhash(sfDir)
      case _         => sys.error(s"unknown mode $mode")
    }
  }

  private def hot(sfDir: String): Unit = {
    val spark = session()
    val hot = Seq("dedup_minhash_pairs", "profile_stats_lineitem",
      "profile_quantiles_lineitem", "ann_lsh_topk", "profile_types_events",
      "collection_stats", "dedup_exact_groups", "dedup_simhash",
      "text_profile", "sessionize")
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

  /** profileStats variants: spread on vs off vs no-sort repartition. */
  private def stats(sfDir: String): Unit = {
    val spark = session()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (1 to 2).foreach { i =>
      sys.props.remove("graft.spread")
      time(s"stats spread=on  #$i") {
        graft.operators.Profiler.profileStats(li).count()
      }
      sys.props("graft.spread") = "off"
      time(s"stats spread=off #$i") {
        graft.operators.Profiler.profileStats(li).count()
      }
      sys.props.remove("graft.spread")
      spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
      time(s"stats spread=on nosort #$i") {
        graft.operators.Profiler.profileStats(li).count()
      }
      spark.conf.set("spark.sql.execution.sortBeforeRepartition", "true")
    }
    spark.stop()
  }

  /** minhashNearDups stage breakdown on documents. */
  private def minhash(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    import graft.operators.TextAnalysis.shingles
    val spark = session()
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val numHashes = 8; val bands = 4; val nMd5 = 2
    val ex = graft.util.Utils.spread(df).select(col("doc_id").as("id"),
      explode(array_distinct(shingles(col("text")))).as("x"))
    time("explode+distinct shingles")(ex.count())
    val hashed = ex.select(col("id") +: xxhash64(col("x")).as("hx") +:
      (0 until nMd5).map(g =>
        md5(concat(lit(s"$g:"), col("x"))).as(s"h$g")): _*)
    val mins = (0 until numHashes).map { j =>
      min(substring(col(s"h${j / 4}"), (j % 4) * 8 + 1, 8)).as(s"m$j")
    }
    val sigd = hashed.groupBy("id")
      .agg(mins.head, (mins.tail :+ collect_list(col("hx")).as("hs")): _*)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"),
        col("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sigd materialize")(sigd.count())
    val bandsDf = graft.operators.Dedup.minhashBands(
      sigd.select(col("id"), col("sig")), numHashes, bands)
    val bounded = bandsDf.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_key")))
      .filter(col("bucket_n") <= 1000)
    val l = bounded.select(col("band_idx"), col("band_key"),
      col("id").as("id1"))
    val rr = bounded.select(col("band_idx"), col("band_key"),
      col("id").as("id2"))
    val cands = l.join(rr, Seq("band_idx", "band_key"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    time("cands")(cands.count())
    val sets = sigd.select(col("id").as("sid"), col("hs"))
    val out = cands
      .join(sets.withColumnRenamed("sid", "id1")
        .withColumnRenamed("hs", "hs1"), Seq("id1"))
      .join(sets.withColumnRenamed("sid", "id2")
        .withColumnRenamed("hs", "hs2"), Seq("id2"))
      .withColumn("shared", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard", round(col("shared").cast("double") /
        (size(col("hs1")) + size(col("hs2")) - col("shared")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
    time("verify+filter")(out.count())
    time("full operator cold") {
      spark.catalog.clearCache()
      graft.operators.Dedup.minhashNearDups(df).count()
    }
    spark.stop()
  }
}
