package graft.util

import java.net.URLEncoder

/** Driver-side utilities mirroring the reference's shared helpers
  * (SURVEY §2.6 F5-F7): connection-URI assembly/redaction and
  * human-readable byte formatting.
  */
object Utils {

  /** Spread a small-scan DataFrame across the session's parallelism
    * before CPU-heavy per-row work. A single-row-group parquet file
    * reads as ONE task whatever `local[n]` / the cluster size says,
    * serializing hash/flatten projections on one core. At real scale
    * (many files, many row groups) scan parallelism is already ≥ the
    * session default and this is a no-op — the guard keeps the
    * round-robin shuffle from ever touching big inputs.
    */
  def spread(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    if (sys.props.get("graft.spread").contains("off")) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** Materialize a branch point to parquet and read it back — the
    * multi-consumer handoff that leaves NO cached RDD behind.
    * `persist()` at a branch point holds executor memory until
    * someone remembers to unpersist, and a library callee has no safe
    * point to do that (its consumers materialize after it returns);
    * staging to storage is the production-pipeline shape instead —
    * Spark's own reliable `checkpoint()` is the same idea. The write
    * is one sequential pass sized by the branch-point data (usually a
    * small survivor set, not the corpus); consumers then share the
    * files with full column pruning / predicate pushdown, which a
    * block cache cannot offer. `dir` defaults to a JVM temp dir —
    * at cluster scale pass a durable path (HDFS/object store); the
    * caller owns the files' lifetime, exactly as with Spark
    * checkpoint dirs.
    */
  def stage(df: org.apache.spark.sql.DataFrame, tag: String,
            dir: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    val base = dir.getOrElse {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_stage_$tag").toString
      staged.add(d)
      d
    }
    val path = if (dir.isDefined) s"$base/$tag" else base
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  // every auto-created staging dir, so a long-lived session can
  // reclaim disk (the counterpart of clearCache() for the
  // persist->stage migration); swept at JVM exit as a backstop
  private val staged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  sys.addShutdownHook(clearStaging())

  /** Delete every temp staging dir [[stage]] has auto-created in this
    * JVM. Call between logical queries, AFTER their results
    * materialize — a plan still referencing a staged file fails once
    * its backing dir is gone (the same contract as unpersisting a
    * checkpoint: release only what nothing reads anymore).
    * Caller-provided `dir`s are never touched.
    */
  def clearStaging(): Unit = {
    val it = staged.iterator()
    while (it.hasNext) {
      val d = java.nio.file.Paths.get(it.next()); it.remove()
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: java.io.IOException => () }
    }
  }

  /** F5: MongoDB-style URI assembly with percent-escaped credentials
    * (`core/shared.py:17-32`).
    */
  def buildMongoUri(host: String, port: Int,
                    user: Option[String] = None,
                    password: Option[String] = None,
                    params: Map[String, String] = Map.empty): String = {
    def q(s: String) = URLEncoder.encode(s, "UTF-8")
    val auth = (user, password) match {
      case (Some(u), Some(p)) => s"${q(u)}:${q(p)}@"
      case (Some(u), None)    => s"${q(u)}@"
      case _                  => ""
    }
    val qs =
      if (params.isEmpty) ""
      else params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}=${q(v)}" }.mkString("?", "&", "")
    s"mongodb://$auth$host:$port/$qs"
  }

  /** F6: mask the password in a connection URI for logs
    * (`core/shared.py:35-52`).
    */
  def redactUriPassword(uri: String): String =
    uri.replaceAll("(//[^/@:]+):[^/@]+@", "$1:********@")

  /** F7: human bytes with log-1024 bucketing
    * (`views/db_connection_view.py:676-699`).
    */
  def formatBytes(n: Long): String = {
    val units = Seq("B", "KB", "MB", "GB", "TB", "PB", "EB")
    if (n <= 0) return s"$n B"
    val i = math.min((math.log(n.toDouble) / math.log(1024)).toInt,
      units.size - 1)
    val v = n / math.pow(1024, i)
    if (i == 0) s"$n B" else f"$v%.1f ${units(i)}"
  }
}
