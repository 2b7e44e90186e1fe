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
    * block cache cannot offer.
    *
    * NOTE the write runs EAGERLY, at call time — every operator built
    * on stage() (curateModern, decontaminateBloomAgainst, q15, rfm,
    * connectedGroups) executes its upstream pipeline when constructed,
    * not when the caller first materializes the result. That is the
    * price of the no-orphaned-cache guarantee; plan-only inspection
    * should use the operators' unstaged building blocks.
    *
    * Base-dir resolution, in order: the explicit `dir` argument; the
    * session conf `graft.staging.dir`; the session's Spark checkpoint
    * dir; else a JVM-local temp dir. The local default is
    * LOCAL-MASTER-ONLY and enforced: on a multi-node master, executor
    * tasks would write `file://` output to their own nodes and the
    * driver's read-back would silently see a subset of partitions —
    * wrong results, not an error — so stage() fails fast instead and
    * tells the caller which conf to set. Resolved (non-temp) base
    * dirs get a unique subdir per call (`tag_<seq>`) so two stagings
    * of the same tag never overwrite files a live plan still reads;
    * the caller owns those files' lifetime, exactly as with Spark
    * checkpoint dirs.
    */
  def stage(df: org.apache.spark.sql.DataFrame, tag: String,
            dir: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val base = dir
      .orElse(spark.conf.getOption("graft.staging.dir"))
      .orElse(spark.sparkContext.getCheckpointDir)
    val path = base match {
      case Some(b) =>
        s"${b.stripSuffix("/")}/${tag}_${stageSeq.incrementAndGet()}"
      case None =>
        val master = spark.sparkContext.master
        require(master.startsWith("local"),
          s"graft staging: no shared staging dir configured and " +
            s"master is '$master'. A JVM-local temp default only " +
            "works in local mode — executors on other nodes would " +
            "write partitions the driver cannot read back. Set the " +
            "session conf graft.staging.dir (or a Spark checkpoint " +
            "dir) to an HDFS/object-store path.")
        val d = java.nio.file.Files
          .createTempDirectory(s"graft_stage_$tag").toString
        staged.put(d, sessionKey(spark))
        d
    }
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  // every auto-created staging dir, keyed by the owning SparkSession,
  // so a long-lived session can reclaim disk (the counterpart of
  // clearCache() for the persist->stage migration) without deleting
  // files another session's still-lazy plans read; swept at JVM exit
  // as a backstop
  /** A JVM-local temp dir REGISTERED with the staging sweeper, so
    * [[clearStaging]] (and the exit hook) reclaim it exactly like
    * [[stage]]'s auto-created dirs — for small session-scoped
    * artifacts (tokenizer exports) whose default home is a temp path.
    * The caller must fully CONSUME the artifact before the next
    * clearStaging point (the stage() contract); production callers
    * pass their own durable dir and own its lifetime instead.
    */
  def registeredTempDir(tag: String,
                        spark: org.apache.spark.sql.SparkSession)
      : String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_$tag").toString
    staged.put(d, sessionKey(spark))
    d
  }

  private val staged = new java.util.concurrent.ConcurrentHashMap[
    String, String]()
  private val stageSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    System.identityHashCode(s).toString
  sys.addShutdownHook(clearStaging())

  /** Delete temp staging dirs [[stage]] has auto-created in this JVM —
    * all of them, or (pass `owner`) only the given session's, leaving
    * other sessions' still-referenced files alone. Call between
    * logical queries, AFTER their results materialize — a plan still
    * referencing a staged file fails once its backing dir is gone (the
    * same contract as unpersisting a checkpoint: release only what
    * nothing reads anymore). Caller-provided / conf-resolved `dir`s
    * are never touched.
    */
  def clearStaging(
      owner: Option[org.apache.spark.sql.SparkSession] = None): Unit = {
    val key = owner.map(sessionKey)
    val it = staged.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (key.forall(_ == e.getValue)) {
        val d = java.nio.file.Paths.get(e.getKey); it.remove()
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }
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
