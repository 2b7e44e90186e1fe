package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Datasketches HLL via Spark's
  * `hll_sketch_agg` family) — the incremental-distinct pattern a
  * 100 TB pipeline runs on: sketch each ingest slice ONCE into a tiny
  * staging table (one binary column per group), then answer any
  * coarser rollup — per week, per source, global — by merging sketches
  * without ever rescanning the raw data. Re-aggregating exact
  * distincts at that scale re-shuffles the corpus per question;
  * merging sketches shuffles kilobytes.
  *
  * Estimates are implementation-defined (like the profiler's HLL
  * mode), so gates hash the deterministic columns and bound the
  * estimate against the exact count — see `hll_rollup_events`.
  */
object Sketches {

  /** The staging table: one row per group with an HLL sketch of
    * `target`, plus the exact row count (exact counts ARE mergeable —
    * sums — so they ride along). lgK = 12 ⇒ ~1.6 % standard error,
    * 2–4 KB per sketch dense.
    */
  def sketchTable(df: DataFrame, groups: Seq[String], target: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(hll_sketch_agg(col(target), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Roll a sketch table up to a coarser grouping by merging sketches
    * — no raw data touched. Empty `groups` = the global rollup.
    */
  def rollup(sketches: DataFrame, groups: Seq[String]): DataFrame = {
    val agg = sketches.groupBy(groups.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
          .as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))
    if (groups.isEmpty) agg else agg.orderBy(groups.map(col): _*)
  }

  /** The QUANTILE twin of [[sketchTable]]: per group, an exact
    * fixed-range equi-width bin-count array over `target` — the
    * mergeable percentile structure (merge = element-wise sum, an
    * exact integer operation, so unlike HLL every output column is
    * hashable cross-engine). `lo`/`hi` fix the domain up front (at
    * scale you know it, or one tiny range pass finds it); values clamp
    * into the edge bins, the t-digest trade made deterministic.
    * Estimate error is bounded by the bin width — choose `bins` for
    * the resolution the consumer needs (1024 bins ⇒ ~0.1 % of range).
    *
    * Each row carries its binning contract — literal `bins`/`lo`/`hi`
    * columns — so a later rollup can verify it merges sketches built
    * against the SAME domain, not just arrays of the same length
    * (equal widths over different ranges would merge into plausible
    * but wrong estimates).
    */
  def binSketch(df: DataFrame, groups: Seq[String], target: String,
                bins: Int = 256, lo: Double, hi: Double): DataFrame = {
    require(hi > lo, "need a non-empty value range")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(target) - lo) / w).cast("long"), lit(0L)),
      lit(bins - 1L))
    val counts = df.filter(col(target).isNotNull)
      .groupBy((groups.map(col) :+ bin.as("_bin")): _*)
      .agg(count(lit(1)).as("_c"))
    counts.groupBy(groups.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("_bin"), col("_c"))))
        .as("_m"))
      .select((groups.map(col) :+
        transform(sequence(lit(0L), lit(bins - 1L)),
          i => coalesce(element_at(col("_m"), i), lit(0L)))
          .as("bin_counts") :+
        lit(bins).as("bins") :+ lit(lo).as("lo") :+ lit(hi).as("hi")): _*)
  }

  /** Merge bin sketches to a coarser grouping and answer quantiles by
    * the cumulative bin walk — no raw data touched, exact integer
    * merge, deterministic midpoint estimates. For each q: the target
    * 0-based rank is `floor(q·(N−1) + 0.5)` and its bin is the one
    * whose inclusive cumulative count first exceeds the rank; the
    * estimate is that bin's midpoint (one shared double expression —
    * engine-reproducible). Returns one row per (group, q):
    * (groups…, q, bin_idx, est, n_rows). A group whose merged counts
    * are all zero (reachable: a streamed window whose events all
    * carried NULL targets) is NOT dropped — it emits its (group, q)
    * rows with NULL `bin_idx`/`est` and `n_rows` 0, so consumers can
    * tell "no data" from "group missing".
    */
  def quantileRollup(sketches: DataFrame, groups: Seq[String],
                     qs: Seq[Double], bins: Int = 256,
                     lo: Double, hi: Double): DataFrame = {
    val w = (hi - lo) / bins
    // merge-only: explode bin positions, sum counts per (group, bin).
    // The shuffle is groups × bins rows of longs — kilobytes.
    // a sketch built with a different bin count OR a different value
    // domain would yield numerically plausible but WRONG estimates —
    // fail loudly on either. Sketch tables from binSketch /
    // binSketchStream carry their (bins, lo, hi) contract as columns;
    // a bare (groups, bin_counts) table is still accepted with the
    // width-only check, the caller vouching for the domain.
    val hasContract = Seq("bins", "lo", "hi")
      .forall(sketches.columns.contains)
    val contractChk =
      if (hasContract)
        assert_true(size(col("bin_counts")) === bins &&
          col("bins") === bins && col("lo") === lo && col("hi") === hi,
          lit(s"bin sketch contract mismatch: rollup expects " +
            s"($bins bins over [$lo,$hi))"))
      else
        assert_true(size(col("bin_counts")) === bins,
          lit(s"bin sketch width mismatch: expected $bins bins"))
    // the check rides INSIDE the summed column (assert_true is NULL on
    // pass, so the coalesce adds 0) — a free-standing projected-then-
    // dropped check column would be pruned by the optimizer and never
    // evaluated
    val merged = sketches
      .select((groups.map(col) :+ col("bin_counts") :+
        contractChk.as("_chk")): _*)
      .select((groups.map(col) :+ col("_chk") :+
        posexplode(col("bin_counts")).as(Seq("bin_idx", "cnt"))): _*)
      .groupBy((groups.map(col) :+ col("bin_idx")): _*)
      .agg(sum(col("cnt") +
        coalesce(col("_chk").cast("long"), lit(0L))).as("cnt"))
    val gw = org.apache.spark.sql.expressions.Window
      .partitionBy(groups.map(col): _*).orderBy(col("bin_idx").asc)
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(gw))
      .withColumn("n_rows", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groups.map(col): _*)))
    val qdf = broadcast(
      sketches.sparkSession.createDataFrame(
        qs.map(Tuple1(_))).toDF("q"))
    val nonEmpty = cum.filter(col("n_rows") > 0).join(qdf)
      .withColumn("_rank",
        floor(col("q") * (col("n_rows") - 1) + 0.5).cast("long"))
      // exactly the bin whose inclusive cumsum first passes the rank
      .filter(col("cum") > col("_rank") &&
        col("cum") - col("cnt") <= col("_rank"))
      .select((groups.map(col) ++ Seq(col("q"),
        col("bin_idx").cast("long").as("bin_idx"),
        (lit(lo) + (col("bin_idx") + 0.5) * w).as("est"),
        col("n_rows"))): _*)
    // all-zero groups: no bin can pass any rank, so surface them
    // explicitly rather than letting the walk silently drop them
    val empty = cum.filter(col("n_rows") === 0)
      .select(groups.map(col): _*).distinct().join(qdf)
      .select((groups.map(col) ++ Seq(col("q"),
        lit(null).cast("long").as("bin_idx"),
        lit(null).cast("double").as("est"),
        lit(0L).as("n_rows"))): _*)
    nonEmpty.unionByName(empty)
      .orderBy((groups.map(col) :+ col("q")): _*)
  }

  /** Two-pass heavy hitters: report every `key` value whose share of
    * the corpus is at least 1/k, with its EXACT count and integer-ppm
    * share. Pass 1 proposes candidates with a bounded Misra-Gries
    * summary (capacity k·slack, so any key with share > 1/(k·slack+1)
    * provably survives — a strict superset of the reported set); pass
    * 2 broadcast-joins the ≤ k·slack candidates back and counts them
    * exactly. The output is fully deterministic even though the raw
    * summary is partitioning-dependent: extra candidates are filtered
    * by their exact counts, missing ones are impossible by the MG
    * guarantee.
    *
    * The 100 TB point: a plain `groupBy(key).count` shuffles every
    * distinct key — at web-corpus token cardinality, a shuffle the
    * size of the vocabulary per question. This plan shuffles one
    * ≤ (cap × counter) summary per partition (pass 1) and only
    * candidate-key rows (pass 2, semi-join against a broadcast list),
    * the frequent-items analogue of the HLL staging tables above.
    */
  def heavyHitters(df: DataFrame, key: String, k: Int,
                   slack: Int = 4): DataFrame = {
    require(k >= 2 && slack >= 2, "need k >= 2 and slack >= 2")
    // exactly two corpus passes: the MG row carries n, so the verify
    // pass needs no separate total-count scan
    val mg = df.select(graft.functions.FreqSketch
      .misraGries(col(key), k * slack).as("mg"))
    val cand = broadcast(
      mg.select(col("mg.n").as("_n"),
        explode(col("mg.keys")).as(key)))
    df.select(col(key)).join(cand, Seq(key))
      .groupBy(col(key), col("_n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= col("_n"))
      .select(col(key), col("cnt"),
        expr("cnt * 1000000 DIV _n").as("share_ppm"))
      .orderBy(col("cnt").desc, col(key).asc)
  }

  /** Kolmogorov–Smirnov-style distribution-shift audit between two
    * frames over one numeric column — "is my sample / new snapshot /
    * other split length-biased?", the train-val skew check every
    * sampling stage should ship with. Both sides reduce to the SAME
    * [[binSketch]] contract (bins equi-width over [lo, hi)); the
    * statistic is the max gap between the two binned CDFs, reported
    * at the bin where it peaks (lowest bin on ties).
    *
    * Exactness end to end: the gap compares CROSS-MULTIPLIED
    * cumulative counts (|cumA·nB − cumB·nA| — exact 64-bit up to
    * ~3·10⁹ rows per side), the argmax is a struct max with the bin
    * tie-break, and the final ppm normalization runs in DECIMAL(38)
    * via the nested floor-division identity
    * `⌊x/(a·b)⌋ = ⌊⌊x/a⌋/b⌋` — no double ever divides. Binning
    * resolution bounds the statistic's error exactly as it bounds
    * [[quantileRollup]]'s.
    *
    * Scale shape: each side is one map-side-combined bin count (the
    * corpus never shuffles); everything after is ≤ bins rows joined
    * on bin index plus two 1-row total broadcasts. Output one row:
    * (n_a, n_b, ks_bin, ks_num, ks_ppm) where ks_num is the exact
    * cross-multiplied numerator and ks_ppm = ⌊10⁶·ks_num/(nA·nB)⌋.
    */
  def ksReport(a: DataFrame, b: DataFrame, target: String,
               bins: Int = 256, lo: Double, hi: Double): DataFrame =
    ksCore(
      binSketch(a, Nil, target, bins, lo, hi)
        .select(posexplode(col("bin_counts"))
          .as(Seq("bin_idx", "cnt"))),
      b, target, bins, lo, hi)

  /** [[ksReport]] with side A already STAGED as bin-sketch rows (the
    * live-ingest shape: [[graft.streaming.ProfileStream
    * .binSketchStream]]'s closed windows, or any slice table built
    * against the same binning contract) — "is what we ingested
    * length-shifted against the reference corpus?" answered from
    * staged slices, the raw stream never re-read. Slices merge by
    * addition before the CDF walk, so the answer is bit-equal to
    * [[ksReport]] over the same underlying rows (the drift family's
    * stream/batch parity contract); the carried (bins, lo, hi)
    * contract is validated exactly as [[quantileRollup]] validates
    * it. No-data shape: a staged frame with ZERO slices still emits
    * one n_a=0 audit row (the merged histogram densifies with
    * explicit zero lanes; ks_ppm is NULL — a 0-sample statistic is
    * undefined), matching [[ksReport]] over an empty side A — the two
    * entry points agree by contract.
    */
  def ksReportStaged(stagedA: DataFrame, b: DataFrame, target: String,
                     bins: Int = 256, lo: Double,
                     hi: Double): DataFrame = {
    val hasContract = Seq("bins", "lo", "hi")
      .forall(stagedA.columns.contains)
    val contractChk =
      if (hasContract)
        assert_true(size(col("bin_counts")) === bins &&
          col("bins") === bins && col("lo") === lo && col("hi") === hi,
          lit(s"bin sketch contract mismatch: ks expects " +
            s"($bins bins over [$lo,$hi))"))
      else
        assert_true(size(col("bin_counts")) === bins,
          lit(s"bin sketch width mismatch: expected $bins bins"))
    val merged = stagedA
      .select(col("bin_counts"), contractChk.as("_chk"))
      .select(col("_chk"),
        posexplode(col("bin_counts")).as(Seq("bin_idx", "cnt")))
      // densify with an explicit zero lane per bin: a stream with NO
      // closed slices then still merges to a zero-filled histogram and
      // the report emits one n_a=0 audit row — the same no-data shape
      // [[ksReport]] produces (binSketch's global groupBy always emits
      // a zero-filled bin row), so the two entry points agree
      .unionByName(stagedA.sparkSession.range(bins)
        .select(lit(null).cast("boolean").as("_chk"),
          col("id").cast("int").as("bin_idx"), lit(0L).as("cnt")))
      .groupBy("bin_idx")
      .agg(sum(col("cnt") +
        coalesce(col("_chk").cast("long"), lit(0L))).as("cnt"))
    ksCore(merged, b, target, bins, lo, hi)
  }

  /** Shared KS tail: side A as merged (bin_idx, cnt) rows, side B
    * raw. Totals come from the bin counts themselves (= non-null
    * target rows on each side).
    */
  private def ksCore(aCounts: DataFrame, b: DataFrame, target: String,
                     bins: Int, lo: Double, hi: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin_idx").asc)   // ≤ bins rows post-sketch
    val ca = aCounts
      .withColumn("cum_a", sum(col("cnt")).over(w))
      .select(col("bin_idx"), col("cum_a"))
    val cb = binSketch(b, Nil, target, bins, lo, hi)
      .select(posexplode(col("bin_counts")).as(Seq("bin_idx", "cnt")))
      .withColumn("cum_b", sum(col("cnt")).over(w))
      .select(col("bin_idx"), col("cum_b"))
    val na = aCounts.agg(sum(col("cnt")).as("n_a"))
    val nb = b.filter(col(target).isNotNull)
      .agg(count(lit(1)).as("n_b"))
    ca.join(cb, Seq("bin_idx"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
          .as("_gap"),
        col("bin_idx"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(struct(col("_gap"), (lit(-1L) * col("bin_idx"))
        .as("_nb"))).as("_m"))
      .select(col("n_a"), col("n_b"),
        (lit(-1L) * col("_m._nb")).cast("long").as("ks_bin"),
        col("_m._gap").as("ks_num"),
        // an EMPTY side still emits its audit row (n=0, gap 0) but a
        // 0-sample KS statistic is undefined — ppm goes NULL instead
        // of tripping ANSI division-by-zero
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " CAST(CAST(_m._gap AS DECIMAL(38,0)) * 1000000" +
          " DIV n_a DIV n_b AS BIGINT) END").as("ks_ppm"))
  }

  /** Per-stratum [[ksReport]]: every group's binned CDF against the
    * GLOBAL CDF of the same column — "which sources/domains are
    * length-shifted against the corpus", the one-scan slice-skew
    * survey a mixture pipeline reads before reweighting. One
    * [[binSketch]] pass per group (the corpus shuffles its bin index
    * only); the global CDF is the ADDITIVE merge of the group
    * sketches (≤ bins rows) — the corpus is never re-read. Same
    * exactness contract as [[ksReport]]: cross-multiplied integer
    * gaps, lowest-bin argmax tie-break, DECIMAL(38) ppm. Groups whose
    * values are all NULL drop with the pre-filter (documented).
    * Output per group: (group, n_group, n_total, ks_bin, ks_num,
    * ks_ppm), ordered.
    */
  def ksReportBy(df: DataFrame, groupCol: String, target: String,
                 bins: Int = 256, lo: Double, hi: Double): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val sk = binSketch(df, Seq(groupCol), target, bins, lo, hi)
      .select(col(groupCol).as("_grp"),
        posexplode(col("bin_counts")).as(Seq("bin_idx", "cnt")))
    val cg = sk
      .withColumn("cum_g",
        sum(col("cnt")).over(W.partitionBy("_grp").orderBy("bin_idx")))
      .withColumn("n_g", sum(col("cnt")).over(W.partitionBy("_grp")))
    // global CDF by merging the group sketches — ≤ bins rows
    val ca = sk.groupBy("bin_idx").agg(sum(col("cnt")).as("_call"))
      .withColumn("cum_all", sum(col("_call")).over(W.orderBy("bin_idx")))
      .withColumn("n_all", sum(col("_call")).over(W.partitionBy()))
      .select(col("bin_idx"), col("cum_all"), col("n_all"))
    cg.join(ca, Seq("bin_idx"))
      .select(col("_grp"), col("n_g"), col("n_all"),
        abs(col("cum_g") * col("n_all") - col("cum_all") * col("n_g"))
          .as("_gap"),
        col("bin_idx"))
      .groupBy(col("_grp"), col("n_g"), col("n_all"))
      .agg(max(struct(col("_gap"), (lit(-1L) * col("bin_idx"))
        .as("_nb"))).as("_m"))
      .select(col("_grp").as(groupCol), col("n_g").as("n_group"),
        col("n_all").as("n_total"),
        (lit(-1L) * col("_m._nb")).cast("long").as("ks_bin"),
        col("_m._gap").as("ks_num"),
        expr("CAST(CAST(_m._gap AS DECIMAL(38,0)) * 1000000" +
          " DIV n_g DIV n_all AS BIGINT)").as("ks_ppm"))
      .orderBy(groupCol)
  }

  /** The exact verify pass alone: count ONLY `candidates` rows (a
    * broadcast-joined key list from any proposal mechanism — the
    * batch MG summary above, or the union of streaming
    * `freqSketchStream` slices) and keep those at share ≥ 1/k. The
    * output is deterministic whatever extra candidates the proposal
    * carried: spurious keys are filtered by their exact counts, and
    * the proposal contract guarantees no qualifying key is missing.
    */
  def verifyHitters(df: DataFrame, key: String, k: Int,
                    candidates: DataFrame): DataFrame = {
    val total = df.agg(count(col(key)).as("_n"))
    df.select(col(key))
      .join(broadcast(candidates.select(col(key)).distinct()), Seq(key))
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") * k >= col("_n"))
      .select(col(key), col("cnt"),
        expr("cnt * 1000000 DIV _n").as("share_ppm"))
      .orderBy(col("cnt").desc, col(key).asc)
  }
}
