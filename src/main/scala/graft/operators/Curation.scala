package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-set curation — the composition every LLM data
  * pipeline runs before tokenization, expressed as ONE declarative
  * plan so Catalyst sees (and optimizes) the whole funnel:
  *
  *   quality gate → exact dedup (keep-first) → benchmark
  *   decontamination → deterministic mixture sampling.
  *
  * Stage costs at 100 TB: the gate is row-local codegen (no shuffle)
  * and prunes before anything shuffles; dedup shuffles 16-byte
  * fingerprints of survivors only; decontamination broadcasts the
  * held-out split's n-gram set (the corpus never shuffles); mixture
  * sampling is another row-local hash threshold. Net: ONE corpus-sized
  * shuffle (the dedup window) for the entire funnel. Every stage is
  * individually oracled (`corpus_filter`, `dedup_keep_first`,
  * `decontaminate`, `sample_mixture_docs`); `curation_pipeline` pins
  * the composition.
  */
object Curation {

  /** SemDeDup-style semantic keep-best (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): embedding near-dup pairs → transitive semantic
    * clusters → ONE representative per cluster chosen by TEXT quality
    * (not random, not first-seen). The cross-table composition: the
    * pair source runs on the embeddings table (LSH-bucketed), the
    * representative choice joins the documents table's quality score
    * on the shared id. Returns (group_rep, keep_id, n_members).
    */
  def semanticKeepBest(pairs: DataFrame, docs: DataFrame,
                       idCol: String = "doc_id"): DataFrame = {
    val groups = Dedup.connectedGroups(pairs)
    val q = docs.select(col(idCol).as("id"),
      TextAnalysis.qualityScore(col("text")).as("_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("group_rep")
      .orderBy(col("_q").desc, col("id").asc)
    groups.join(q, Seq("id"))
      .withColumn("n_members",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("group_rep")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("group_rep"), col("id").as("keep_id"),
        col("n_members"))
      .orderBy("group_rep")
  }

  /** The round-6 funnel — every stage a modern pretraining pipeline
    * actually runs, composed into as few plans as the operators allow:
    *
    *   line-level boilerplate removal → Gopher rule gate ∧
    *   hashed-features classifier gate → exact dedup (keep-first) →
    *   Bloom-prefiltered benchmark decontamination → per-source
    *   token-budget fill.
    *
    * Stage costs at 100 TB: lineDedup contributes the line-hash count
    * and the doc rebuild (its rebuild groupBy keys by doc_id, and the
    * source join reuses that partitioning — no extra exchange); both
    * text gates are row-local integer expressions fused into ONE
    * Filter; dedup shuffles fingerprints of gate survivors only; the
    * test n-gram set rides a Bloom literal + a tiny broadcast; the
    * budget fill windows over (id, n_tokens) scalars. Returns
    * (doc_id, stratum, n_tokens, start_tok) — the exact chunker input.
    *
    * EAGER: calling this runs the line-dedup + gate + dedup pipeline
    * and stages the survivors to parquet BEFORE returning (the
    * `Utils.stage` contract — the branch point feeds four consumers
    * in the returned plan, so there is no later safe release point).
    * Plan-only inspection should compose the unstaged building
    * blocks directly.
    */
  def curateModern(docs: DataFrame, minWords: Int = 25,
                   classifierThresholdPpm: Long = 0L,
                   budgets: Map[String, Long] = Map.empty,
                   defaultBudget: Long = 300L,
                   lineSep: String = "\n", maxLineDocs: Int = 1,
                   ngram: Int = 8): DataFrame = {
    val cleaned = Dedup
      .lineDedup(docs, sep = lineSep, maxDocs = maxLineDocs)
      .select(col("doc_id"), col("clean_text"))
    val withSrc = cleaned
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val c = col("clean_text")
    val gated = withSrc.filter(
      TextAnalysis.gopherPassExpr(c, minWords) &&
        TextAnalysis.classifierKeepExpr(c, classifierThresholdPpm))
    // branch point: the gate+dedup survivors feed FOUR consumers (the
    // Bloom bit build's collect, the verify join's test side, the
    // anti-join train side, the budget window) — without a
    // materialization the whole line-dedup+gate pipeline re-executes
    // for each (measured ~4x wall time at sf0.1). Staged to parquet
    // rather than persist(): a persist here would outlive this call
    // with no safe point to release it (the consumers sit in the
    // RETURNED lazy plan), whereas the staging files cost no executor
    // memory, leave no cached RDD behind, and give each consumer a
    // real columnar scan (pruning + pushdown). Survivor set, not the
    // corpus — the write is the cheap side of the 4x it saves.
    val deduped = graft.util.Utils.stage(
      Dedup.exactDedup(gated, "clean_text"), "curate_branch")
    val isTest = substring(md5(col("doc_id").cast("string")), 1, 1)
      .isin("0", "1")
    val train = deduped.filter(!isTest)
    val bad = Dedup
      .decontaminateBloomAgainst(train, deduped.filter(isTest),
        "clean_text", n = ngram)
      .select(col("doc_id").as("_bad_id"))
    val clean = train.join(broadcast(bad),
      col("doc_id") === col("_bad_id"), "left_anti")
    Sampling.tokenBudgetSample(clean, "source", "clean_text",
      budgets = budgets, defaultBudget = defaultBudget)
  }

  /** Per-stratum document cap (the C4/mC4 per-domain cap: no single
    * domain may dominate the mixture): keep the `maxDocs`
    * highest-quality documents of each stratum, ranked by
    * integer-scaled quality (ppm, ties → lowest id — no float ever
    * reaches the output or the ordering). Returns
    * (doc_id, source, q6, rank).
    *
    * Scale shape: one shuffle keyed by the stratum, then a per-stratum
    * top-maxDocs window. A skewed mega-domain serializes its own
    * partition only; since every stratum keeps at most `maxDocs` rows,
    * a two-phase refinement (per-partition top-maxDocs, then global)
    * bounds that too — Catalyst already applies exactly that partial
    * top-k through the rank-filter pushdown
    * (`WindowGroupLimit`, visible in the plan).
    */
  def capPerStratum(docs: DataFrame, stratumCol: String = "source",
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    maxDocs: Int = 10): DataFrame = {
    val q6 = floor(TextAnalysis.qualityScore(col(textCol)) * 1e6 + 0.5)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("q6").desc, col("doc_id").asc)
    docs.select(col(idCol).as("doc_id"),
        col(stratumCol).as("source"), q6.as("q6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= maxDocs)
      .orderBy("doc_id")
  }

  /** SemDeDup as published (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embedding space, then prune near-duplicates
    * WITHIN clusters only — the clusters bound the pair work
    * (≈ (n/k)² per cluster instead of n²), which is the entire reason
    * the paper clusters first. Built on [[Similarity.kmeans]]
    * (deterministic, oracle-replayable); the prune is the greedy
    * keep-lowest-id rule, so the survivor set is deterministic too.
    * For quality-aware survivor choice feed any pair source to
    * [[semanticKeepBest]].
    *
    * Scale: kmeans assignment is row-local; the only quadratic step
    * is inside a cluster, and k grows with the corpus to hold n/k
    * constant (the paper uses k ≈ √n·c). One shuffle keys the
    * self-join by cluster.
    */
  def semdedup(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
               threshold: Double = 0.3,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val clusters = Similarity.kmeans(embeddings, k, iters,
      idCol = idCol, vecCol = vecCol)
    val v = embeddings
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(clusters.select("vec_id", "cluster"), "vec_id")
    val l = v.select(col("cluster"), col("vec_id").as("id1"),
      col("v").as("v1"))
    val r = v.select(col("cluster"), col("vec_id").as("id2"),
      col("v").as("v2"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("id1") < col("id2"))
      .filter(Similarity.cosine(col("v1"), col("v2")) >= threshold)
      .select(col("id2")).distinct()
    v.join(dropped, v("vec_id") === dropped("id2"), "left_anti")
      .select(col("vec_id"), col("cluster"))
      .orderBy("vec_id")
  }

  /** Keep documents at or above the q-th corpus quality quantile —
    * the "top 25 % by quality" gate phrased as a percentile, not a
    * magic threshold, so the cut tracks the corpus. The threshold is
    * the exact interpolated percentile over the integer-scaled
    * quality (one paths-free tiny aggregate, broadcast back, rounded
    * to 6 dp so both engines make the identical cut); the gate
    * itself is a row-local comparison — the corpus never shuffles.
    */
  def keepTopQuantile(docs: DataFrame, q: Double = 0.75,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      stratumCol: String = "source"): DataFrame = {
    val q6 = floor(TextAnalysis.qualityScore(col(textCol)) * 1e6 + 0.5)
      .cast("long")
    // spread(): qualityScore tokenizes + regex-scans every document
    // and `scored` feeds two consumers (threshold agg + filter), both
    // otherwise at the local scan's single-task parallelism (r19)
    val scored = graft.util.Utils.spread(docs)
      .select(col(idCol).as("doc_id"),
        col(stratumCol).as("source"), q6.as("q6"))
    val threshold = scored.agg(
      round(percentile(col("q6"), lit(q)), 6).as("thr"))
    scored.crossJoin(broadcast(threshold))
      .filter(col("q6") >= col("thr"))
      .select(col("doc_id"), col("source"), col("q6"))
      .orderBy("doc_id")
  }

  def curate(docs: DataFrame,
             minTokens: Int = 20, minQuality: Double = 0.3,
             rates: Map[String, Int] = Map.empty,
             defaultPermille: Int = 100,
             ngram: Int = 8): DataFrame = {
    val c = col("text")
    // stage 1: row-local quality gate — prune BEFORE any shuffle
    val passed = docs.filter(
      TextAnalysis.tokenCount(c) >= minTokens &&
        TextAnalysis.qualityScore(c) >= minQuality &&
        TextAnalysis.langId(c) =!= "unknown")
    // stage 2: exact dedup, keep the first (lowest-id) copy
    val deduped = Dedup.exactDedup(passed)
    // stage 3: the held-out split (md5-prefix 0/1 ≈ 1/8, standing in
    // for a benchmark suite) leaves the corpus entirely; training
    // docs sharing any 8-gram with it are dropped
    val isTest = substring(md5(col("doc_id").cast("string")), 1, 1)
      .isin("0", "1")
    val train = deduped.filter(!isTest)
    val contaminated = Dedup
      .decontaminateAgainst(train, deduped.filter(isTest), n = ngram)
      .select(col("doc_id").as("_bad_id"))
    val clean = train.join(broadcast(contaminated),
      col("doc_id") === col("_bad_id"), "left_anti")
    // stage 4: per-source mixture rates, row-local hash threshold
    Sampling.mixtureSample(clean, "source", "doc_id", rates,
        defaultPermille)
      .select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.tokenCount(c).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** The target profile of [[dsirAffinity]] as a DENSE ppm array
    * indexed by bucket — the broadcast-literal form for row-local
    * scoring (streaming ingest, or any projection-only context). ONE
    * bounded collect, ≤ `buckets` rows by construction (the Bloom
    * bit-build contract); at the default width the literal is 512 KB
    * of longs, the same magnitude the decontamination filter ships.
    */
  def dsirProfileArray(target: DataFrame, textCol: String = "text",
                       n: Int = 2, buckets: Int = 65536): Array[Long] = {
    import org.apache.spark.sql.types.LongType
    val grams = graft.util.Utils.spread(target)
      .select(explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
      .withColumn("bucket",
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast(LongType)
          % buckets)
    // one corpus scan: the gram total is the sum of the (bucket-sized)
    // per-bucket counts — no second pass, and the driver-side integer
    // division is the exact arithmetic the join path runs
    val rows = grams.groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect()
    val total = math.max(rows.map(_.getLong(1)).sum, 1L)
    val arr = new Array[Long](buckets)
    rows.foreach(r =>
      arr(r.getLong(0).toInt) = 1000000L * r.getLong(1) / total)
    arr
  }

  /** Row-local (n_grams, affinity_ppm) columns scoring `textCol`
    * against a dense profile from [[dsirProfileArray]] — bit-equal to
    * [[dsirAffinity]]'s join path by construction (same hashing, same
    * floors, same half-up mean), pinned by the streaming equivalence
    * spec. Pure projection: no shuffle, no state, safe in a streaming
    * select.
    */
  def dsirScoreColumns(textCol: Column, profile: Array[Long],
                       n: Int = 2, buckets: Int = 65536)
      : (Column, Column) = {
    import org.apache.spark.sql.types.LongType
    val prof = typedLit(profile.toSeq)
    val freqs = transform(TextAnalysis.shingles(textCol, n), g =>
      element_at(prof,
        (conv(substring(md5(g), 1, 15), 16, 10).cast(LongType)
          % buckets).cast("int") + 1))
    val nGrams = size(freqs).cast(LongType)
    val s = aggregate(freqs, lit(0L), (acc, x) => acc + x)
    // integral divide (SQL `div`), NOT `/` — Spark's `/` on longs is
    // DOUBLE division and loses exactness past 2^53
    val affinity = when(nGrams === 0L, lit(0L))
      .otherwise(call_function("div", s, nGrams) +
        when((s % nGrams) * 2 >= nGrams, lit(1L)).otherwise(lit(0L)))
    (nGrams, affinity)
  }

  /** DSIR-shaped target-affinity scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling": hashed
    * n-gram features against a target corpus): each raw document gets
    * the integer-ppm MEAN target frequency of its word n-grams, where
    * n-grams hash into `buckets` feature buckets (the DSIR trick that
    * keeps the feature space fixed-size however large the vocabulary).
    * High affinity = reads like the target distribution; compose with
    * [[keepTopQuantile]] or a weighted [[graft.operators.Sampling]]
    * fill for the selection step. DSIR's log-ratio importance weight
    * needs libm; the frequency mean is the same monotone-in-affinity
    * signal kept integer-exact end to end (the [[TextAnalysis.topTerms]]
    * trade), so no engine/build pair can disagree on a score.
    *
    * Scale shape: the target profile is bucket-sized (≤ `buckets`
    * rows) however big the target corpus — built by one explode +
    * groupBy, carried to the raw side as a BROADCAST hash join keyed
    * by bucket; the raw side is one explode + one doc_id-keyed
    * groupBy. The corpus never joins itself and nothing driver-side
    * scales with data. Integer bound: `1e6 · bucket_count` wraps only
    * past ~9.2e12 grams in ONE bucket (a ~2e13-gram corpus spreads
    * ~3e8 per bucket at the default width — five orders of margin).
    * Zero-gram documents (fewer than n tokens) score 0 by definition.
    */
  def dsirAffinity(raw: DataFrame, target: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   n: Int = 2, buckets: Int = 65536): DataFrame =
    dsirScores(raw, target, textCol, idCol, n, buckets)
      .orderBy("doc_id")

  /** [[dsirAffinity]] without the output ordering — the composition
    * entry point ([[dsirSelect]]) so a consuming join/window never
    * inherits a dead global sort.
    */
  private def dsirScores(raw: DataFrame, target: DataFrame,
                         textCol: String, idCol: String,
                         n: Int, buckets: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    def gramBuckets(df: DataFrame) =
      graft.util.Utils.spread(df)
        .select(col(idCol).as("doc_id"),
          explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
        .withColumn("bucket",
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast(LongType)
            % buckets)
    val tgt = gramBuckets(target)
    val profile = tgt.groupBy("bucket").agg(count(lit(1)).as("c"))
    // the gram total is the sum of the bucket-sized profile — derived
    // from the aggregate, NOT a second scan of the target corpus
    val total = profile.agg(sum(col("c")).as("t"))
    // 1-row total broadcast (the audited scalar pattern); per-bucket
    // target frequency floors to ppm, and the per-doc mean rounds
    // half-up via quotient + remainder — overflow-free
    val prof = profile.crossJoin(broadcast(total))
      .select(col("bucket"), expr("(1000000 * c) DIV t").as("freq_ppm"))
    val scored = gramBuckets(raw)
      .join(broadcast(prof), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("freq_ppm"), lit(0L))).as("s"))
    raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(
          expr("s DIV n_grams + IF(2 * (s % n_grams) >= n_grams, " +
            "1L, 0L)"),
          lit(0L)).as("affinity_ppm"))
  }

  /** The DSIR SELECTION step (Xie et al. 2023 §3: importance
    * resampling, made deterministic): fill each stratum's token
    * budget with its HIGHEST-target-affinity documents first —
    * [[dsirAffinity]] scores ordered desc feeding the same
    * budget-window fill as [[graft.operators.Sampling.tokenBudgetSample]]
    * (which fills by md5 order, i.e. uniformly; this is the
    * quality-weighted twin). Ties break on doc_id, so the selected
    * set replays exactly in any engine. Returns (doc_id, stratum,
    * affinity_ppm, n_tokens, start_tok) — the chunker input plus the
    * score that earned the slot.
    *
    * Scale shape: scoring is the dsirAffinity broadcast pipeline; the
    * fill is ONE window partitioned by stratum over (id, score,
    * n_tokens) scalars — the corpus text never enters the sort. A
    * degenerate single-stratum corpus makes that window one big sort
    * partition; at 100 TB pre-cut with [[keepTopQuantile]] on the
    * affinity column so only plausible winners reach the sort (the
    * budget's worth of docs, not the corpus).
    */
  def dsirSelect(raw: DataFrame, target: DataFrame,
                 stratumCol: String = "source",
                 textCol: String = "text", idCol: String = "doc_id",
                 n: Int = 2, buckets: Int = 65536,
                 budgets: Map[String, Long] = Map.empty,
                 defaultBudget: Long = 0L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) =>
        when(col("stratum") === s, lit(b)).otherwise(acc)
    }
    val w = W.partitionBy(col("stratum"))
      .orderBy(col("affinity_ppm").desc, col("doc_id").asc)
    raw.select(col(idCol).as("doc_id"),
        col(stratumCol).as("stratum"),
        TextAnalysis.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType).as("n_tokens"))
      .join(dsirScores(raw, target, textCol, idCol, n, buckets)
        .select(col("doc_id"), col("affinity_ppm")), Seq("doc_id"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .filter(col("start_tok") < budget)
      .select("doc_id", "stratum", "affinity_ppm", "n_tokens",
        "start_tok")
      .orderBy("doc_id")
  }

  /** Domain-mixture reweighting — the data-mixing step (the DoReMi /
    * The Pile shape: per-domain sampling weights chosen so the mixture
    * the model SEES matches target token shares, not what the crawl
    * happened to collect). Given target shares in ppm per source,
    * computes each source's actual corpus share and the sampling
    * weight that reaches the target:
    *
    *   weight_ppm = ⌊target_ppm · total_tokens / tokens_s⌋
    *
    * >1e6 means the source must be upsampled (repeat epochs), <1e6
    * downsampled; `expected_tokens` is the post-sampling token count.
    * All integer arithmetic (64-bit products stay exact far beyond
    * 100 TB token counts), so any engine reproduces it bit-for-bit.
    *
    * Shape at 100 TB: ONE map-side-combined groupBy over the tiny
    * source key space, a 1-row total broadcast back over the grouped
    * result (the q11 pattern), and a literal target map — no second
    * corpus scan, no join against anything corpus-sized.
    */
  def mixtureWeights(docs: DataFrame, targetsPpm: Map[String, Long],
                     defaultTargetPpm: Long = 0L,
                     textCol: String = "text",
                     srcCol: String = "source"): DataFrame = {
    val perSrc = docs.select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType).as("_n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("n_tokens"))
    val total = perSrc.agg(sum("n_tokens").as("_total"))
    val target = targetsPpm.foldLeft(lit(defaultTargetPpm)) {
      case (acc, (s, t)) => when(col("source") === s, lit(t)).otherwise(acc)
    }
    perSrc.crossJoin(broadcast(total))
      .withColumn("target_ppm", target)
      .withColumn("corpus_ppm",
        expr("(1000000 * n_tokens) div _total"))
      .withColumn("weight_ppm",
        expr("(target_ppm * _total) div n_tokens"))
      .withColumn("expected_tokens",
        expr("(n_tokens * weight_ppm) div 1000000"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("corpus_ppm"), col("target_ppm"), col("weight_ppm"),
        col("expected_tokens"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture targets at α = 0.5 — the multilingual
    * sampling exponent (the mBERT/XLM-R "temperature" trick: target
    * share ∝ tokensᵅ flattens the head and lifts the tail without
    * the low-resource starvation of proportional sampling). α is
    * FIXED at 0.5 because `sqrt` is the one fractional power IEEE 754
    * guarantees correctly rounded — any other exponent runs through
    * libm `pow`, whose last ulp varies by platform and would break
    * the cross-engine bit-parity contract (documented scope cut, not
    * an oversight). Determinism: each source's √tokens micro-izes to
    * an exact integer (`⌊√t·10⁶+0.5⌋`) BEFORE the cross-source sum,
    * so the normalization denominator is an integer sum — no
    * float-reduction-order drift. Output feeds [[mixtureWeights]]'s
    * `targetsPpm` or [[mixtureApply]] directly: (source, n_tokens,
    * corpus_ppm, target_ppm) with Σ target_ppm ≤ 10⁶ (floor
    * division; the dust stays unassigned, the mixtureWeights
    * default-bucket convention).
    */
  def temperedShares(docs: DataFrame, textCol: String = "text",
                     srcCol: String = "source"): DataFrame = {
    val perSrc = docs.select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType).as("_n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("n_tokens"))
      .withColumn("_s6",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6 + 0.5)
          .cast(org.apache.spark.sql.types.LongType))
    val totals = perSrc.agg(sum("n_tokens").as("_total"),
      sum("_s6").as("_stotal"))
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // BOTH ppm numerators go through DECIMAL(38): 10⁶·√t·10⁶
        // passes 2⁶³ near ~10¹⁴ tokens in one source, and the plain
        // 10⁶·n_tokens corpus numerator would silently wrap past
        // ~9.2·10¹² tokens — fleet scale is in range for BOTH columns
        // (the oracle mirrors the HUGEINT-width arithmetic)
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_tokens" +
          " DIV _total AS BIGINT)").as("corpus_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * _s6" +
          " DIV _stotal AS BIGINT)").as("target_ppm"))
      .orderBy("source")
  }

  /** Stages per-(slice, source) mixture counts — the mergeable unit
    * the drift monitor consumes. A slice is whatever ingest batch the
    * caller keys by (an event-time window, a file batch, a day
    * partition): rows are (slice, source, n_docs, n_tokens) and MERGE
    * by addition, so any coarser rollup composes without re-reading
    * documents (the binSketch/HLL staging discipline applied to the
    * mixture). One map-side-combined groupBy over (slices × sources)
    * keys; `ProfileStream.mixtureStream` emits the identical rows from
    * a live stream.
    */
  def mixtureStage(docs: DataFrame, slice: Column,
                   textCol: String = "text",
                   srcCol: String = "source"): DataFrame =
    docs.groupBy(slice.as("slice"), col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType)).as("n_tokens"))

  /** Merge-only mixture drift report: given staged
    * (slice, source, n_docs, n_tokens) rows ([[mixtureStage]] /
    * `mixtureStream`), reports each slice's realized mixture against
    * the target — share_ppm, target_ppm, and drift_ppm = share −
    * target (positive = the source is running hot). The "is the live
    * mixture drifting off target" monitor, and the early-warning twin
    * of [[mixtureWeights]] (which prescribes the correction).
    *
    * Scale shape: re-aggregates ONLY the staged rows (slices ×
    * sources — kilobytes), per-slice totals broadcast back; documents
    * are never re-read. All integer ppm.
    */
  def mixtureDrift(staged: DataFrame, targetsPpm: Map[String, Long],
                   defaultTargetPpm: Long = 0L): DataFrame = {
    val g = staged.groupBy(col("slice"), col("source"))
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
    // per-slice totals re-aggregate the GROUPED frame; the join back
    // is a self-join, so the total side renames its key to keep the
    // attribute lineages disjoint (memory-sink plans don't get the
    // automatic self-join disambiguation file scans do)
    val tot = g.select(col("slice").as("_slice"),
        col("n_tokens").as("_nt"))
      .groupBy(col("_slice")).agg(sum("_nt").as("_total"))
    val target = targetsPpm.foldLeft(lit(defaultTargetPpm)) {
      case (acc, (s, t)) => when(col("source") === s, lit(t)).otherwise(acc)
    }
    g.join(broadcast(tot), col("slice") === col("_slice"))
      .withColumn("share_ppm", expr("(1000000 * n_tokens) div _total"))
      .withColumn("target_ppm", target)
      .withColumn("drift_ppm", expr("share_ppm - target_ppm"))
      .select("slice", "source", "n_docs", "n_tokens", "share_ppm",
        "target_ppm", "drift_ppm")
      .orderBy("slice", "source")
  }

  /** Executes [[mixtureWeights]] — the resampling step that makes the
    * corpus ACTUALLY match the target mixture. Each document's weight
    * w (ppm) splits into ⌊w/1e6⌋ guaranteed copies plus one more with
    * probability (w mod 1e6)/1e6, decided by the doc's own md5 — so
    * downsampling (w < 1e6) is a keep/drop coin and upsampling
    * (w > 1e6, the DoReMi repeat-epochs case) emits multiple numbered
    * copies. No RNG state: the fractional coin compares the first 5
    * md5 hex digits (a 2²⁰-grain uniform in [0,1e6) via exact integer
    * cross-multiplication h·1e6 < f·2²⁰), so the same doc makes the
    * same choice on any engine, any partitioning, any re-run.
    *
    * Returns (doc_id, source, weight_ppm, copy_idx) with copy_idx =
    * 1..copies — the numbered-copy form downstream shuffle/packing
    * steps need (each copy gets its own shuffle position).
    *
    * Scale shape: the weight table is sources-sized and broadcast;
    * copy emission is a row-local explode. ONE corpus scan for the
    * emission (plus the one inside mixtureWeights), no corpus shuffle.
    */
  def mixtureApply(docs: DataFrame, targetsPpm: Map[String, Long],
                   defaultTargetPpm: Long = 0L,
                   textCol: String = "text",
                   srcCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    val weights = mixtureWeights(docs, targetsPpm, defaultTargetPpm,
      textCol, srcCol).select(col("source"), col("weight_ppm"))
    val h20 = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 5), " +
        "16, 10) AS BIGINT)")
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("copies",
        expr("(weight_ppm div 1000000)") +
          when(h20 * lit(1000000L) <
            (col("weight_ppm") % 1000000L) * lit(1048576L), 1L)
            .otherwise(0L))
      // ascending sequence() needs copies ≥ 1 (Spark's sequence(1, 0)
      // would count DOWN); zero-copy docs are exactly the drops
      .filter(col("copies") >= 1L)
      .select(col("doc_id"), col("source"), col("weight_ppm"),
        explode(expr("sequence(1L, copies)")).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  /** Sequence-length bucketing audit — the padding-waste report a
    * training pipeline runs before choosing batch shapes. Each
    * document lands in the smallest power-of-two length bucket that
    * holds its token count (longer docs are truncated to the largest
    * bucket — the max-sequence-length cut); per bucket the report
    * gives the document count, the kept tokens, the pad tokens a
    * rectangular (bucket_len × n_docs) batch would burn, and the
    * waste as integer ppm of batch capacity. The "is bucketed padding
    * acceptable or do we need sequence packing" decision input
    * (`packSequences` is the packing alternative this audits against).
    *
    * Row-local bucket assignment (a literal CASE chain — no log2/libm,
    * so every engine agrees on boundaries) followed by one map-side-
    * combined groupBy over ≤ a dozen bucket keys: scales like a count.
    */
  def paddingReport(docs: DataFrame, textCol: String = "text",
                    buckets: Seq[Long] =
                      Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L),
                    tokenCounter: Column => Column =
                      TextAnalysis.tokenCount(_)): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted,
      "buckets must be ascending")
    val maxB = buckets.last
    val n = tokenCounter(col(textCol))
      .cast(org.apache.spark.sql.types.LongType)
    val kept = least(n, lit(maxB))
    val bucket = buckets.init.foldRight(lit(maxB)) {
      case (b, acc) => when(kept <= b, lit(b)).otherwise(acc)
    }
    docs.select(bucket.as("bucket_len"), kept.as("_kept"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("_kept").as("kept_tokens"))
      .withColumn("pad_tokens",
        expr("(bucket_len * n_docs) - kept_tokens"))
      .withColumn("waste_ppm",
        expr("(1000000 * pad_tokens) div (bucket_len * n_docs)"))
      .select("bucket_len", "n_docs", "kept_tokens", "pad_tokens",
        "waste_ppm")
      .orderBy("bucket_len")
  }

  /** Robust per-stratum outlier report over an integer signal —
    * median/MAD gating (Hampel's rule), the length/size sanity filter
    * that survives the heavy-tailed distributions mean/stddev gates
    * drown in: a row is an outlier when |x − median| > k · MAD.
    *
    * Exactness: medians stay in DOUBLED integer units (`2·median` of
    * a BIGINT column is k or k+0.5 doubled to an exact integer —
    * binary doubles represent both exactly, so the ×2-then-cast is
    * bit-identical in any engine), MAD in QUADRUPLED units
    * (`2·median(|2x − med2|)`), and the gate cross-multiplies
    * (`2·dev2 > k·mad4`) so no division ever happens — the
    * DECIMAL-free twin of the q11 predicate discipline.
    *
    * Scale shape: three scans of a two-column projection (median,
    * then MAD of deviations, then flag counts), each reducing to a
    * strata-sized aggregate broadcast back — rows never shuffle. The
    * exact grouped percentile holds to ~low-billions of rows per
    * stratum; past that, [[Sketches.binSketch]] /
    * [[Sketches.quantileRollup]] is the documented mergeable-sketch
    * path for the same medians. Output per stratum: (group, n_rows,
    * med2, mad4, n_outliers, outlier_ppm).
    */
  def madOutlierReport(docs: DataFrame, valueCol: String = "n_chars",
                       groupCol: String = "source",
                       k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val x = col(valueCol).cast(org.apache.spark.sql.types.LongType)
    val t = docs.select(col(groupCol).as("grp"), x.as("_x"))
    val med = t.groupBy("grp")
      .agg((expr("percentile(_x, 0.5D)") * 2)
        .cast(org.apache.spark.sql.types.LongType).as("med2"))
    val dev = t.join(broadcast(med), Seq("grp"))
      .withColumn("_dev2", abs(col("_x") * 2 - col("med2")))
    val mad = dev.groupBy("grp")
      .agg((expr("percentile(_dev2, 0.5D)") * 2)
        .cast(org.apache.spark.sql.types.LongType).as("mad4"))
    dev.join(broadcast(mad), Seq("grp"))
      .groupBy(col("grp"), col("med2"), col("mad4"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_dev2") * 2 > col("mad4") * k, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("grp").as(groupCol), col("n_rows"), col("med2"),
        col("mad4"), col("n_outliers"),
        expr("n_outliers * 1000000 DIV n_rows").as("outlier_ppm"))
      .orderBy(groupCol)
  }

  /** Curriculum training order (Bengio et al. 2009 lineage):
    * highest-quality documents first, in `stages` quality tiers, with
    * a deterministic md5 shuffle INSIDE each tier — the "train on
    * clean data first, anneal into the tail" ordering, emitted as an
    * explicit `global_pos` every pretraining loader can consume.
    * Quality is [[TextAnalysis.qualityBlend]]'s rank-CDF blend (the
    * sort-free percentile), so a tier is a fixed ppm band, stable
    * under corpus growth.
    *
    * Scale shape: no global sort anywhere — the position is rank
    * under the lexicographic key (stage, shard, h, id), computed the
    * [[Sampling.shuffleOrder]] way: the md5 first byte range-shards
    * each stage into 256 shards (a MONOTONE prefix of the sort key,
    * so per-(stage, shard) ranks concatenate into the global order),
    * each cell ranks locally under one window, and cell base offsets
    * come from a ≤ stages·256-row count rollup joined back by
    * broadcast. Two corpus scans (blend histogram + lookup) plus one
    * shuffle keyed by (stage, shard).
    */
  def curriculumOrder(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", stages: Int = 4,
                      seed: String = "42"): DataFrame = {
    require(stages >= 1, "stages must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val blend = TextAnalysis.qualityBlend(docs, textCol, idCol)
      .select(col("doc_id"), col("blend_ppm"))
    // best blend → stage 0; the ppm band edges are fixed constants
    val stage = (lit(stages - 1L) -
      least(lit(stages - 1L),
        expr(s"blend_ppm * $stages DIV 1000000"))).as("stage")
    val h = md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
    val base = blend.select(col("doc_id"), col("blend_ppm"),
      stage, h.as("_h"),
      conv(substring(h, 1, 2), 16, 10)
        .cast(org.apache.spark.sql.types.LongType).as("_shard"))
    val ranked = base.withColumn("_rank",
      row_number().over(W.partitionBy(col("stage"), col("_shard"))
        .orderBy(col("_h").asc, col("doc_id").asc))
        .cast(org.apache.spark.sql.types.LongType))
    val offsets = base.groupBy("stage", "_shard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          W.orderBy(col("stage").asc, col("_shard").asc)
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("stage", "_shard", "_offset")
    ranked.join(broadcast(offsets), Seq("stage", "_shard"))
      .select(col("doc_id"), col("stage"), col("blend_ppm"),
        (col("_offset") + col("_rank") - 1L).as("global_pos"))
      .orderBy("doc_id")
  }
}
