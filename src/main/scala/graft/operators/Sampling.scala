package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampling + exploration scans — the reference's Data Explorer surface
  * (SURVEY §2.1 S2/S3, §2.2 P2/P3).
  */
object Sampling {

  /** S3/S4: newest-N by a recency key — the reference's
    * `find().sort("_id", DESCENDING).limit(n)`
    * (`core/extractor.py:362-395`). Spark plans TakeOrderedAndProject:
    * per-partition top-k then a k-row merge on the driver — no full
    * sort, no shuffle; scales to any partition count.
    */
  def newestN(df: DataFrame, key: String, n: Int): DataFrame =
    df.orderBy(col(key).desc).limit(n)

  /** S2-at-scale: deterministic hash sample. The reference delegates to
    * MongoDB's server-side `$sample` (`core/analyser.py:254`); the
    * honest distributed equivalent that stays reproducible across
    * cluster sizes (unlike `df.sample`, whose output depends on
    * partitioning) is a hash-threshold filter on a stable key: keep a
    * row iff the first 4 hex chars of md5(key) fall under
    * `permille * 65536 / 1000`. Embarrassingly parallel, no shuffle,
    * pushes the scan down, and any engine can reproduce it.
    */
  def hashSample(df: DataFrame, key: String, permille: Int): DataFrame =
    df.filter(
      substring(md5(col(key).cast(StringType)), 1, 4) < hexThreshold(permille))

  /** 4-hex-digit threshold under which ~permille/1000 of uniform md5
    * prefixes fall. Plain lexicographic compare on the hex string keeps
    * the predicate portable across engines (md5 is the only shared
    * primitive).
    */
  def hexThreshold(permille: Int): String =
    if (permille >= 1000) "g"   // > any hex prefix: keep everything
    else f"${permille * 65536 / 1000}%04x"

  /** Deterministic mixture sampling: a per-stratum keep rate (permille)
    * — the "data mixture" step of a training pipeline (up-weight books,
    * down-weight crawl, ...) expressed as one row-local hash-threshold
    * predicate. No shuffle, no RNG: the same doc survives on any
    * cluster, any partitioning, any engine, and re-runs are exactly
    * reproducible. Strata missing from the map keep `defaultPermille`.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
                    rates: Map[String, Int],
                    defaultPermille: Int = 0): DataFrame = {
    val threshold = rates.foldLeft(
      lit(hexThreshold(defaultPermille))) { case (acc, (s, pm)) =>
      when(col(stratumCol) === s, lit(hexThreshold(pm))).otherwise(acc)
    }
    df.filter(
      substring(md5(col(keyCol).cast(StringType)), 1, 4) < threshold)
  }

  /** Deterministic global shuffle position WITHOUT a global sort —
    * the "shuffle the corpus before packing" step every pretraining
    * run needs, reproducible across engines and cluster sizes. A
    * doc's position is its rank under (md5(seed:id), id); computing
    * that rank globally would be a single-partition sort, so instead:
    * the first hash byte range-shards into 256 shards (the shard is a
    * MONOTONE prefix of the sort key, so per-shard ranks concatenate
    * into the global order), each shard ranks locally under one
    * window, and shard base offsets come from a 256-row count rollup
    * joined back by broadcast. One corpus shuffle keyed by shard —
    * the distributed zipWithIndex, as a declarative plan.
    */
  def shuffleOrder(df: DataFrame, idCol: String = "doc_id",
                   seed: String = "42"): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast(StringType)))
    val base = df.select(col(idCol).as("doc_id"), h.as("_h"),
      conv(substring(h, 1, 2), 16, 10).cast(LongType).as("shard"))
    val ranked = base.withColumn("_rank",
      row_number().over(W.partitionBy(col("shard"))
        .orderBy(col("_h").asc, col("doc_id").asc)).cast(LongType))
    // 256-row offset table: docs in all shards strictly before mine
    val offsets = base.groupBy("shard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(W.orderBy(col("shard").asc)
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "_offset")
    ranked.join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("shard"),
        (col("_offset") + col("_rank") - 1L).as("global_pos"))
      .orderBy("doc_id")
  }

  /** Deterministic token-budget fill per stratum — the "mixture by
    * token share" step (Dolma/Pile-style: each source contributes a
    * target number of TOKENS, not documents). Within each stratum,
    * documents are ordered by their md5 id hash (a reproducible
    * shuffle) and taken until the stratum's budget is filled; the
    * document that crosses the boundary is included, so any budget > 0
    * takes at least one document. `start_tok` is the running token
    * offset before each kept doc — the exact resume point for an
    * incremental top-up. Strata absent from `budgets` get
    * `defaultBudget`.
    *
    * Scale shape: one shuffle keyed by stratum; the running sum is a
    * per-stratum window scan. A stratum too large for one task should
    * be pre-gated with [[mixtureSample]] (row-local hash threshold) to
    * the right order of magnitude, then budget-filled exactly — the
    * two compose because both order by the same id hash.
    */
  def tokenBudgetSample(df: DataFrame, stratumCol: String,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        budgets: Map[String, Long] = Map.empty,
                        defaultBudget: Long = 0L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) =>
        when(col("stratum") === s, lit(b)).otherwise(acc)
    }
    val w = W.partitionBy(col("stratum"))
      .orderBy(col("_h").asc, col("doc_id").asc)
    df.select(col(idCol).as("doc_id"),
        col(stratumCol).as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType)
          .as("n_tokens"),
        md5(col(idCol).cast(StringType)).as("_h"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .filter(col("start_tok") < budget)
      .select("doc_id", "stratum", "n_tokens", "start_tok")
      .orderBy("doc_id")
  }

  /** S2 exact-N random sample (non-reproducible across engines, so not
    * oracle-checked; reference parity for `$sample`'s exact-N contract).
    */
  def randomN(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Deterministic stratified sample: up to `n` rows per stratum
    * (language, source, quality bucket, ...), chosen by md5-of-key
    * order rather than RNG — the training-data "cap per slice"
    * operation, reproducible across engines and cluster sizes. One
    * shuffle keyed by the stratum; per-stratum state is a rank
    * counter, so a hot stratum costs a big sort partition — for a
    * degenerate stratum ratio pre-filter with [[hashSample]] first.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast(StringType)).asc, col(keyCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n).drop("_rn")
  }

  /** Sequence packing for LM pretraining: the concat-then-chunk layout.
    * Each document is assigned a shard (md5 of id, so any engine
    * reproduces it) and, within its shard's doc_id-ordered stream, the
    * training-context bin its first token lands in when the stream is
    * chunked every `tokenBudget` tokens.
    *
    * Scale shape: the running token sum is a window per shard —
    * packing is inherently sequential *within* a stream, so shards ARE
    * the parallelism (pick nShards ≈ cluster cores; each shard's
    * window is one sorted partition). No driver state, no RNG;
    * deterministic on any partitioning. A doc whose tokens cross a
    * chunk boundary spans bins, as concat-then-chunk pipelines do —
    * `start_tok` gives the exact offset for the chunker.
    */
  def packSequences(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", tokenBudget: Int = 512,
                    nShards: Int = 8,
                    tokenCounter: Column => Column =
                      TextAnalysis.tokenCount(_)): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(col(idCol).cast(StringType)), 1, 4), 16, 10)
        .cast(LongType), lit(nShards.toLong))
    val w = W.partitionBy(col("shard")).orderBy(col("doc_id").asc)
    df.select(col(idCol).as("doc_id"),
        tokenCounter(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin",
        floor(col("start_tok") / lit(tokenBudget.toDouble)).cast(LongType))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_tok"), col("bin"))
      .orderBy("doc_id")
  }

  /** P2: display sanitization of one string column — values whose
    * serialized form exceeds `maxLen` chars are replaced by the
    * reference's `"<type>(too large to display inline)"` marker
    * (`core/extractor.py:430-439`), shorter ones pass through.
    */
  def sanitizeString(c: Column, typeName: String, maxLen: Int = 500): Column =
    when(length(c) > maxLen,
      lit(s"$typeName(too large to display inline)")).otherwise(c)

  /** P2: binary columns render as hex, truncated to 64 chars
    * (`core/extractor.py:419-425`).
    */
  def sanitizeBinary(c: Column): Column = substring(hex(c), 1, 64)

  /** P3: table-cell truncation with ellipsis
    * (`views/schema_analysis_view.py:389-393`).
    */
  def truncateCell(c: Column, m: Int = 30): Column =
    when(length(c) > m, concat(substring(c, 1, m), lit("..."))).otherwise(c)
}
