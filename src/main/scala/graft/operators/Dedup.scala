package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis.{fingerprint, shingles, tokens}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard (BASELINE.json north-star).
  * All hashing is md5-derived so results are deterministic and
  * reproducible in any engine — no seed-dependent JVM hashing.
  *
  * Scale design: every variant is join/groupBy-shaped (shuffle keyed by
  * hash/band/shingle), never pairwise-all. The only quadratic step is
  * *within* a candidate bucket, which the frequent-key caps bound.
  *
  * Cache lifetime: the near-dup operators `persist()` their shared
  * intermediates (shingle sets / block tables) and leave them cached —
  * the shared subtree is consumed by BOTH sides of a self-join inside
  * the returned lazy plan, and Spark offers no safe point to unpersist
  * before the caller's action runs. Long-lived sessions issuing many
  * near-dup queries should call `spark.catalog.clearCache()` between
  * them (as `graft.Bench` does) or stage intermediates to tables.
  * [[connectedGroups]] is the exception: it runs its own actions, so
  * it releases every checkpoint/persist before returning (round blocks
  * as the loop advances, the rest via a parquet staging handoff).
  */
object Dedup {

  /** Exact dedup groups: one row per distinct normalized-text
    * fingerprint with its copy count and the survivor (min id) —
    * hash-groupBy, one shuffle on the 16-byte key.
    */
  def exactGroups(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    // no spread(): one md5 per row is cheaper than round-robin
    // shuffling the full text, and the groupBy shuffles 16-byte keys
    df.select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .orderBy("fp")

  /** Exact dedup: keep the lowest-id row per fingerprint. */
  def exactDedup(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol)))
      .orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Corpus snapshot diff: compare two crawl snapshots by id and
    * normalized-text fingerprint. Status per document:
    * `added` (id only in new), `removed` (id only in old),
    * `changed` (id in both, fingerprint differs),
    * `kept` (id in both, fingerprint equal). The incremental-crawl
    * accounting every recurring ingest needs before deciding what to
    * re-process. One full-outer join keyed by id; only (id, 16-byte
    * fp) pairs shuffle — text never crosses the wire.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("_old_fp"))
    val n = newDf.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("_new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_old_fp").isNull, lit("added"))
          .when(col("_new_fp").isNull, lit("removed"))
          .when(col("_old_fp") === col("_new_fp"), lit("kept"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split: md5-of-id buckets a document
    * into a named split by cumulative permille ranges — row-local, no
    * RNG, reproducible on any engine/partitioning (a seeded
    * randomSplit is neither), and stable under corpus growth: a doc's
    * split never changes when other docs arrive. `splits` maps name →
    * permille, must sum to ≤1000; the remainder falls in the LAST
    * split.
    */
  def splitAssign(df: DataFrame, idCol: String = "doc_id",
                  splits: Seq[(String, Int)] =
                    Seq("test" -> 50, "val" -> 50, "train" -> 900))
      : DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).dropRight(1).foldRight(
      lit(splits.last._1): Column) { case (((name, _), upTo), acc) =>
      when(h < lit(Sampling.hexThreshold(upTo)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leak-safe train/val/test split: [[splitAssign]]'s deterministic
    * md5-permille buckets keyed by each document's NEAR-DUP GROUP
    * REPRESENTATIVE instead of the document itself, so every member
    * of a duplicate cluster lands in the SAME split. Near-identical
    * train/test pairs are the canonical eval-contamination leak —
    * per-doc hashing puts ~p·(1−p) of every dup cluster's pairs
    * across the boundary; keying on the cluster representative puts
    * zero (spec-pinned: no near-dup pair straddles splits).
    * Singletons are their own representative, so the non-duplicated
    * bulk of the corpus splits exactly as [[splitAssign]] would.
    *
    * Scale shape: the pair graph + [[connectedGroups]] is the
    * existing dedup pipeline (banded LSH, pointer-jumping CC at
    * scale); the split itself adds ONE left join of the corpus
    * against the group table (dup-cluster-member-sized, usually ≪
    * corpus) and a row-local md5 bucket — no new shuffles beyond the
    * join. At 100 TB you already ran dedup; this reuses its groups.
    */
  def leakSafeSplit(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    threshold: Double = 0.3,
                    splits: Seq[(String, Int)] =
                      Seq("test" -> 50, "val" -> 50, "train" -> 900))
      : DataFrame = {
    val groups = connectedGroups(minhashNearDups(df, textCol, idCol,
        threshold = threshold))
      .select(col("id").as(idCol), col("group_rep"))
    splitAssign(
      df.select(col(idCol))
        .join(groups, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("group_rep"), col(idCol)).as("rep")),
      idCol = "rep", splits = splits)
      .select(col(idCol), col("rep").as("group_rep"), col("split"))
      .orderBy(idCol)
  }

  /** Quality-aware canonical selection: per exact-dup group keep the
    * row maximizing `score` (ties → lowest id). The curation upgrade
    * over [[exactDedup]]'s keep-first: when a crawl captures the same
    * page with and without boilerplate damage, the best-quality copy
    * survives, not the first-seen one. One shuffle on the 16-byte
    * fingerprint; `n_copies` rides the same window partition.
    */
  def keepBest(df: DataFrame, score: Column, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("_fp"))
      .orderBy(col("_score").desc, col(idCol).asc)
    df.withColumn("_fp", fingerprint(col(textCol)))
      .withColumn("_score", score)
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("_fp"))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_fp", "_score")
  }

  /** Inter-source duplicate overlap matrix: for each source pair, how
    * many distinct normalized fingerprints they share — the dataset
    * curation question "how much of source A is already in source B"
    * (licensing audits, mixture design, crawl-snapshot diffing).
    * Shuffle keyed by fingerprint; per-fingerprint work is bounded by
    * (#sources carrying it)², and #sources is catalog-sized — scales
    * linearly in the corpus.
    */
  def sourceOverlap(df: DataFrame, textCol: String = "text",
                    stratumCol: String = "source"): DataFrame = {
    val fp = df.select(col(stratumCol).as("src"),
      fingerprint(col(textCol)).as("fp")).distinct()
    val a = fp.select(col("src").as("src_a"), col("fp"))
    val b = fp.select(col("src").as("src_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
  }

  /** Benchmark decontamination: training documents that share any word
    * n-gram with a held-out test split (the train/eval-overlap scan an
    * LLM data pipeline runs before training). The split here is
    * deterministic — docs whose md5(doc_id) starts with '0' or '1'
    * (~1/8) stand in for the benchmark suite.
    *
    * Scale shape: the test side is a benchmark suite — tiny next to a
    * 100 TB corpus — so its distinct n-gram set is broadcast and the
    * scan over training shingles never shuffles the corpus; the only
    * shuffle is the per-doc count aggregation on doc_id. n=8 keeps
    * chance collisions nil (k-word n-grams, vocabulary^8 space).
    */
  def decontaminate(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", n: Int = 8): DataFrame = {
    val isTest = substring(md5(col(idCol).cast("string")), 1, 1)
      .isin("0", "1")
    decontaminateAgainst(df.filter(!isTest), df.filter(isTest),
      textCol, idCol, n)
  }

  /** One row per (doc, distinct n-gram) — the shared projection both
    * decontamination shapes scan each side with.
    */
  private def docGrams(d: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame =
    // NO spread(): A/B-probed in r19 — the compiled WordShingles
    // explode is ~0.17 s warm either way at sf0.1, so the round-robin
    // buys nothing measurable here (unlike the md5/substr window
    // explodes of the ExactSubstr family)
    d.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), n))).as("g"))

  /** The shared tail of both decontamination shapes: broadcast the
    * test (g, test_id) table against the training grams and roll up
    * per-doc hit counts.
    */
  private def contaminationAgg(trainG: DataFrame,
                               testG: DataFrame): DataFrame =
    trainG
      .join(broadcast(testG), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("test_id")).as("n_test_docs"))
      .orderBy("doc_id")

  /** The production shape of [[decontaminate]]: benchmark/eval docs
    * live in their own (small) table, so the training corpus is
    * scanned exactly once and the test n-gram set broadcasts.
    */
  def decontaminateAgainst(train: DataFrame, test: DataFrame,
                           textCol: String = "text",
                           idCol: String = "doc_id",
                           n: Int = 8): DataFrame = {
    val testG = docGrams(test, textCol, idCol, n)
      .select(col("g"), col("doc_id").as("test_id")).distinct()
    contaminationAgg(docGrams(train, textCol, idCol, n), testG)
  }

  /** The audit view of decontamination, flipped to the TEST side: for
    * each benchmark/eval document, how exposed it is in the training
    * corpus — distinct leaked n-grams, distinct train documents
    * carrying them, and the leaked share of its own n-grams as an
    * integer ppm (round-half-up, the cross-engine mean discipline).
    * [[decontaminateAgainst]] answers "which TRAIN docs to drop";
    * this answers "which EVAL items are compromised and how badly" —
    * the report an eval-integrity review wants. Zero-gram test docs
    * (shorter than n tokens) report 0/0/0.
    *
    * Scale shape: same as the filter twin — the corpus is scanned
    * once, the test gram table broadcasts, and the rollup is keyed by
    * test id (benchmark-sized).
    */
  def contaminationReport(train: DataFrame, test: DataFrame,
                          textCol: String = "text",
                          idCol: String = "doc_id",
                          n: Int = 8): DataFrame = {
    val testG = docGrams(test, textCol, idCol, n)
      .select(col("g"), col("doc_id").as("test_id")).distinct()
    val hits = docGrams(train, textCol, idCol, n)
      .join(broadcast(testG), "g")
      .groupBy(col("test_id"))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("doc_id")).as("n_train_docs"))
    test
      .select(col(idCol).as("test_id"),
        size(array_distinct(shingles(col(textCol), n)))
          .cast(LongType).as("n_ngrams"))
      .join(hits, Seq("test_id"), "left")
      .select(col("test_id"), col("n_ngrams"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"))
      .withColumn("exposed_ppm",
        when(col("n_ngrams") === 0L, lit(0L)).otherwise(
          expr("(1000000 * n_shared_ngrams) DIV n_ngrams + " +
            "IF(2 * ((1000000 * n_shared_ngrams) % n_ngrams) " +
            ">= n_ngrams, 1L, 0L)")))
      .orderBy("test_id")
  }

  /** The 100 TB shape of [[decontaminateAgainst]]: instead of joining
    * every training shingle against the broadcast test n-gram set, a
    * Bloom filter over the test n-grams (~`bitsPerKey`/8 bytes per
    * key) is evaluated ROW-LOCALLY against each training shingle, and
    * only the tiny maybe-contaminated candidate slice enters the exact
    * broadcast join — which removes Bloom false positives, so the
    * result is bit-identical to the exact operator. Clean documents
    * (the overwhelming majority) never touch the join at all; the
    * broadcast payload shrinks from the full n-gram strings to a long
    * array ~8-16x smaller.
    *
    * Probe hashes are xxhash64 under Kirsch-Mitzenmacher double
    * hashing (probe j = h1 + j*h2 masked to the power-of-two bit
    * count); the set bits are computed by a Spark job over the test
    * grams themselves, so driver and executors share one hash
    * implementation and nothing can drift. The driver-side collect is
    * bounded by the test side, which is benchmark-suite-sized by
    * contract (same assumption the exact operator's broadcast makes).
    *
    * NOTE: unlike the lazy operators, CALLING this method runs one
    * small Spark job (the test-gram hash collect) — the filter bits
    * must exist before the returned plan can be built. Index-building
    * operators share this contract.
    */
  def decontaminateBloomAgainst(train: DataFrame, test: DataFrame,
                                textCol: String = "text",
                                idCol: String = "doc_id", n: Int = 8,
                                bitsPerKey: Int = 16,
                                numProbes: Int = 5): DataFrame = {
    // staged, not persisted: the test-gram table feeds BOTH the eager
    // bit-build collect below and the verify join inside the RETURNED
    // plan, so a persist here would outlive the call with no release
    // point. It is benchmark-suite-sized by contract — the staging
    // write is trivial and leaves no cached RDD behind.
    val testG = graft.util.Utils.stage(
      docGrams(test, textCol, idCol, n)
        .select(col("g"), col("doc_id").as("test_id")).distinct(),
      "bloom_testg")
    contaminationAgg(
      docGrams(train, textCol, idCol, n)
        .filter(bloomMightContain(testG, bitsPerKey, numProbes)
          .apply(col("g"))),
      testG)
  }

  /** Build Kirsch-Mitzenmacher Bloom bits over the distinct `g`
    * column of `keys` and return the ROW-LOCAL might-contain
    * predicate as a Column→Column — the shared core of
    * [[decontaminateBloomAgainst]] and the streaming monitor
    * ([[graft.streaming.ProfileStream.decontamStream]]). No false
    * negatives ever, so composing with an exact verify join yields
    * bit-identical results to the unfiltered operator.
    *
    * NOTE: CALLING this runs one small Spark job (the key-hash
    * collect), bounded by the key side, which is benchmark-suite-
    * sized by the callers' contract.
    */
  private[graft] def bloomMightContain(keys: DataFrame,
      bitsPerKey: Int = 16, numProbes: Int = 5): Column => Column = {
    // ONE Spark job builds the filter: collect the raw (h1, h2) hash
    // pair per distinct gram, size m from the count, set bits on the
    // driver with the same Kirsch-Mitzenmacher arithmetic the
    // executors evaluate — one hash implementation, zero drift
    val hashPairs = keys.select(
        xxhash64(lit("graft-bloom-1"), col("g")),
        xxhash64(lit("graft-bloom-2"), col("g")))
      .distinct().collect()
    val nKeys = math.max(hashPairs.length.toLong, 1L)
    // power-of-two bit count so probe index = hash & (m - 1)
    val m = math.max(64L,
      java.lang.Long.highestOneBit(nKeys * bitsPerKey - 1) << 1)
    val words = new Array[Long]((m / 64).toInt)
    hashPairs.foreach { r =>
      // mask each hash into [0, m) BEFORE the double-hash combine:
      // j*h2 then stays < 2^63 for any realistic m (ANSI overflow-safe
      // on the executor side, exact-same values here)
      val h1 = r.getLong(0) & (m - 1)
      val h2 = r.getLong(1) & (m - 1)
      (0 until numProbes).foreach { j =>
        val i = (h1 + j * h2) & (m - 1)
        words((i >>> 6).toInt) |= (1L << (i & 63).toInt)
      }
    }
    def probes(c: Column): Seq[Column] = {
      val h1 = xxhash64(lit("graft-bloom-1"), c).bitwiseAND(lit(m - 1))
      val h2 = xxhash64(lit("graft-bloom-2"), c).bitwiseAND(lit(m - 1))
      (0 until numProbes).map(j =>
        (h1 + lit(j.toLong) * h2).bitwiseAND(lit(m - 1)))
    }
    val bitsLit = typedLit(words.toSeq)
    (c: Column) =>
      probes(c).map { i =>
        element_at(bitsLit, (i / 64).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (i % 64).cast("int"))) =!= lit(0L)
      }.reduce(_ && _)
  }

  /** Line-level exact dedup (the CCNet/RefinedWeb boilerplate-removal
    * pass): a LINE (text split on `sep`) that occurs in more than
    * `maxDocs` DISTINCT documents is boilerplate — navigation headers,
    * cookie banners, copyright footers — and is dropped from every
    * document; unique body lines survive in their original order.
    * Lines that are blank after trimming never count toward the cap
    * and are always kept (dropping them would mangle formatting).
    * Repetition *within* one document is [[graft.operators.TextAnalysis.repetitionProfile]]'s
    * job, not this one's — hence the distinct-document count.
    *
    * Returns (doc_id, n_lines, n_kept, clean_text).
    *
    * Scale shape: the occurrence count shuffles 16-byte line hashes
    * (one per distinct non-blank line per document); the banned set —
    * lines above the cap — is the boilerplate vocabulary, tiny next to
    * the corpus, so the removal anti-join broadcasts at any realistic
    * cap; the rebuild groupBy is the one corpus-sized shuffle, keyed
    * by doc_id with (pos, line) pairs as payload.
    */
  def lineDedup(df: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", sep: String = "\n",
                maxDocs: Int = 1): DataFrame = {
    val lines = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "line")
    val banned = lines
      .filter(trim(col("line")) =!= "")
      .select(col("doc_id"), md5(trim(col("line"))).as("k")).distinct()
      .groupBy("k").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select("k")
    val kept = lines.join(broadcast(banned),
      md5(trim(col("line"))) === col("k"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("clean_text"))
    // split() always yields >= 1 element, so `lines` retains every doc
    val totals = lines.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Cross-corpus dedup: drop documents whose normalized-text
    * fingerprint already exists in a reference corpus (the
    * incremental-crawl shape: dedup the new batch against everything
    * already ingested). Pure anti-join on the 16-byte fingerprint —
    * one shuffle, no text ever crosses the wire.
    */
  def dedupAgainst(fresh: DataFrame, seen: DataFrame,
                   textCol: String = "text"): DataFrame =
    fresh.join(
      seen.select(fingerprint(col(textCol)).as("_seen_fp")).distinct(),
      fingerprint(fresh(textCol)) === col("_seen_fp"), "left_anti")

  /** MinHash signature: hash lane j (0-based) is the minimum over
    * shingles of an 8-hex-char slice of md5("g:" || shingle), where
    * g = j/4 — one md5 yields four independent 32-bit lanes, so
    * `numHashes` lanes cost numHashes/4 md5 calls per shingle. Computed
    * as explode → projection (the md5s, once per shingle) → groupBy(id)
    * with numHashes min-aggregates: map-side partial aggregation
    * collapses the shuffle to one row per document, and nothing runs in
    * interpreted lambda land (the previous `array_min(transform(...))`
    * form paid 8 md5s per shingle in interpreted eval — 4× the hashing
    * and none of it codegen'd).
    * Returns (id, sig: array[numHashes] of 8-hex strings).
    */
  def minhashSignatures(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        numHashes: Int = 8): DataFrame =
    signaturesFromSets(
      df.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol))).as("sh")),
      numHashes)

  /** Signatures from a prebuilt (id, sh: array<string>) shingle-set
    * DataFrame — a pure projection via the compiled
    * [[graft.functions.MinHashSig]] row-local fold (no explode, no
    * per-doc groupBy, no shuffle). Docs with an empty shingle set
    * (< n tokens) get NO signature row — MinHashSig yields NULL there
    * and the filter drops them, exactly like the former explode path:
    * an all-null signature would band-key every short doc to md5("")
    * and collide them all into one LSH bucket per band (a skew
    * hotspot), and the DuckDB oracle's unnest-based CTE omits them
    * too.
    */
  def signaturesFromSets(sets: DataFrame, numHashes: Int = 8): DataFrame =
    // the short-doc drop runs on the INPUT before the hash expression:
    // filtering on the expression's null output would inline a second
    // full evaluation into the Filter (the CollapseProject trap the
    // minhashNearDups comment documents). array_compact makes the
    // guard null-element-aware: an all-null shingle array drops
    // exactly like the empty one. This is an INTENTIONAL behavior
    // change vs the old explode path — explode keeps null elements,
    // so that path emitted an all-null-laned sig row for such docs
    // (which then band-keyed to md5 of nulls, the same skew hotspot
    // the empty-array guard exists to prevent); dropping aligns the
    // all-null case with the empty-array contract. withHs=false skips
    // the verify-set lane this sig-only path never reads.
    sets.filter(size(array_compact(col("sh"))) > 0)
      .select(col("id"),
        graft.functions.MinHashSig.minHashSig(col("sh"), numHashes,
          withHs = false).getField("sig").as("sig"))

  /** Row-local minhash signature — the SAME lanes as
    * [[minhashSignatures]] (min over shingles of an 8-hex slice of
    * md5(g || ':' || shingle)) but computed per row as an array
    * expression, no explode, no shuffle. This is the STREAMING shape:
    * a stateful streaming query cannot interpose the batch path's
    * groupBy without becoming a multi-stage aggregation, while a pure
    * projection composes with any watermark/dedup operator. For batch
    * profiling prefer [[minhashSignatures]] (the interpreted
    * higher-order form here pays ~4× the md5 work per shingle — fine
    * at stream rates, wasteful over a full corpus). Lanes are null
    * iff the document has no shingles (< 3 tokens).
    */
  def minhashSigExpr(text: Column, numHashes: Int = 8): Column = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    val sh = array_distinct(shingles(text))
    array((0 until numHashes).map { j =>
      array_min(transform(sh, x =>
        substring(md5(concat(lit(s"${j / 4}:"), x)),
          (j % 4) * 8 + 1, 8)))
    }: _*)
  }

  /** LSH banding: signature split into `bands` bands of
    * numHashes/bands rows each; docs sharing any band key are candidate
    * near-dups. Emits (id, band_idx, band_key). The band join is the
    * scale path: shuffle keys are (band_idx, band_key), quadratic work
    * only inside a bucket.
    */
  def minhashBands(sigs: DataFrame, numHashes: Int = 8,
                   bands: Int = 4): DataFrame = {
    val r = numHashes / bands
    val bandRows = (0 until bands).map(b =>
      struct(lit(b).as("band_idx"),
        md5(concat_ws("|",
          (0 until r).map(i => col("sig").getItem(b * r + i)): _*))
          .as("band_key")))
    sigs.select(col("id"), explode(array(bandRows: _*)).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_key"))
  }

  /** Declared bands-vs-recall curve for the MinHash-LSH near-dup
    * family — the fourth knob curve (after nprobe, kCand, planes, and
    * the semantic gate's tables): at fixed `numHashes`, each
    * `bandKnobs` arm reports how often LSH banding recovers a planted
    * near-duplicate of known Jaccard. The natural corpus's near-dups
    * all sit at Jaccard ≥ 0.9 (trivially recovered at any banding),
    * so the fixture plants TOKEN-PREFIX mirrors at graded overlap:
    * level (num, den) keeps the first ⌈|toks|·num/den⌉ tokens, whose
    * shingle set is a SUBSET of the source's, so true Jaccard ≈
    * num/den with per-doc jitter — and it is computed EXACTLY per
    * plant, so the recall denominator is the exact-Jaccard-eligible
    * count, never the plant count.
    *
    * Entirely ROW-LOCAL: both signatures sit side by side per planted
    * pair, and "found at bands = b" is a lane-equality expression (a
    * band key matches ⟺ its md5 input lanes match) — no self-join,
    * no shuffle beyond the bounded fixture. Found-at-b is what
    * [[minhashNearDups]](bands = b) surfaces for the pair
    * (spec-pinned equal on the mirror corpus). Monotonicity along the
    * doubling chain 1 | 2 | 4 | 8 is PROVED, not observed: doubling
    * bands splits each lane group in two, and all-lanes-equal over a
    * group implies all-equal over both halves — so hit(b) ⇒ hit(2b)
    * (the refinement argument; recall can only grow with bands, and
    * the curve prices what each doubling buys).
    */
  def minhashBandCurve(df: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id", numHashes: Int = 8,
                       bandKnobs: Seq[Int] = Seq(1, 2, 4, 8),
                       levels: Seq[(Int, Int)] =
                         Seq((3, 4), (1, 2), (3, 10)),
                       plantEvery: Int = 5,
                       threshold: Double = 0.25): DataFrame = {
    require(bandKnobs.nonEmpty && levels.nonEmpty &&
      bandKnobs.forall(b => numHashes % b == 0))
    def lanes(sh: Column): Column = array((0 until numHashes).map { j =>
      array_min(transform(sh, x =>
        substring(md5(concat(lit(s"${j / 4}:"), x)),
          (j % 4) * 8 + 1, 8)))
    }: _*)
    val src = graft.util.Utils.spread(df)
      .filter(col(idCol) % plantEvery === 0)
      .select(col(idCol).as("orig"),
        filter(split(col(textCol), "\\s+"), x => x =!= "").as("toks"),
        array_distinct(shingles(col(textCol))).as("dsh"))
    val pair = levels.zipWithIndex.map { case ((num, den), lv) =>
      // ⌊|toks|·num/den⌋ with a 3-token floor (below 3 tokens there
      // is no shingle at all) — exact integer DIV in both engines
      val k = greatest(expr(s"(size(toks) * $num) DIV $den"), lit(3))
      src.select(col("orig"), lit(lv.toLong).as("level"),
        lit(math.round(num * 1e6 / den)).as("overlap_ppm"),
        col("dsh"),
        array_distinct(shingles(
          array_join(slice(col("toks"), lit(1), k), " "))).as("msh"))
    }.reduce(_ unionByName _)
      .withColumn("_i",
        size(array_intersect(col("msh"), col("dsh"))).cast(LongType))
      .withColumn("_u", size(col("msh")) + size(col("dsh")) - col("_i"))
      .withColumn("jac", when(col("_u") > 0,
        round(col("_i").cast("double") / col("_u"), 6)).otherwise(0.0))
      .withColumn("dsig", lanes(col("dsh")))
      .withColumn("msig", lanes(col("msh")))
    val knob = explode(array(bandKnobs.map { b =>
      val r = numHashes / b
      val hit = (0 until b).map { j =>
        (0 until r).map(i =>
          col("dsig").getItem(j * r + i) ===
            col("msig").getItem(j * r + i)).reduce(_ && _)
      }.reduce(_ || _)
      struct(lit(b.toLong).as("bands"),
        coalesce(hit, lit(false)).as("hit"))
    }: _*))
    pair.select(col("level"), col("overlap_ppm"), col("jac"),
        knob.as("k"))
      .select(col("level"), col("overlap_ppm"), col("jac"),
        col("k.bands").as("bands"), col("k.hit").as("hit"))
      .groupBy("bands", "level", "overlap_ppm")
      .agg(count(lit(1)).as("planted"),
        sum(when(col("jac") >= threshold, 1L).otherwise(0L))
          .as("eligible"),
        sum(when(col("jac") >= threshold && col("hit"), 1L)
          .otherwise(0L)).as("found"),
        sum(floor(col("jac") * 1e6 + 0.5).cast(LongType))
          .as("_sum_micro"))
      .select(col("bands"), col("level"), col("overlap_ppm"),
        col("planted"), col("eligible"), col("found"),
        when(col("eligible") > 0,
          expr("found * 1000000 DIV eligible")).as("recall_ppm"),
        expr("_sum_micro DIV planted").as("mean_jaccard_micro"))
      .orderBy("bands", "level")
  }

  /** Candidate near-dup pairs from MinHash LSH, verified with the real
    * shingle-set Jaccard, thresholded. maxBucket caps degenerate
    * buckets (all-identical boilerplate) — the skew guard at scale.
    *
    * One pass builds everything per doc: the md5 signature lanes AND an
    * xxhash64'd shingle set (for the verify step) come out of a single
    * explode → groupBy(id) aggregation, so the expensive shingle
    * projection runs once and no string shingle ever persists — the
    * Jaccard verify intersects long arrays. Counts over 64-bit hashes
    * equal counts over the strings (collision odds ~n²/2⁶⁵).
    */
  def minhashNearDups(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", numHashes: Int = 8,
                      bands: Int = 4, threshold: Double = 0.5,
                      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    // ONE compiled row-local pass builds the signature AND the
    // xxhash64'd shingle set (for the verify step): a pure projection
    // — no shingle explode, no per-doc groupBy shuffle. hs values are
    // distinct per doc (array_distinct upstream); short docs drop via
    // the NULL filter, the former explode semantics. The STRUCT
    // column persists as-is and the field extraction happens on the
    // cached rows: extracting (or null-filtering) pre-persist lets
    // Catalyst inline the expression into every consumer — measured
    // 3× the hash work per row (filter + two getFields = three
    // evaluations).
    val sigd = graft.util.Utils.spread(df)
      .select(col(idCol).as("id"),
        graft.functions.MinHashSig.minHashSig(
          array_distinct(shingles(col(textCol))), numHashes).as("_sg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .filter(col("_sg").isNotNull)
      .select(col("id"), col("_sg").getField("sig").as("sig"),
        col("_sg").getField("hs").as("hs"))
    val bandsDf = minhashBands(sigd.select(col("id"), col("sig")),
      numHashes, bands)
    // bucket cap as groupBy count → anti-join (AQE broadcasts the tiny
    // frequent-bucket list), NOT a count-over-window: the window plan
    // full-sorts the band table; this shape only hash-aggregates it
    // (same pattern as jaccardNearDups' df cap).
    val big = bandsDf.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select("band_idx", "band_key")
    val bounded = bandsDf.join(big, Seq("band_idx", "band_key"),
      "left_anti")
    val l = bounded.select(col("band_idx"), col("band_key"),
      col("id").as("id1"))
    val rr = bounded.select(col("band_idx"), col("band_key"),
      col("id").as("id2"))
    val cands = l.join(rr, Seq("band_idx", "band_key"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val sets = sigd.select(col("id").as("sid"), col("hs"))
    cands
      .join(sets.withColumnRenamed("sid", "id1")
        .withColumnRenamed("hs", "hs1"), Seq("id1"))
      .join(sets.withColumnRenamed("sid", "id2")
        .withColumnRenamed("hs", "hs2"), Seq("id2"))
      .withColumn("shared", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard", round(col("shared").cast(DoubleType) /
        (size(col("hs1")) + size(col("hs2")) - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy("id1", "id2")
  }

  /** 60-bit SimHash from whitespace tokens: each token hashes to a
    * 60-bit value (first 15 hex chars of md5 — stays in a signed long);
    * each bit votes ±1; the sign vector is the fingerprint. Computed as
    * one explode + groupBy with 60 conditional sums — map-side partial
    * aggregation keeps the shuffle at one row per document.
    */
  /** Per-document 60-bit SimHash as a pure PROJECTION — the
    * [[graft.functions.SimHash64]] compiled row-local fold over the
    * distinct token array. No token explode, no 60-lane per-doc
    * groupBy, no shuffle: at 100 TB the signature pass is exactly one
    * corpus scan. Bit-identical to the explode + vote-aggregate
    * composition (spec-pinned), so the DuckDB oracle replays
    * unchanged; token-less docs drop, mirroring the explode path.
    */
  def simhash(df: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    graft.util.Utils.spread(df)
      .select(col(idCol).as("id"),
        graft.functions.SimHash64.simHash64(
          array_distinct(tokens(col(textCol)))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * the pigeonhole block trick: split 60 bits into maxDist+1 blocks —
    * any pair within distance shares at least one whole block, so the
    * join key is (block_idx, block_value); no all-pairs scan.
    *
    * Skew guard (the [[minhashNearDups]] cap, same anti-join shape): a
    * degenerate corpus — thousands of boilerplate-identical documents
    * hashing to one simhash — puts every copy in the same block bucket
    * and the self-join explodes m² pairs inside ONE task. Buckets
    * larger than `maxBucket` are pulled out of the pairwise join and
    * routed to exact-fingerprint grouping instead: their documents are
    * grouped by the full 60-bit simhash and each links to the group's
    * min id (hamming 0), emitting O(m) chain rows that downstream
    * connected-components closes into the same groups the m² expansion
    * would. Non-identical near-dup pairs hiding in a hot bucket are
    * dropped (the recall trade [[minhashNearDups]] makes); identical
    * ones — the overwhelming cause of hot buckets — are all kept.
    */
  def simhashNearDups(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id",
                      maxDist: Int = 3,
                      maxBucket: Int = 1000): DataFrame = {
    val sims = simhash(df, textCol, idCol)
    val nBlocks = maxDist + 1
    val width = 60 / nBlocks
    val blocks = (0 until nBlocks).map(b => struct(lit(b).as("block_idx"),
      shiftright(col("simhash"), b * width)
        .bitwiseAND((1L << width) - 1).as("block_val")))
    val exploded = sims.select(col("id"), col("simhash"),
        explode(array(blocks: _*)).as("blk"))
      .select(col("id"), col("simhash"),
        col("blk.block_idx"), col("blk.block_val"))
      .persist(StorageLevel.MEMORY_AND_DISK)   // both sides of self-join
    // bucket cap as groupBy count → anti-join (AQE broadcasts the tiny
    // hot-bucket list), the minhashNearDups shape
    val big = exploded.groupBy("block_idx", "block_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select("block_idx", "block_val")
    val bounded = exploded.join(big, Seq("block_idx", "block_val"),
      "left_anti")
    val l = bounded.select(col("block_idx"), col("block_val"),
      col("id").as("id1"), col("simhash").as("sh1"))
    val r = bounded.select(col("block_idx"), col("block_val"),
      col("id").as("id2"), col("simhash").as("sh2"))
    val pairsBounded = l.join(r, Seq("block_idx", "block_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2")))
          .cast(LongType).as("hamming"))
      // filter BEFORE distinct: candidates repeat across blocks, so the
      // distinct's shuffle shrinks to the pairs that actually survive
      .filter(col("hamming") <= maxDist)
    // hot-bucket escape: exact-simhash chain links, O(m) per group.
    // Survivor per simhash via groupBy min — NOT a window over the
    // simhash partition, which would buffer every identical-simhash
    // document in one task (re-creating the very skew the cap guards
    // against). groupBy keeps map-side partial aggregation, and the
    // one-row-per-simhash survivor side broadcasts under AQE.
    val hotIds = exploded.join(big, Seq("block_idx", "block_val"))
      .select(col("id"), col("simhash")).distinct()
    val hotReps = hotIds.groupBy("simhash").agg(min(col("id")).as("id1"))
    val hotPairs = hotIds.join(hotReps, Seq("simhash"))
      .filter(col("id") =!= col("id1"))
      .select(col("id1"), col("id").as("id2"),
        lit(0L).as("hamming"))
    pairsBounded.unionByName(hotPairs)
      .distinct()
      .orderBy("id1", "id2")
  }

  /** Near-dup pairs from any 64-BIT Hamming-space signature — the
    * [[simhashNearDups]] pigeonhole recipe generalized to a caller-
    * provided `(id, sig)` table (perceptual image hashes
    * ([[graft.functions.DHash64]]), audio fingerprints, any 64-bit
    * locality-sensitive code). 64 bits split into maxDist+1 blocks;
    * any pair within distance shares ≥ one whole block (pigeonhole),
    * so the join key is (block_idx, block_value) — banded, never
    * all-pairs; quadratic work only inside a bucket. `maxBucket`
    * bounds degenerate buckets exactly like the text family; callers
    * verifying against an exhaustive oracle set it above their corpus
    * so the cap provably never fires. Emits (id1, id2, hamming ≤
    * maxDist), id1 < id2. 64 must divide into maxDist+1 even blocks.
    *
    * RECALL ASYMMETRY UNDER THE CAP (r14 ADVICE, stated plainly):
    * the hot-bucket escape restores ONLY hamming-0 (identical-
    * signature) chain links. A genuine near-dup pair at distance
    * 1..maxDist whose EVERY shared block lands in a >maxBucket bucket
    * is silently dropped — the cap trades that tail of recall for a
    * bound on quadratic bucket work. The loss is observable, not
    * blind: [[hamming64CappedBuckets]] emits the capped-bucket census
    * for the same (sigs, maxDist, maxBucket), so a caller can see
    * exactly which blocks saturated and how many signatures sit in
    * the suppressed region before trusting the pair list.
    */
  def hamming64NearDups(sigs: DataFrame, idCol: String = "id",
                        sigCol: String = "sig", maxDist: Int = 3,
                        maxBucket: Int = 1000): DataFrame = {
    val nBlocks = maxDist + 1
    require(64 % nBlocks == 0, s"64 bits must split evenly into " +
      s"${nBlocks} blocks (maxDist+1)")
    val width = 64 / nBlocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val blocks = (0 until nBlocks).map(b =>
      struct(lit(b).as("block_idx"),
        // arithmetic shiftright sign-extends on the top block; the
        // mask discards the extension — same bits either way
        shiftright(col("sig"), b * width).bitwiseAND(mask)
          .as("block_val")))
    val exploded = sigs
      .select(col(idCol).as("id"), col(sigCol).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        explode(array(blocks: _*)).as("blk"))
      .select(col("id"), col("sig"),
        col("blk.block_idx"), col("blk.block_val"))
      .persist(StorageLevel.MEMORY_AND_DISK)   // both sides of self-join
    val big = exploded.groupBy("block_idx", "block_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select("block_idx", "block_val")
    val bounded = exploded.join(big, Seq("block_idx", "block_val"),
      "left_anti")
    val l = bounded.select(col("block_idx"), col("block_val"),
      col("id").as("id1"), col("sig").as("s1"))
    val r = bounded.select(col("block_idx"), col("block_val"),
      col("id").as("id2"), col("sig").as("s2"))
    val pairsBnd = l.join(r, Seq("block_idx", "block_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("s1").bitwiseXOR(col("s2")))
          .cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxDist)
    // hot-bucket escape: exact-signature chain links (hamming 0) via
    // groupBy-min survivor — the simhashNearDups shape verbatim
    val hotIds = exploded.join(big, Seq("block_idx", "block_val"))
      .select(col("id"), col("sig")).distinct()
    val hotReps = hotIds.groupBy("sig").agg(min(col("id")).as("id1"))
    val hotPairs2 = hotIds.join(hotReps, Seq("sig"))
      .filter(col("id") =!= col("id1"))
      .select(col("id1"), col("id").as("id2"), lit(0L).as("hamming"))
    pairsBnd.unionByName(hotPairs2)
      .distinct()
      .orderBy("id1", "id2")
  }

  /** Suppressed-recall visibility for [[hamming64NearDups]]: the
    * census of pigeonhole buckets the cap EXCLUDED from pair
    * generation — one row per (block_idx, block_val) with bucket_n >
    * maxBucket, carrying the member count. Empty ⟺ the cap never
    * fired ⟺ the pair list is exhaustive within maxDist; non-empty
    * rows locate exactly where non-zero-distance pairs may have been
    * lost (the asymmetry documented on [[hamming64NearDups]]). One
    * explode + one groupBy — strictly cheaper than the pair job it
    * audits, so running it alongside is never the bottleneck.
    */
  def hamming64CappedBuckets(sigs: DataFrame, idCol: String = "id",
                             sigCol: String = "sig", maxDist: Int = 3,
                             maxBucket: Int = 1000): DataFrame = {
    val nBlocks = maxDist + 1
    require(64 % nBlocks == 0, s"64 bits must split evenly into " +
      s"${nBlocks} blocks (maxDist+1)")
    val width = 64 / nBlocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val blocks = (0 until nBlocks).map(b =>
      struct(lit(b).as("block_idx"),
        shiftright(col(sigCol), b * width).bitwiseAND(mask)
          .as("block_val")))
    sigs.select(col(idCol).as("id"), col(sigCol).as(sigCol))
      .filter(col(sigCol).isNotNull)
      .select(explode(array(blocks: _*)).as("blk"))
      .select(col("blk.block_idx").cast(LongType).as("block_idx"),
        col("blk.block_val"))
      .groupBy("block_idx", "block_val")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .orderBy("block_idx", "block_val")
  }

  /** Transitive near-dup groups from a pair list: each node labeled
    * with the minimum id reachable through the pair graph — the step
    * that turns pairwise near-dup output into "keep one per group".
    * Standard distributed connected-components: every round each node
    * takes the min of its own and its neighbors' labels, then
    * pointer-jumps (`rep ← rep(rep)`), so label distance covered
    * doubles per round — O(log diameter) rounds even on chain-shaped
    * graphs (plain neighbor propagation measured 40+ rounds on the
    * sf0.1 near-dup graph; with jumping it is a handful). The driver
    * loop is bounded by `maxIter` with one cheap count per round — the
    * accepted shape for CC at scale (GraphX/GraphFrames do the same).
    * Checkpoint hygiene: each round's localCheckpoint blocks are
    * released as soon as the following round materializes, and the
    * converged labels are staged to parquet so every block —
    * including the last round's — is dropped before returning; the
    * session holds no cached RDDs afterwards. Returns (id, group_rep).
    */
  def connectedGroups(pairs: DataFrame, idCol1: String = "id1",
                      idCol2: String = "id2",
                      maxIter: Int = 50,
                      localEdgeLimit: Long = 4000000L): DataFrame = {
    // materialize the (typically expensive) pair pipeline exactly once
    // BEFORE fanning out: the symmetric union references `pairs` twice
    // and the loop rounds many more times — branches racing a cold
    // cache each recompute the whole upstream near-dup job (measured
    // 8× slower without the eager point here). The count also feeds
    // the size dispatch below.
    val p = pairs.select(col(idCol1).as("a"), col(idCol2).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = p.count()
    // Small-graph fast path: a near-dup edge list is duplicate-pairs
    // only — usually minuscule next to the corpus that produced it
    // (250 edges from 5k docs here; even a 1%-dup 10B-doc corpus is
    // ~100M edges, and 4M longs is a few hundred MB of driver heap).
    // Below the limit a driver union-find answers in one collect,
    // where the distributed loop pays ~5 rounds of join + checkpoint
    // + count latency for the same output. Long-id graphs only; the
    // iterative pointer-jumping path remains the at-scale shape.
    if (nEdges <= localEdgeLimit &&
        p.schema.fields.forall(_.dataType == LongType)) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x   // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      p.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(ra, rb)
      }
      p.unpersist()
      val minOfRoot = new java.util.HashMap[Long, Long]()
      parent.keySet().forEach { id =>
        val r = find(id)
        minOfRoot.merge(r, id, (x, y) => math.min(x, y))
      }
      val out = parent.keySet().toArray(Array.empty[java.lang.Long])
        .map(id => (id.longValue, minOfRoot.get(find(id.longValue)).longValue))
      return out.toSeq.toDF("id", "group_rep").orderBy("id")
    }
    // Distributed path. TRUNCATE lineage every round: an iterative loop
    // over plain persisted DataFrames nests every prior round's logical
    // plan inside the next one, and Catalyst (re)optimization time
    // grows exponentially with rounds — measured 100s+ on a 256-pair
    // graph. localCheckpoint replaces the plan with the materialized
    // partitions; on a real cluster use a reliable checkpoint dir
    // instead (executor loss invalidates local checkpoints).
    // checkpoint-block bookkeeping: localCheckpoint registers its RDD
    // in getPersistentRDDs but hands back no release handle, so each
    // checkpoint's RDD ids are captured by diffing the registry around
    // its (eager) creation. Actions inside this call are sequential,
    // so the diff sees exactly the blocks this round created.
    val sc = pairs.sparkSession.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def release(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var pre = persistedIds
    val edges = p
      .union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    val edgesIds = persistedIds -- pre
    p.unpersist()
    pre = persistedIds
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint()
    var curIds = persistedIds -- pre
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("b"), col("rep").as("brep")),
          Seq("b"))
        .groupBy("a").agg(min(col("brep")).as("nrep"))
        .select(col("a").as("id"), col("nrep"))
      val stepped = labels
        .join(nbr, Seq("id"), "left")
        .select(col("id"), col("rep").as("old"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // pointer jump: rep ← rep(rep). Reps are themselves node ids, so
      // the self-join always resolves; left join guards the fixpoint
      // rows where rep == id. The pre-step label rides along as `old`
      // so convergence is a cheap scan of the checkpointed result —
      // not a second join+count job against the previous round.
      pre = persistedIds
      val next = stepped
        .join(stepped.select(col("id").as("rid"), col("rep").as("rrep")),
          stepped("rep") === col("rid"), "left")
        .select(stepped("id"), stepped("old"),
          least(stepped("rep"), coalesce(col("rrep"), stepped("rep")))
            .as("rep"))
        .localCheckpoint()   // eager: materializes + cuts the lineage
      val changed = next.filter(col("rep") =!= col("old")).count()
      val nextIds = persistedIds -- pre
      // the previous round's blocks back nothing once `next` is
      // materialized — release them now instead of letting every
      // round's checkpoint pile up for the whole loop
      release(curIds)
      curIds = nextIds
      labels = next.select(col("id"), col("rep"))
      converged = changed == 0
      iter += 1
    }
    // stage the converged labels to parquet so the returned plan reads
    // files, then drop the remaining checkpoint blocks (edges + final
    // round) — no cached RDD survives this call
    val out = graft.util.Utils.stage(
      labels.select(col("id"), col("rep").as("group_rep")), "cc_labels")
    release(edgesIds)
    release(curIds)
    out.orderBy("id")
  }

  /** n-gram Jaccard near-dups via inverted shingle index: explode
    * distinct shingles, self-join on shingle (docs sharing ≥1 shingle),
    * count shared, compute exact Jaccard. maxDf drops
    * ubiquitous shingles (stopword boilerplate) — both a quality and a
    * skew guard: shuffle is keyed by shingle, and a shingle in f docs
    * costs f² pair rows.
    *
    * Shingles are xxhash64'd immediately (counts over 64-bit hashes
    * equal counts over strings): the inverted index and the self-join
    * shuffle 16-byte (id, hash) rows instead of ~40-byte strings, and
    * the doc-frequency cap is an anti-join against the (tiny) frequent
    * list — AQE broadcasts it — rather than a full sort window.
    */
  def jaccardNearDups(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", n: Int = 3,
                      threshold: Double = 0.3,
                      maxDf: Int = 100): DataFrame = {
    val hsets = graft.util.Utils.spread(df).select(col(idCol).as("id"),
      array_distinct(transform(shingles(col(textCol), n),
        x => xxhash64(x))).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)   // index + sizes branches
    val inv = hsets.select(col("id"), explode(col("hs")).as("h"))
    val freq = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("h"))
    val rare = inv.join(freq, Seq("h"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)   // both sides of self-join
    val shared = rare.select(col("h"), col("id").as("id1"))
      .join(rare.select(col("h"), col("id").as("id2")), Seq("h"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
    val sizes = hsets.select(col("id"), size(col("hs")).as("sz"))
    shared
      .join(sizes.withColumnRenamed("id", "id1")
        .withColumnRenamed("sz", "sz1"), Seq("id1"))
      .join(sizes.withColumnRenamed("id", "id2")
        .withColumnRenamed("sz", "sz2"), Seq("id2"))
      .withColumn("jaccard", round(col("shared").cast(DoubleType) /
        (col("sz1") + col("sz2") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("shared"), col("jaccard"))
      .orderBy("id1", "id2")
  }

  /** Cross-document repeated token spans — the exact-substring view of
    * duplication (the unit Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", deduplicates on): every
    * n-token window of every document, rolled up by content; windows
    * appearing in at least `minDocs` DISTINCT documents are reported
    * with doc/occurrence counts and the lexicographically-first
    * (doc, pos) exemplar. Doc-level dedup (exact or near) cannot see
    * these — a quote, license header, or template paragraph repeated
    * inside otherwise-unique documents only shows up at span level.
    *
    * Scale shape: the window explode emits ~one row per corpus token —
    * the cost class the shingle machinery (minhash/Jaccard) already
    * rides. The rollup is TWO-LEVEL: first (doc, span) — partial-
    * aggregated, collapses within-doc repeats — then (span), where
    * per-group state is O(1) counts + a min struct, so a boilerplate
    * span occurring in millions of documents cannot blow aggregation
    * memory (a single-level countDistinct(doc_id) would). Spans travel
    * as 32-hex md5 keys; the text rides as min(span) — identical for
    * every member of a hash group short of an md5 collision.
    */
  def repeatedSpans(df: DataFrame, n: Int = 8, minDocs: Int = 2,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val perDoc = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(shingles(col(textCol), n)).as(Seq("pos", "span")))
      .groupBy(col("doc_id"), md5(col("span")).as("span_hash"))
      .agg(min("span").as("span"), count(lit(1)).as("n_occ"),
        min("pos").as("first_pos"))
    perDoc.groupBy("span_hash")
      .agg(min("span").as("span"), count(lit(1)).as("n_docs"),
        sum("n_occ").as("n_occurrences"),
        min(struct(col("doc_id"), col("first_pos"))).as("x"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span_hash"), col("span"), col("n_docs"),
        col("n_occurrences"), col("x.doc_id").as("first_doc"),
        col("x.first_pos").cast(LongType).as("first_pos"))
      .orderBy("span_hash")
  }

  /** Maximal duplicated token REGIONS per document — the span-recovery
    * half of exact-substring dedup (Lee et al. 2022's ExactSubstr
    * acts on duplicated substrings, not whole documents): the
    * [[repeatedSpans]] census finds which n-token windows repeat
    * across ≥ `minDocs` documents; this merges each document's
    * duplicated windows into maximal contiguous token ranges
    * (union of the [pos, pos+n−1] intervals; overlapping or
    * token-adjacent windows coalesce) — the regions a cutting pass
    * removes and an audit reports ("34% of this crawl is boilerplate
    * headers").
    *
    * Scale shape: the window explode is ~one row per corpus token
    * (the shingle cost class); the duplicated-hash census is
    * TWO-LEVEL ((doc, hash) distinct map-side first, then hash) so a
    * boilerplate span in millions of documents never concentrates in
    * one aggregation state; the semi-join back is hash-keyed; island
    * merging is a per-document window (bounded by document length,
    * never global). Output: (doc_id, start_pos, end_pos inclusive,
    * n_windows) per maximal region.
    */
  def duplicateRegions(df: DataFrame, n: Int = 8, minDocs: Int = 2,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    // spread() for the same reason as duplicateRegionsBytes: the
    // shingle explode + per-window md5 otherwise runs on the scan's
    // single local task, once per census consumer
    val wins = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(shingles(col(textCol), n)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        md5(col("span")).as("span_hash"))
    val dup = wins.select("doc_id", "span_hash").distinct()
      .groupBy("span_hash").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("span_hash")
    val dupWins = wins.join(dup, Seq("span_hash"), "left_semi")
    // gaps-and-islands with a running interval end: a window starting
    // at pos covers [pos, pos+n-1]; a new island begins when pos
    // clears the furthest end seen so far by more than one token
    // (adjacent coverage merges — the cut acts on contiguous tokens)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(n - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    dupWins
      .withColumn("ni",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1)
          .otherwise(0))
      .withColumn("island",
        sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast(LongType).as("start_pos"),
        (max("pos") + lit(n - 1)).cast(LongType).as("end_pos"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "start_pos", "end_pos", "n_windows")
      .orderBy("doc_id", "start_pos")
  }

  /** [[duplicateRegions]] at BYTE/CHARACTER granularity — Lee et
    * al. 2022's actual ExactSubstr contract: any substring of ≥
    * `minChars` characters shared by ≥ `minDocs` documents is
    * duplicated, whatever its length and wherever it starts (the
    * n-token variant above is blind to shared phrases shorter than n
    * tokens and snaps region edges to token boundaries; a spec pins
    * that boundary). Mechanism: stride-1 character windows of length
    * `minChars` — a substring of length L ≥ minChars is shared iff
    * all its L−minChars+1 windows are shared, so the same two-level
    * census + per-document island merge recovers exactly the MAXIMAL
    * shared character ranges. Output (doc_id, start_char, end_char
    * inclusive, n_windows), 0-based character offsets — feed
    * `substring(text, start_char + 1, end_char - start_char + 1)`
    * to see the duplicated bytes.
    *
    * Scale shape: ~one window row per corpus CHARACTER (≈6× the
    * n-token explode — the paper pays the same factor; its suffix-
    * array construction is also per-byte) with an O(minChars) hash
    * per row; census/semi-join/island stages are identical in shape
    * to [[duplicateRegions]] (two-level census, doc-length-bounded
    * windows, no global state). At 100 TB the md5 window hash swaps
    * for the gear rolling hash ([[graft.functions.GearCdcChunks]]'s
    * primitive) behind the same plan — O(1)/char instead of
    * O(minChars)/char; md5 is kept here as the cross-engine-derivable
    * teaching rule, exactly the [[graft.functions.CdcChunks]]
    * precedent.
    */
  def duplicateRegionsBytes(df: DataFrame, minChars: Int = 50,
                            minDocs: Int = 2, textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val idx = when(char_length(col(textCol)) >= minChars,
        sequence(lit(0), char_length(col(textCol)) - minChars))
      .otherwise(array().cast("array<int>"))
    val spans = transform(idx,
      p => col(textCol).substr(p + lit(1), lit(minChars)))
    // spread(): the O(chars) window explode + O(minChars) md5 per
    // position is this row's CPU and a single-file local scan runs it
    // on ONE task — twice (census + semi-join consumers; r19 event
    // log: two 1-task stages of 1.7 s / 1.2 s). No-op on real
    // multi-split scans (the flattenLean precedent).
    val wins = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(spans).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        md5(col("span")).as("span_hash"))
    mergeCharRegions(wins, minChars, minDocs)
  }

  /** [[duplicateRegionsBytes]] on the O(1)-per-character rolling
    * hash ([[graft.functions.RollingWindowHash]]) instead of an
    * O(minChars)-per-position md5 over materialized substrings — the
    * production-rate path the md5 teaching rule contracts for
    * (exactly the [[graft.functions.GearCdcChunks]]/[[graft.functions.CdcChunks]]
    * pairing): no substring allocation, one subtract-shift-add per
    * character, same census/semi-join/island plan behind it, and the
    * oracle replays the polynomial state as a closed-form windowed
    * sum (HUGEINT power table). Results are identical to the md5
    * variant short of a 64-bit collision (equivalence spec-pinned on
    * the corpus sample); the collision contract is stated on the
    * expression.
    */
  def duplicateRegionsRolling(df: DataFrame, minChars: Int = 50,
                              minDocs: Int = 2,
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    val wins = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.RollingHash
          .rollingWindowHash(col(textCol), minChars))
          .as(Seq("pos", "span_hash")))
    mergeCharRegions(wins, minChars, minDocs)
  }

  /** Shared tail of the byte-granularity region family: two-level
    * duplicated-hash census over `wins(doc_id, pos, span_hash)` (the
    * hash type is opaque — md5 string or rolling-hash long), hash-
    * keyed semi-join back, per-document gaps-and-islands merge.
    */
  private def mergeCharRegions(wins: DataFrame, minChars: Int,
                               minDocs: Int): DataFrame = {
    val dup = wins.select("doc_id", "span_hash").distinct()
      .groupBy("span_hash").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("span_hash")
    val dupWins = wins.join(dup, Seq("span_hash"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(minChars - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    dupWins
      .withColumn("ni",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1)
          .otherwise(0))
      .withColumn("island",
        sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast(LongType).as("start_char"),
        (max("pos") + lit(minChars - 1)).cast(LongType)
          .as("end_char"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "start_char", "end_char", "n_windows")
      .orderBy("doc_id", "start_char")
  }

  /** The cutting ACTION at byte/character granularity — completes
    * [[duplicateRegionsBytes]] the way [[cutRepeatedSpans]] completes
    * [[duplicateRegions]]: every character inside a ≥`minChars`
    * shared region is cut and the document re-joined from the
    * surviving characters, (doc_id, n_chars, n_cut, clean_text).
    * Documents that are pure boilerplate come back empty (caller owns
    * the row policy); documents without regions pass through with
    * n_cut = 0. Unlike the token cut, the rebuild concatenates WITHOUT
    * separators — character offsets already carry the spacing.
    *
    * Scale shape: characters explode once (~corpus chars — the same
    * cost class as the region detection's window explode); the cut is
    * a doc_id-keyed LEFT ANTI against the per-doc region table
    * (regions per doc are few; the non-equi pos bound rides the equi
    * key); the rebuild is one per-doc aggregate whose state is the
    * document's own surviving characters. No global window, no driver
    * state.
    */
  def cutRepeatedSpansBytes(df: DataFrame, minChars: Int = 50,
                            minDocs: Int = 2, textCol: String = "text",
                            idCol: String = "doc_id",
                            rollingDetect: Boolean = true): DataFrame = {
    // rolling detection by default: the cut's cost is dominated by
    // region detection, and the rolling-hash path is the measured
    // 9.2× production rate (md5 stays available as the teaching rule)
    val regions =
      (if (rollingDetect)
        duplicateRegionsRolling(df, minChars, minDocs, textCol, idCol)
      else duplicateRegionsBytes(df, minChars, minDocs, textCol, idCol))
        .select(col("doc_id").as("r_doc"), col("start_char"),
          col("end_char"))
    val chars = graft.util.Utils.spread(df)
      .filter(char_length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "")).as(Seq("pos", "ch")))
    val kept = chars.join(regions,
      chars("doc_id") === regions("r_doc") &&
        col("pos") >= col("start_char") &&
        col("pos") <= col("end_char"),
      "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("pos"), col("ch")))),
          e => e.getField("ch"))).as("clean_text"))
    df.select(col(idCol).as("doc_id"),
        char_length(col(textCol)).cast(LongType).as("n_chars"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars") - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Exact-substring dedup as a TRANSFORM — the ExactSubstr action
    * itself: every token inside a [[duplicateRegions]] region is cut
    * and the document re-joined from the survivors, returning
    * (doc_id, n_tokens, n_cut, clean_text). Documents made of pure
    * boilerplate come back empty rather than dropped — the caller
    * chooses the row-level policy (a `clean_text != ''` gate composes
    * downstream); documents without duplicated regions pass through
    * with n_cut = 0.
    *
    * Scale shape: tokens explode once (~corpus tokens); the cut is a
    * doc_id-keyed LEFT ANTI join against the per-doc region table
    * (regions per doc are few — the non-equi pos bound rides the
    * equi key); the rebuild is one per-doc aggregate whose state is
    * the document's own surviving tokens. No global window, no
    * driver state.
    */
  def cutRepeatedSpans(df: DataFrame, n: Int = 8, minDocs: Int = 2,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val regions = duplicateRegions(df, n, minDocs, textCol, idCol)
      .select(col("doc_id").as("r_doc"), col("start_pos"),
        col("end_pos"))
    val toks = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val kept = toks.join(regions,
      toks("doc_id") === regions("r_doc") &&
        col("pos") >= col("start_pos") &&
        col("pos") <= col("end_pos"),
      "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).as("clean_text"))
    df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Duplicate-cluster size histogram — the dedup-rate report every
    * curation run leads with: how many fingerprint clusters exist at
    * each copy count, how many documents they hold, and how many a
    * keep-one pass would remove (`Σ (n−1)·clusters`). One groupBy on
    * the 16-byte fingerprint then a copy-count-sized rollup — the
    * histogram is at most max-cluster-size rows whatever the corpus.
    */
  def dupSizeHistogram(df: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    exactGroups(df, textCol, idCol)
      .groupBy("n_copies")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("n_copies"), col("n_clusters"),
        (col("n_copies") * col("n_clusters")).as("n_docs"),
        ((col("n_copies") - 1) * col("n_clusters")).as("n_removable"))
      .orderBy("n_copies")

  /** Blocked fuzzy matching — the entity-resolution / near-identical-
    * title shape (classic record-linkage blocking, Fellegi & Sunter
    * lineage): candidate pairs come from an EQUI-join on a cheap
    * blocking key (the normalized prefix), and only those candidates
    * pay the quadratic edit-distance check, which runs ROW-LOCAL with
    * Spark's thresholded `levenshtein` (O(len·maxDist) early-exit).
    * An all-pairs levenshtein is the textbook 100 TB killer; blocking
    * bounds the join to Σ block² and the prefix length tunes the
    * recall/cost trade exactly like LSH band width — pairs that
    * differ inside the first `prefixLen` characters are unseen BY
    * DESIGN (documented recall loss, the blocking bargain).
    *
    * Skew guard: blocks larger than `maxBlock` are dropped whole (the
    * [[simhashNearDups]] hot-bucket discipline) — a boilerplate
    * prefix shared by millions of rows must not quadratically explode
    * one task; the dropped blocks are exactly the ones exact-prefix
    * grouping already handles.
    *
    * Normalization is [[TextAnalysis.fingerprint]]'s (lower + trim +
    * whitespace collapse) so fuzzy pairs compose with the exact-dedup
    * family. Output: (id1 < id2, dist ≤ maxDist), ordered.
    */
  /** Measured blocking-depth policy for [[fuzzyPairs]] — the
    * [[graft.operators.Similarity.autoPlanes]] precedent applied to
    * prefix blocking: at a FIXED `prefixLen` block occupancy grows
    * linearly with the corpus and within-block pair work
    * quadratically (the SCALE.md fuzzy_pairs curve), so the prefix
    * must deepen as the corpus grows. Unlike LSH depth it cannot be
    * derived from a row count alone (the prefix vocabulary is
    * data-dependent), so this MEASURES it: starting at `minLen`, the
    * prefix doubles until the heaviest block holds ≤ `targetOccupancy`
    * rows or `maxLen` is reached. Each probe is one
    * map-side-combined census returning a single driver-side long —
    * log₂(maxLen/minLen) cheap scans, no data movement. Deterministic
    * for a given corpus. The recall trade is the blocking bargain
    * stated on [[fuzzyPairs]]: deeper prefixes see fewer cross-block
    * edits.
    */
  def autoPrefixLen(df: DataFrame, textCol: String = "text",
                    targetOccupancy: Long = 64L, minLen: Int = 4,
                    maxLen: Int = 32): Int = {
    require(minLen >= 1 && maxLen >= minLen && targetOccupancy >= 1,
      "need 1 <= minLen <= maxLen and targetOccupancy >= 1")
    val k = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    def maxOcc(p: Int): Long = {
      val r = df.select(substring(k, 1, p).as("_blk"))
        .groupBy("_blk").agg(count(lit(1)).as("_n"))
        .agg(max(col("_n"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var p = minLen
    while (p < maxLen && maxOcc(p) > targetOccupancy) p *= 2
    math.min(p, maxLen)
  }

  /** [[fuzzyPairs]] at the measured [[autoPrefixLen]] depth — the
    * at-scale configuration; the declared oracle row keeps the fixed
    * geometry (its depth is part of the replayed contract).
    */
  def fuzzyPairsAuto(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", maxDist: Int = 2,
                     targetOccupancy: Long = 64L,
                     maxBlock: Long = 1000L): DataFrame =
    fuzzyPairs(df, textCol, idCol,
      autoPrefixLen(df, textCol, targetOccupancy), maxDist, maxBlock)

  def fuzzyPairs(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", prefixLen: Int = 8,
                 maxDist: Int = 2,
                 maxBlock: Long = 1000L): DataFrame = {
    val t = df.select(col(idCol).as("_id"),
      lower(trim(regexp_replace(col(textCol), "\\s+", " "))).as("_k"))
      .withColumn("_blk", substring(col("_k"), 1, prefixLen))
    // map-side-aggregating block census; oversized blocks drop whole
    val ok = t.groupBy("_blk").agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBlock)
      .select("_blk")
    val b = t.join(ok, Seq("_blk"))
    val l = b.select(col("_blk"), col("_id").as("id1"),
      col("_k").as("_k1"))
    val r = b.select(col("_blk"), col("_id").as("id2"),
      col("_k").as("_k2"))
    l.join(r, Seq("_blk"))
      .filter(col("id1") < col("id2") &&
        abs(length(col("_k1")) - length(col("_k2"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("_k1"), col("_k2"), maxDist).cast(LongType))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
      .orderBy("id1", "id2")
  }
}
