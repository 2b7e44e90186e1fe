package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines (BASELINE.json
  * north-star: language-ID, quality scoring, token counting, document
  * fingerprinting). Not present in the reference (its text handling stops
  * at display truncation, `core/extractor.py:430-439`); designed
  * Spark-first: every function is a pure Catalyst expression tree —
  * no UDFs — so the whole pipeline stays in whole-stage codegen and
  * scales linearly with no shuffle.
  *
  * Determinism contract: all scores are exact integer counts or
  * fixed-order double arithmetic rounded to 6 decimals, so results are
  * reproducible across engines (the DuckDB oracle mirrors each formula).
  */
object TextAnalysis {

  /** Whitespace tokenization: split on runs of whitespace, drop empties.
    * (The BPE-ish regex alternative is [[bpeishTokens]].)
    */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape: letter
    * runs, digit runs, punctuation runs, each with optional leading
    * space). Counts sub-word-ish units — a cheap token-budget estimator.
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** EXACT byte-BPE token count under a merges table (defaults to the
    * deterministic fixture vocabulary) — the production pretraining
    * budget unit; see [[graft.functions.ByteBpe]] for algorithm,
    * oracle-parity contract, and scale shape. Row-local compiled
    * expression, no shuffle.
    */
  def bpeTokenCount(c: Column,
      merges: Seq[(String, String)] =
        graft.functions.ByteBpe.fixtureMerges): Column =
    graft.functions.ByteBpe.bpeTokenCount(c, merges)

  /** EXACT byte-BPE tokenization: the full token-ID stream under a
    * merges table (GPT-2 ID layout — code point for base symbols,
    * 256+rank for merge products); see [[graft.functions.BpeEncode]].
    * `size(bpeEncode(c)) == bpeTokenCount(c)` by construction.
    */
  def bpeEncode(c: Column,
      merges: Seq[(String, String)] =
        graft.functions.ByteBpe.fixtureMerges): Column =
    graft.functions.ByteBpe.bpeEncode(c, merges)

  /** Token IDs back to text — the inverse of [[bpeEncode]] (byte-level
    * BPE is lossless; see [[graft.functions.BpeDecode]] for the exact
    * roundtrip contract).
    */
  def bpeDecode(c: Column,
      merges: Seq[(String, String)] =
        graft.functions.ByteBpe.fixtureMerges): Column =
    graft.functions.ByteBpe.bpeDecode(c, merges)

  /** Per-stratum token-budget audit: document count, the whitespace
    * proxy total, and the exact BPE total side by side — the "how far
    * off was the proxy" report that decides whether a budgeted mixture
    * ([[graft.operators.Sampling.tokenBudgetSample]]) was actually
    * filled to spec. ONE map-side-combined groupBy; the BPE expression
    * is a projection, so the plan is identical in shape to the proxy
    * path it audits.
    */
  def bpeBudgetReport(df: DataFrame, textCol: String = "text",
      groupCol: String = "source",
      merges: Seq[(String, String)] =
        graft.functions.ByteBpe.fixtureMerges): DataFrame = {
    val c = col(textCol)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        coalesce(sum(tokenCount(c).cast(LongType)), lit(0L))
          .cast(LongType).as("ws_tokens"),
        coalesce(sum(bpeTokenCount(c, merges)), lit(0L))
          .cast(LongType).as("bpe_tokens"))
      .orderBy(groupCol)
  }

  /** LEARN a BPE merges table from the corpus — Sennrich et al. 2016
    * Algorithm 1, the tokenizer-TRAINING step: iterate `numMerges`
    * times over the word census (distinct pre-token → frequency),
    * each round counting every adjacent symbol pair
    * frequency-weighted, fusing the most frequent pair (ties to the
    * lexicographically first (left, right)) left-to-right
    * non-overlapping in every word, and stopping early when no pair
    * reaches `minCount`. Returns the learned merges in rank order
    * with their at-selection pair counts — feed them straight to
    * [[bpeTokenCount]] / [[bpeBudgetReport]] for corpus-fit budgets.
    *
    * Scale shape: the distributed part is ONE explode + groupBy
    * census; the merge loop runs on the COLLECTED census, which is
    * bounded BY CONSTRUCTION at `maxVocab` rows: the collect is a
    * TakeOrderedAndProject of the top-`maxVocab` pre-tokens by
    * (count DESC, token ASC) — deterministic under ties and
    * replayed by the oracle as the same ORDER BY/LIMIT cut. A raw
    * Heaps-law census over a 100 TB web corpus is 10⁸–10⁹ distinct
    * pre-tokens (the GPT-2-style pre-tokenizer emits every number
    * string and punctuation run); the head cut keeps driver state
    * at `maxVocab` regardless, and discards only pre-tokens whose
    * frequency mass is too small to win a merge anyway (production
    * BPE trainers apply the same frequency-floor idea).
    */
  val defaultMaxVocab: Int = 1 << 16

  def bpeTrain(df: DataFrame, textCol: String = "text",
      numMerges: Int = 25,
      minCount: Long = 2,
      maxVocab: Int = defaultMaxVocab): Seq[(String, String, Long)] = {
    require(maxVocab > 0, s"maxVocab must be positive: $maxVocab")
    val census = df
      .select(explode(bpeishTokens(col(textCol))).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Vector[String], Long)] = census.map {
      case (w, c) => (w.map(_.toString).toVector, c)
    }
    def mergeAll(syms: Vector[String], a: String,
        b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var round = 0
    while (!done && round < numMerges) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.size - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), pc) = counts.minBy { case ((x, y), c) =>
          (-c, x, y)
        }
        if (pc < minCount) done = true
        else {
          merges += ((a, b, pc))
          words = words.map { case (syms, c) =>
            (mergeAll(syms, a, b), c)
          }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** Artifact format version tag — readers refuse anything else. */
  private val tokenizerVersion = "graft-bpe-v1"

  /** Persist a trained tokenizer as a versioned parquet artifact a
    * training loader consumes: ONE table carrying the complete state a
    * reload needs — the 256-entry base alphabet with its ids (row ids
    * 0–255 ARE the [[graft.functions.ByteBpe]] id space for single
    * symbols), the byte-level alphabet map
    * ([[graft.functions.ByteAlphabet]]'s bytes_to_unicode table, so a
    * byte-level deployment reloads the same mapping it trained with),
    * the ranked merge list with ids continuing the base space
    * (id = 255 + rank), and a version row. Returns the directory
    * written. `dir` defaults to a staging-REGISTERED temp dir
    * ([[graft.util.Utils.registeredTempDir]] — reclaimed by
    * clearStaging like every session-scoped artifact, so repeated
    * verify/bench invocations cannot accrete orphan dirs); a
    * production caller passes an object-store path — the artifact is
    * kilobytes, written once, broadcast-read by every executor that
    * compiles the encoder.
    */
  def exportTokenizer(spark: org.apache.spark.sql.SparkSession,
                      merges: Seq[(String, String, Long)],
                      dir: Option[String] = None): String = {
    import spark.implicits._
    val path = dir.getOrElse(graft.util.Utils
      .registeredTempDir("tokenizer", spark) + "/bpe")
    val meta = Seq(("meta", -1L, -1L, "", "", tokenizerVersion, -1L))
    val alphabet = (0 until 256).map(i =>
      ("alphabet", i.toLong, -1L, "", "", i.toChar.toString, -1L))
    val byteMap = (0 until 256).map(b =>
      ("byte_alphabet", b.toLong, -1L, "", "",
        graft.functions.ByteAlphabet.byteToChar(b).toString, -1L))
    val mergeRows = merges.zipWithIndex.map { case ((a, b, c), i) =>
      ("merge", 256L + i, i + 1L, a, b, a + b, c)
    }
    (meta ++ alphabet ++ byteMap ++ mergeRows)
      .toDF("kind", "id", "rank", "l_sym", "r_sym", "token",
        "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  /** Reload a tokenizer artifact written by [[exportTokenizer]] and
    * prove it is the one that was trained: version row checked, the
    * 256-entry alphabet checked id-by-id against the id space the
    * encoder assumes, merge ids checked contiguous from 256 in rank
    * order, and the byte-level map checked against the engine's
    * derivation (a drifted table would silently re-map every byte).
    * Returns the ranked merge list ready for
    * [[bpeEncode]]/[[bpeDecode]] — the declared
    * `bpe_tokenizer_roundtrip` row then pins encode-with-reloaded ==
    * encode-with-trained on the corpus itself.
    */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path).collect()
    val version = rows.filter(_.getAs[String]("kind") == "meta")
      .map(_.getAs[String]("token"))
    require(version.sameElements(Array(tokenizerVersion)),
      s"tokenizer artifact version mismatch: ${version.mkString(",")}")
    val alpha = rows.filter(_.getAs[String]("kind") == "alphabet")
    require(alpha.length == 256 && alpha.forall(r =>
      r.getAs[String]("token") == r.getAs[Long]("id").toChar.toString),
      "tokenizer artifact: corrupt base alphabet")
    val bmap = rows.filter(_.getAs[String]("kind") == "byte_alphabet")
    require(bmap.length == 256 && bmap.forall(r =>
      r.getAs[String]("token") == graft.functions.ByteAlphabet
        .byteToChar(r.getAs[Long]("id").toInt).toString),
      "tokenizer artifact: byte-level alphabet drifted from " +
        "bytes_to_unicode")
    val m = rows.filter(_.getAs[String]("kind") == "merge")
      .sortBy(_.getAs[Long]("rank"))
    require(m.zipWithIndex.forall { case (r, i) =>
      r.getAs[Long]("id") == 256L + i &&
        r.getAs[String]("token") ==
          r.getAs[String]("l_sym") + r.getAs[String]("r_sym")
    }, "tokenizer artifact: merge ids not contiguous in rank order")
    m.map(r => (r.getAs[String]("l_sym"), r.getAs[String]("r_sym")))
      .toSeq
  }

  /** Tiny public stopword lists per language — enough for an n-gram-free
    * language-ID heuristic and a stopword-ratio quality signal.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "zu", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"))

  /** Count of tokens that are stopwords of `lang`. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /** Language-ID: argmax of per-language stopword hits, first-wins in
    * fixed order (en, es, de, fr); 'unknown' when no list scores.
    */
  def langId(c: Column): Column = {
    val t = tokens(c)
    val s = Seq("en", "es", "de", "fr").map(l => stopwordHits(t, l))
    when(greatest(s: _*) === 0, lit("unknown"))
      .when(s(0) >= s(1) && s(0) >= s(2) && s(0) >= s(3), lit("en"))
      .when(s(1) >= s(2) && s(1) >= s(3), lit("es"))
      .when(s(2) >= s(3), lit("de"))
      .otherwise(lit("fr"))
  }

  /** Rank-order n-gram language ID (Cavnar–Trenkle) — the production
    * upgrade of [[langId]]'s stopword argmax; see
    * [[graft.functions.LangIdCT]] for the algorithm, fixture
    * profiles, and oracle-parity contract.
    */
  def langIdNgram(c: Column): Column =
    graft.functions.LangIdCT.langIdCT(c)

  /** Learn Cavnar–Trenkle rank profiles from a labeled corpus: per
    * language, the top-`depth` trigrams of the normalized text ranked
    * by (count DESC, gram ASC) — the training half of the paper, as
    * one explode + groupBy pass. The per-lang rank window runs over
    * the (lang, gram) COUNT table, bounded by the 27-symbol alphabet
    * at ≤ 27³ gram rows per language regardless of corpus size.
    * Normalization happens in a projection BELOW the Generate, so the
    * regex runs once per document, not once per trigram (the
    * CollapseProject lesson).
    */
  def langProfiles(df: DataFrame, textCol: String = "text",
      langCol: String = "lang", depth: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s0 = trim(regexp_replace(lower(col(textCol)), "[^a-z]+", " "))
    val s = when(s0 === "", lit(""))
      .otherwise(concat(lit(" "), s0, lit(" ")))
    // spread(): the per-character trigram explode below otherwise
    // runs on the scan's single local task (r19 event log: 1.8 s
    // 1-task stage); no-op on real multi-split scans
    graft.util.Utils.spread(df)
      .select(col(langCol).as("lang"), s.as("s"))
      .filter(length(col("s")) >= 3)
      .select(col("lang"), col("s"),
        explode(sequence(lit(1), length(col("s")) - 2)).as("i"))
      .select(col("lang"),
        col("s").substr(col("i").cast("int"), lit(3)).as("g"))
      .groupBy("lang", "g").count()
      .withColumn("pr", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("count").desc, col("g"))))
      .filter(col("pr") <= depth)
      .select("lang", "g", "pr")
  }

  /** Classify `df` with profiles LEARNED from `train` — the
    * production Cavnar–Trenkle path: the profile table (langs ×
    * `depth` rows — algorithm state the size of a k-means codebook)
    * is collected and compiled into the row-local scoring expression,
    * so classification itself is a shuffle-free projection whatever
    * the corpus size. Languages score in lexicographic order (the
    * deterministic tie-break); out-of-place penalty = `depth`.
    */
  def langIdLearned(df: DataFrame, train: DataFrame,
      textCol: String = "text", langCol: String = "lang",
      depth: Int = 40,
      k: Int = graft.functions.LangIdCT.K): DataFrame = {
    val prof = langProfiles(train, textCol, langCol, depth).collect()
    val profiles = prof.groupBy(_.getString(0)).toSeq
      .map { case (lang, rows) =>
        lang -> rows.sortBy(_.getInt(2)).map(_.getString(1)).toSeq
      }.sortBy(_._1)
    // spread the scoring pass too: row-local but per-character work
    graft.util.Utils.spread(df).withColumn("lang_pred",
      graft.functions.LangIdCT.langIdCT(col(textCol), profiles,
        k = k, m = depth))
  }

  /** Punctuation character count (explicit class, portable regex). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:'\"()\\[\\]{}-]", ""))

  /** Composite quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·min(1, 5·stopword_ratio)
    * + 0.3·max(0, 1 − 5·punct_ratio), rounded to 6 decimals.
    * Favors documents long enough to train on, with natural-language
    * function-word density and sane punctuation.
    */
  def qualityScore(c: Column): Column = {
    val t = tokens(c)
    val n = size(t).cast(DoubleType)
    val stops = stopwordHits(t, "en").cast(DoubleType)
    val lenScore = least(lit(1.0), n / 100.0)
    val stopScore = least(lit(1.0), stops / n * 5.0)
    val punctPen = greatest(lit(0.0),
      lit(1.0) - punctCount(c).cast(DoubleType) / length(c) * 5.0)
    // empty / whitespace-only text divides by zero above (NaN games
    // with least/greatest) — such a document scores 0 outright
    when(c.isNull || length(c) === 0 || n === 0, lit(0.0)).otherwise(
      round(lit(0.4) * lenScore + lit(0.3) * stopScore +
        lit(0.3) * punctPen, 6))
  }

  /** Document fingerprint: md5 of whitespace-normalized, lowercased
    * text. Stable across engines; the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** Word n-gram shingles ("a b c" 3-grams) — the unit for minhash and
    * Jaccard dedup. Backed by the single-eval
    * [[graft.functions.WordShingles]] expression; semantically equal to
    * `transform(sequence(1, size(t)-(n-1)), i -> concat_ws(" ",
    * slice(t, i, n)))` over [[tokens]], which the dedup oracle SQL
    * mirrors.
    */
  def shingles(c: Column, n: Int = 3): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.graftshim.Shims.expression(c), n))

  /** Top-k salient terms per document, scored by tf/df — the TF-IDF
    * ordering with the rarity weight kept as a single IEEE division so
    * the score is bit-reproducible across engines (log-based idf is
    * libm-dependent; 1/df is the same monotone-in-rarity weight for
    * ranking). Two shuffles: tf on (doc, term), df on term; the final
    * per-doc top-k is a window over the already-partitioned join
    * output. At 100 TB the df table is vocabulary-sized — small next
    * to the corpus — and every aggregate has map-side partials.
    */
  def topTerms(df: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", k: Int = 3): DataFrame = {
    val tf = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast(DoubleType) / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Corpus quality gate: every document with its filter verdicts —
    * length, quality-score, and language checks as explicit flags plus
    * the combined keep decision (pipelines audit *why* a doc dropped,
    * not just the survivor set). Pure row-local expression tree over
    * [[textProfile]]'s formulas — no shuffle, scales linearly.
    */
  def qualityFilter(df: DataFrame, textCol: String = "text",
                    minTokens: Int = 20,
                    minQuality: Double = 0.3): DataFrame = {
    val c = col(textCol)
    graft.util.Utils.spread(df).select(
      col("doc_id"),
      tokenCount(c).cast("long").as("n_tokens"),
      qualityScore(c).as("quality"),
      langId(c).as("lang_pred"),
      (tokenCount(c) >= minTokens).as("pass_len"),
      (qualityScore(c) >= minQuality).as("pass_quality"),
      (langId(c) =!= "unknown").as("pass_lang"))
      .withColumn("keep",
        col("pass_len") && col("pass_quality") && col("pass_lang"))
      .orderBy("doc_id")
  }

  /** Corpus report: per-source rollup of the text profile — document
    * counts, token volume, quality and language mix. One scan + one
    * tiny shuffle (sources × few stats); the quality average is
    * aggregated as an INTEGER (quality × 10⁶, exact because
    * [[qualityScore]] rounds to 6 decimals) so parallel reduction
    * order cannot change the result (the money-aggregate rule applied
    * to scores), and the MEAN itself is emitted as an integer ppm via
    * round-half-up integer division — quotient plus a remainder test,
    * overflow-proof at any corpus size — so not one float exists
    * anywhere in the output row and no engine/build pair can disagree
    * on rendering.
    */
  def corpusReport(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    graft.util.Utils.spread(df)
      .select(col("source"), tokenCount(c).cast("long").as("n_tokens"),
        floor(qualityScore(c) * 1e6 + 0.5).cast(LongType).as("q6"),
        langId(c).as("lang_pred"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("q6")).as("sum_q6"),
        countDistinct(col("lang_pred")).as("n_langs"))
      // round-half-up integer mean without doubling the sum: quotient
      // plus a remainder test. `2*(sum_q6 % n_docs)` is < 2*n_docs, so
      // nothing here can overflow Long no matter how large a source
      // grows (the naive `(2*sum_q6 + n) DIV (2*n)` wraps silently in
      // Spark but raises in DuckDB once sum_q6 > Long.MaxValue/2 —
      // the engines would diverge instead of failing together). All
      // operands are non-negative, so % and DIV agree across engines.
      .withColumn("avg_quality_ppm",
        expr("sum_q6 DIV n_docs + " +
          "IF(2 * (sum_q6 % n_docs) >= n_docs, 1L, 0L)"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("avg_quality_ppm"), col("n_langs"))
      .orderBy("source")
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", §A1.1 repetition filters): the
    * duplicate-bigram fraction and the most-frequent-bigram share.
    * Boilerplate and degenerate generations repeat token n-grams far
    * above natural-text rates, so training pipelines gate on these.
    *
    * Shape: explode bigrams → count per (doc, bigram) → one row per
    * doc. Two shuffles, both keyed by doc id with map-side partials —
    * the [[topTerms]] scale shape, linear in corpus size (the pure
    * expression alternative — counting each distinct bigram with a
    * nested array scan — is O(n·u) per document and dies on long
    * documents). Deterministic: counts are exact, fractions are one
    * IEEE division rounded to 6 decimals, the top bigram tie-break is
    * (count desc, bigram asc) via min on a (-count, bigram) struct.
    */
  def repetitionProfile(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        maxDupFrac: Double = 0.1): DataFrame = {
    val t = tokens(col(textCol))
    // slice length must be ≥ 0: a zero-token doc has size(t)-1 = -1,
    // which slice rejects at runtime (the oracle's range(1, 0) is
    // just empty) — clamp to 0 so such docs yield an empty bigram list
    val bigramLen = greatest(lit(0), size(t) - 1)
    val bigrams = zip_with(
      slice(t, lit(1), bigramLen), slice(t, lit(2), bigramLen),
      (a, b) => concat(a, lit(" "), b))
    val counts = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_bigrams"),
      count(lit(1)).as("n_unique_bigrams"),
      min(struct((-col("c")).as("nc"), col("bg").as("b"))).as("m"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unique_bigrams"), lit(0L)).as("n_unique_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0)).otherwise(
          round((col("n_bigrams") - col("n_unique_bigrams"))
            .cast(DoubleType) / col("n_bigrams"), 6)).as("dup_bigram_frac"),
        col("m.b").as("top_bigram"),
        coalesce(-col("m.nc"), lit(0L)).as("top_bigram_n"),
        when(col("n_bigrams").isNull, lit(0.0)).otherwise(
          round((-col("m.nc")).cast(DoubleType) / col("n_bigrams"), 6))
          .as("top_bigram_frac"))
      .withColumn("pass_repetition", col("dup_bigram_frac") <= maxDupFrac)
      .orderBy("doc_id")
  }

  /** Frequency-based quality proxy (the oracle-able stand-in for a
    * CCNet-style LM-perplexity filter, which needs a trained model no
    * oracle could replay): a document's mean inverse document
    * frequency over its token occurrences. Low rarity = boilerplate /
    * stop-word soup; high rarity = rare-vocabulary text (often
    * gibberish) — pipelines gate both tails.
    *
    * Determinism: per-token weights are INTEGERS (round(10⁶/df)), so
    * the big summation is order-free (the libm-free analogue of the
    * log-prob sum a perplexity filter computes — same monotone
    * rare-vs-common axis, no cross-engine `log`), and the final mean
    * is emitted in integer MICRO-UNITS via integer half-up division —
    * a rounded cross-engine double here loses hash-equality the
    * moment a document lands exactly on a .5 boundary (one did at
    * sf0.001). Scale shape is exactly [[topTerms]]: tf on (doc,
    * term), df on term (vocabulary-sized), then a doc-keyed rollup —
    * all with map-side partials.
    */
  def rarityProfile(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val tok = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * floor(lit(1e6) / col("df") + 0.5).cast(LongType))
          .as("w"))
      // half-up integer mean: round(w / n) = (2w + n) DIV 2n, all in
      // 64-bit integer arithmetic — no float ever touches the output
      .select(col("doc_id"), col("n_tokens"),
        expr("(2 * w + n_tokens) DIV (2 * n_tokens)").as("rarity_ppm"))
      .orderBy("doc_id")
  }

  /** PII patterns shared by the engine and the DuckDB oracle — kept to
    * the portable common subset of Java regex and RE2 (no lookaround,
    * ASCII word boundaries).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d-]{6,}\\d"

  /** The PII scrub chain — replacement order (email → ip → phone) is
    * part of the contract and mirrored by the oracle; this is the ONE
    * place it lives (both [[redactPii]] and the streaming ingest
    * curation call it).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** PII scrub for training corpora: count then redact emails, IPv4
    * addresses and international-format phone numbers with typed
    * placeholders. Pure row-local expression chain — no shuffle, no
    * UDF, scales linearly. Counts are taken on the raw text BEFORE
    * redaction.
    */
  def redactPii(df: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val c = col(textCol)
    df.select(col(idCol).as("doc_id"),
      regexp_count(c, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(c, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(c, lit(PhoneRe)).cast("long").as("n_phones"),
      scrubPii(c).as("clean"))
      .orderBy("doc_id")
  }

  /** The five Gopher counters over one text column — the single
    * source both [[gopherRules]] (tabular verdicts) and
    * [[gopherPassExpr]] (fused funnel gate) derive their integer
    * comparisons from.
    */
  private def gopherCounters(c: Column)
      : (Column, Column, Column, Column, Column) = {
    val toks = tokens(c)
    val nWords = size(toks).cast(LongType)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nSymbols = (length(c) - length(regexp_replace(c, "#", "")))
      .cast(LongType) +
      ((length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / 3)
        .cast(LongType)
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast(LongType)
    val nStop = stopwordHits(toks, "en").cast(LongType)
    (nWords, sumLen, nSymbols, nAlpha, nStop)
  }

  /** The Gopher quality rule set (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * §A1.1), the published heuristic battery most pipelines start
    * from: word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, and a minimum
    * stopword count. Every rule is expressed as an INTEGER comparison
    * (3n ≤ Σlen ≤ 10n instead of 3 ≤ mean ≤ 10, 5·alpha ≥ 4·n instead
    * of 80%…), so no float ever exists to disagree across engines.
    * Row-local expression tree — no shuffle, whole pipeline stays in
    * one projection. Returns per-rule verdicts plus the combined gate.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id", minWords: Int = 50,
                  maxWords: Int = 100000): DataFrame = {
    val (nWords, sumLen, nSymbols, nAlpha, nStop) =
      gopherCounters(col(textCol))
    df.select(col(idCol).as("doc_id"),
        nWords.as("n_words"), sumLen.as("sum_word_chars"),
        nSymbols.as("n_symbols"),
        nAlpha.as("n_alpha_words"), nStop.as("n_stopwords"))
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("mean_len_ok",
        col("sum_word_chars") >= lit(3L) * col("n_words") &&
          col("sum_word_chars") <= lit(10L) * col("n_words"))
      .withColumn("symbol_ok",
        lit(10L) * col("n_symbols") <= col("n_words"))
      .withColumn("alpha_ok",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("stop_ok", col("n_stopwords") >= 2L)
      .withColumn("pass",
        col("words_ok") && col("mean_len_ok") && col("symbol_ok") &&
          col("alpha_ok") && col("stop_ok"))
      .orderBy("doc_id")
  }

  /** [[gopherRules]]' combined verdict as ONE boolean expression over
    * a text column — the form a funnel composes into a `filter`
    * directly (no intermediate verdict table). Same all-integer
    * comparisons as the tabular operator.
    */
  def gopherPassExpr(c: Column, minWords: Int = 50,
                     maxWords: Int = 100000): Column = {
    val (n, sumLen, nSym, nAlpha, nStop) = gopherCounters(c)
    n >= minWords && n <= maxWords &&
      sumLen >= lit(3L) * n && sumLen <= lit(10L) * n &&
      lit(10L) * nSym <= n &&
      lit(5L) * nAlpha >= lit(4L) * n &&
      nStop >= 2L
  }

  /** [[classifierScore]]'s keep decision as ONE boolean expression —
    * the division-free form: score_ppm ≥ T ⇔ 2·Σw + n ≥ 2n·(T + 10⁶)
    * (floor(x) ≥ T ⇔ x ≥ T for integer T), so the funnel gate is a
    * pure 64-bit integer inequality.
    */
  def classifierKeepExpr(c: Column, thresholdPpm: Long = 0L): Column = {
    val toks = tokens(c)
    val n = size(toks).cast(LongType)
    val wsum = aggregate(toks, lit(0L), (acc, t) => acc + weightPpm(t))
    n > 0L && (lit(2L) * wsum + n) >=
      lit(2L) * n * lit(thresholdPpm + 1000000L)
  }

  /** Per-token pseudo-weight in [0, 2e6] ppm, md5-derived — the
    * deterministic stand-in for a trained hashed-features weight
    * vector (the hashing trick with d = 2^32 and one weight per hash).
    * Production swaps this for real fastText/logistic weights; the
    * pipeline shape (and the oracle's replay) is identical.
    */
  def weightPpm(t: Column): Column =
    conv(substring(md5(concat(lit("w:"), t)), 1, 8), 16, 10)
      .cast(LongType) % lit(2000001L)

  /** Hashed-features linear quality classifier — the fastText-style
    * model-based filter of CCNet/phi-class pipelines: score = mean
    * over tokens of a per-token weight, thresholded to a keep/drop
    * gate. Centered at 0 (score_ppm in [-1e6, 1e6]). Entirely
    * row-local: the token fold runs inside the row (no explode, no
    * shuffle), the mean is 64-bit integer arithmetic (half-up, the
    * [[rarityProfile]] trick), so output is engine-reproducible and
    * the operator scales linearly with corpus size.
    */
  def classifierScore(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id",
                      thresholdPpm: Long = 0L): DataFrame = {
    val toks = tokens(col(textCol))
    val wsum = aggregate(toks, lit(0L), (acc, t) => acc + weightPpm(t))
    df.select(col(idCol).as("doc_id"),
        size(toks).cast(LongType).as("n_tokens"), wsum.as("_w"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        (expr("(2 * _w + n_tokens) DIV (2 * n_tokens)")
          - lit(1000000L)).as("score_ppm"))
      .withColumn("keep", col("score_ppm") >= lit(thresholdPpm))
      .orderBy("doc_id")
  }

  /** Bigram-LM quality proxy (the KenLM-shaped upgrade over
    * [[rarityProfile]]'s unigram rarity): per document, the tf-weighted
    * integer mean of the corpus-wide conditional bigram probability
    * P(w₂|w₁) = c(w₁w₂) / c(w₁·) in ppm — documents whose word
    * transitions are common corpus-wide score high, word salad scores
    * low. All arithmetic is 64-bit integer with half-up rounding
    * (ppm per bigram, then the [[rarityProfile]] mean trick), so the
    * score is engine-reproducible with no libm log anywhere. Shuffles:
    * (doc, bigram) tf, bigram count, prefix count — the model tables
    * are vocabulary²-bounded, tiny next to a 100 TB corpus, and every
    * aggregate has map-side partials. Docs with no bigrams are
    * reported with null score.
    */
  def lmScore(df: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"), toks.as("_t"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("_t"), lit(1), greatest(size(col("_t")) - 1, lit(0))),
        slice(col("_t"), lit(2), greatest(size(col("_t")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val tf = bigrams.groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("tf"))
    val c2 = tf.groupBy("bg").agg(sum(col("tf")).as("c2"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val ppm = c2.join(c1, "w1")
      // half-up ppm of c2/c1, all positive → DIV == floor division
      .select(col("bg"),
        expr("(2000000 * c2 + c1) DIV (2 * c1)").as("ppm"))
    val scored = tf.join(ppm, "bg")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("ppm")).as("w"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(2 * w + n_bigrams) DIV (2 * n_bigrams)").as("lm_ppm"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_ppm"))
      .orderBy("doc_id")
  }

  /** Overlapping token-window chunking (the RAG-indexing /
    * context-window prep step): each document becomes
    * ceil((n - overlap) / stride) chunks of `chunkTokens` whitespace
    * tokens with `overlap` tokens shared between neighbors; the final
    * chunk is the short remainder. Row-local sequence + explode — the
    * only shuffle is the output sort; chunk offsets are exact token
    * positions for a downstream tokenizer. Empty docs yield no rows.
    */
  def chunkDocuments(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", chunkTokens: Int = 32,
                     overlap: Int = 8): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    // chunk starts 0, stride, 2·stride, … while start < n
    val starts = sequence(lit(0), greatest(
      floor((col("_n").cast("double") - 1) / stride).cast("int"),
      lit(0)))
    df.select(col(idCol).as("doc_id"), toks.as("_t"),
        size(toks).as("_n"))
      .filter(col("_n") > 0)
      .select(col("doc_id"), col("_t"), col("_n"),
        explode(starts).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast(LongType),
        (col("chunk_idx") * stride).cast(LongType).as("start_tok"),
        least(col("chunk_idx") * stride + chunkTokens, col("_n"))
          .cast(LongType).as("end_tok"),
        array_join(slice(col("_t"), col("chunk_idx") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Corpus vocabulary export (the tokenizer-training input): global
    * term frequency + document frequency, top `topN` by (tf desc,
    * term asc) — deterministic ties. Two shuffles with map-side
    * partials (the (doc, term) tf pass and the term rollup); the
    * global top-N plans as TakeOrderedAndProject — per-partition
    * partial top-N, NOT a single-partition global window — and the
    * rank number is assigned on the ≤ topN survivors only. `minDf`
    * prunes hapax noise before the cut.
    */
  def vocabulary(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", minDf: Int = 1,
                 topN: Int = 10000): DataFrame = {
    val perDoc = graft.util.Utils.spread(df)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val top = perDoc.groupBy("term")
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("tf").desc, col("term").asc)
      .limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("term").asc)
    top.withColumn("rank", row_number().over(w).cast(LongType))
      .orderBy("rank")
  }

  /** Tokenizer-coverage / OOV report: against a vocabulary of the
    * top-V corpus terms (same deterministic (tf desc, term asc)
    * tie-break as [[vocabulary]]), per `groupCol`: total tokens, OOV
    * tokens, distinct OOV terms, and integer-ppm OOV rate — the
    * pre-training question "how much of each source does my
    * tokenizer's vocab actually cover?".
    *
    * Scale shape: the vocab is bounded (topV rows) so membership is a
    * BROADCAST left join — the corpus-sized token stream never
    * shuffles for the lookup; the per-source rollup is one
    * map-side-combined groupBy, plus the standard two-phase expansion
    * for the exact distinct-OOV count. Building the vocab itself is
    * [[vocabulary]]'s (doc, term) tf pass — at 100 TB you build it
    * once and reuse it across reports, which is why it is also
    * exposed as the `vocab` overload.
    */
  def vocabCoverage(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    groupCol: String = "source",
                    topV: Int = 100): DataFrame =
    vocabCoverage(df, vocabulary(df, textCol, idCol, topN = topV),
      textCol, groupCol)

  /** Coverage against a caller-supplied vocabulary table (one `term`
    * column) — the reuse path: score many corpora / slices against
    * one frozen tokenizer vocab without rebuilding it.
    */
  def vocabCoverage(df: DataFrame, vocab: DataFrame, textCol: String,
                    groupCol: String): DataFrame = {
    val inv = vocab.select(col("term")).distinct()
      .withColumn("_inv", lit(true))
    graft.util.Utils.spread(df)
      .select(col(groupCol), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(inv), Seq("term"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("_inv").isNull, col("term")))
          .as("oov_terms"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 DIV n_tokens"))
      .orderBy(col(groupCol))
  }

  /** Histogram-CDF rank-normalized quality blend — combines
    * heterogeneous quality signals (the composite [[qualityScore]] and
    * document length) on a COMMON scale by mapping each through its
    * own empirical CDF, then averaging. Rank/percentile normalization
    * is the standard way to blend signals whose raw scales are
    * incomparable (a 0–1 score vs a token count) — but `percent_rank`
    * is a global sort per signal, which is exactly what does not scale.
    * This is the sort-free form: each signal bins row-locally into a
    * fixed grid (≤ `bins` buckets), ONE map-side-combined groupBy
    * builds the joint histogram, the marginal CDFs are cumulative sums
    * over that ≤ bins-sized frame, and docs get their percentiles back
    * through broadcast joins on the bin key. Two corpus scans total
    * (histogram + lookup), zero corpus-sized sorts or windows; the
    * histogram shuffle is at most bins² tiny rows. CDF values are
    * integer ppm (⌊1e6·cum/total⌋) — exact on any engine.
    *
    * Returns (doc_id, q_cdf_ppm, len_cdf_ppm, blend_ppm) where
    * blend_ppm = ⌊(q_cdf_ppm + len_cdf_ppm)/2⌋ — the data-selection
    * ranking key ([[graft.operators.Curation.keepTopQuantile]] /
    * `dsirSelect`-style fills consume it directly).
    */
  def qualityBlend(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", bins: Int = 256,
                   lenBinTokens: Long = 8L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = col(textCol)
    val qbin = least(lit(bins - 1L),
      floor(qualityScore(c) * bins).cast(LongType)).as("qbin")
    val lbin = least(lit(bins - 1L),
      expr(s"CAST(_n div $lenBinTokens AS BIGINT)")).as("lbin")
    val base = graft.util.Utils.spread(df)
      .withColumn("_n", tokenCount(c).cast(LongType))
      .select(col(idCol).as("doc_id"), qbin, lbin)
    // one corpus pass builds the JOINT histogram; both marginals are
    // re-aggregations of that ≤ bins²-row frame, not corpus re-scans
    val joint = base.groupBy("qbin", "lbin").agg(count(lit(1)).as("_c"))
    def marginalCdf(binCol: String, outCol: String) = {
      val cum = Window.orderBy(col(binCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      joint.groupBy(binCol).agg(sum("_c").as("_bc"))
        .withColumn("_cum", sum("_bc").over(cum))
        .withColumn("_tot", sum("_bc").over(all))
        .select(col(binCol),
          expr("CAST((1000000 * _cum) div _tot AS BIGINT)").as(outCol))
    }
    base
      .join(broadcast(marginalCdf("qbin", "q_cdf_ppm")), Seq("qbin"))
      .join(broadcast(marginalCdf("lbin", "len_cdf_ppm")), Seq("lbin"))
      .withColumn("blend_ppm",
        expr("CAST((q_cdf_ppm + len_cdf_ppm) div 2 AS BIGINT)"))
      .select("doc_id", "q_cdf_ppm", "len_cdf_ppm", "blend_ppm")
      .orderBy("doc_id")
  }

  /** Full per-document text profile over a documents table. */
  def textProfile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    graft.util.Utils.spread(df).select(
      col("doc_id"),
      length(c).cast("long").as("n_chars"),
      tokenCount(c).cast("long").as("n_tokens"),
      bpeishTokenCount(c).cast("long").as("n_bpeish"),
      punctCount(c).cast("long").as("n_punct"),
      langId(c).as("lang_pred"),
      qualityScore(c).as("quality"),
      fingerprint(c).as("fingerprint"))
  }
}
