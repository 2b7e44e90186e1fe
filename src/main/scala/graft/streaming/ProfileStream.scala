package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Profiler

/** Structured Streaming extension (SURVEY §7.1 M6): continuous schema /
  * profile monitoring over a document stream. The reference is
  * batch-only (SURVEY §2.7); this is the "schema drift" capability its
  * users would want next, built on watermarked windowed aggregation and
  * a `foreachBatch` profile-merge loop (the profile buffer-merge law —
  * profile(a ∪ b) = merge(profile(a), profile(b)) — makes incremental
  * profiling exact).
  */
object ProfileStream {

  /** Windowed streaming profile: per (event-time window, path) presence
    * count, numeric min/max and HLL cardinality. Append-mode compatible:
    * watermark + window close emits one profile row set per window.
    * Exact countDistinct is deliberately NOT used — unbounded state;
    * HLL keeps state O(paths × windows).
    */
  def windowedProfile(stream: DataFrame, tsCol: String,
                      windowDur: String = "10 minutes",
                      watermarkDur: String = "10 minutes"): DataFrame = {
    // flatten the document as a struct column so event time survives as
    // a real column next to the exploded leaf rows
    val withTs = stream.select(col(tsCol).as("_event_ts"),
      struct(stream.columns.map(col): _*).as("_doc"))
    val leaf = withTs.select(col("_event_ts"),
      explode(flattenedLeaves(withTs)).as("f")).select(col("_event_ts"),
      col("f.*"))
    leaf
      .withWatermark("_event_ts", watermarkDur)
      .groupBy(window(col("_event_ts"), windowDur), col("path"))
      .agg(count(col("vstr")).as("n_present"),
        approx_count_distinct(col("vstr")).as("cardinality_approx"),
        min(col("vnum")).as("num_min"),
        max(col("vnum")).as("num_max"))
  }

  /** Streaming exact dedup: drop re-occurrences of a normalized-text
    * fingerprint within the watermark horizon — the streaming
    * counterpart of `Dedup.exactDedup` for a continuous ingest
    * pipeline. `dropDuplicatesWithinWatermark` lets Spark evict
    * fingerprints older than the watermark, so state is bounded at one
    * 16-byte key per distinct document inside the horizon rather than
    * growing with the full stream history (the unbounded-state trap of
    * plain `dropDuplicates` on a stream).
    */
  def dedupStream(stream: DataFrame, tsCol: String,
                  textCol: String = "text",
                  watermarkDur: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_fp", graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDur)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Streaming NEAR-dup suppression: each document's row-local
    * minhash signature ([[graft.operators.Dedup.minhashSigExpr]])
    * collapses to one band key; documents repeating a band key inside
    * the watermark horizon are dropped. With all `numHashes` lanes in
    * a single band this fires only on (near-)identical shingle sets —
    * high precision, recall grows as documents get more similar; it is
    * the streaming complement of the batch LSH pipeline, whose banded
    * multi-table recall needs a join no streaming dedup operator can
    * express with bounded state. Shingle-less docs (< 3 tokens) fall
    * back to the exact fingerprint so they dedup exactly rather than
    * colliding on a degenerate band. State: one band key per distinct
    * doc inside the watermark — same O(horizon) bound as
    * [[dedupStream]].
    */
  def nearDedupStream(stream: DataFrame, tsCol: String,
                      textCol: String = "text",
                      numHashes: Int = 8,
                      watermarkDur: String = "10 minutes"): DataFrame = {
    val sig = graft.operators.Dedup.minhashSigExpr(col(textCol), numHashes)
    stream
      .withColumn("_band",
        when(element_at(sig, 1).isNull,
          concat(lit("fp:"),
            graft.operators.TextAnalysis.fingerprint(col(textCol))))
          .otherwise(md5(concat_ws("|", sig))))
      .withWatermark(tsCol, watermarkDur)
      .dropDuplicatesWithinWatermark("_band")
      .drop("_band")
  }

  /** Streaming ingest curation: the row-local half of
    * [[graft.operators.Curation.curate]] applied at ingest time —
    * quality gate, deterministic mixture-rate sampling and PII scrub
    * compose onto a stream UNCHANGED (they are pure projections /
    * filters), then exact dedup inside the watermark horizon. What
    * CANNOT stream is global dedup and decontamination against
    * history — those remain the batch funnel's job; this operator is
    * the front door that keeps obvious junk out of the landing zone.
    */
  def curateStream(stream: DataFrame, tsCol: String,
                   textCol: String = "text",
                   minTokens: Int = 20, minQuality: Double = 0.3,
                   permille: Int = 1000,
                   watermarkDur: String = "10 minutes"): DataFrame = {
    import graft.operators.{Sampling, TextAnalysis}
    val c = col(textCol)
    val gated = stream.filter(
      TextAnalysis.tokenCount(c) >= minTokens &&
        TextAnalysis.qualityScore(c) >= minQuality &&
        TextAnalysis.langId(c) =!= "unknown" &&
        substring(md5(c), 1, 4) < Sampling.hexThreshold(permille))
    val scrubbed = gated.withColumn(textCol, TextAnalysis.scrubPii(c))
    dedupStream(scrubbed, tsCol, textCol, watermarkDur)
  }

  /** The round-6 gate stack on a live ingest stream: Gopher rule
    * battery ∧ hashed-features classifier (both row-local integer
    * expressions — streaming-safe by construction, no state), PII
    * scrub, then watermark-bounded exact dedup. Identical gate
    * semantics to `Curation.curateModern`'s batch Filter, so a
    * replayed finite stream and the batch operator agree
    * (spec-pinned); the boilerplate/line stage needs corpus-global
    * counts and stays a batch (or periodic-compaction) concern.
    */
  def curateModernStream(stream: DataFrame, tsCol: String,
                         textCol: String = "text",
                         minWords: Int = 25,
                         classifierThresholdPpm: Long = 0L,
                         watermarkDur: String = "10 minutes")
      : DataFrame = {
    import graft.operators.TextAnalysis
    val c = col(textCol)
    val gated = stream.filter(
      TextAnalysis.gopherPassExpr(c, minWords) &&
        TextAnalysis.classifierKeepExpr(c, classifierThresholdPpm))
    val scrubbed = gated.withColumn(textCol, TextAnalysis.scrubPii(c))
    dedupStream(scrubbed, tsCol, textCol, watermarkDur)
  }

  /** One event for [[sessionizeStream]]. The event time stays a real
    * timestamp column — the streaming analyzer requires the watermarked
    * column to flow INTO the stateful operator (projecting it to a long
    * upstream detaches the watermark and fails analysis).
    */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start_us: Long, last_us: Long, n: Long)

  /** A closed session emitted downstream. */
  final case class SessionOut(user_id: Long, session_start_us: Long,
                              n_events: Long, duration_sec: Double)

  /** Streaming sessionization — the custom-state counterpart of
    * `Relational.sessionize`, built on `flatMapGroupsWithState` with an
    * event-time timeout. Per user the state is ONE open session
    * (start, last, count); a session closes either when a later event
    * arrives past the gap, or when the watermark passes last + gap
    * (the timeout fires with no further data). State is O(users),
    * independent of stream length — the property a 100 TB/day stream
    * needs — and eviction is driven by the same watermark that bounds
    * lateness.
    *
    * Append-mode output: rows are emitted exactly once, when their
    * session closes.
    */
  def sessionizeStream(stream: DataFrame, tsCol: String = "ts",
                       userCol: String = "user_id",
                       gapMinutes: Int = 30,
                       watermarkDur: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    val ev = stream
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDur)
      .as[SessionEvent]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    def close(uid: Long, s: SessionState): SessionOut =
      SessionOut(uid, s.start_us, s.n,
        (s.last_us - s.start_us).toDouble / 1000000.0)

    def onGroup(uid: Long, events: Iterator[SessionEvent],
                state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).toList
        state.remove()
        return out.iterator
      }
      // micro-batch events are not ordered: sort this user's slice
      // (bounded by per-trigger volume, not stream length)
      val ts = events.map(e => micros(e.ts)).toArray.sorted
      var open = state.getOption
      val closed = mutable.ArrayBuffer.empty[SessionOut]
      ts.foreach { t =>
        open = open match {
          case Some(s) if t - s.last_us <= gapUs =>
            Some(SessionState(s.start_us, math.max(s.last_us, t), s.n + 1))
          case Some(s) =>
            closed += close(uid, s)
            Some(SessionState(t, t, 1))
          case None => Some(SessionState(t, t, 1))
        }
      }
      open.foreach { s =>
        // fire once the watermark proves no in-gap event can still come
        val timeoutMs = (s.last_us + gapUs) / 1000L + 1L
        if (timeoutMs <= state.getCurrentWatermarkMs()) {
          // a straggler inside the watermark whose session is already
          // past the gap horizon: close now (setTimeoutTimestamp
          // rejects timestamps at or before the watermark)
          closed += close(uid, s)
          if (state.exists) state.remove()
        } else {
          state.update(s)
          state.setTimeoutTimestamp(timeoutMs)
        }
      }
      closed.iterator
    }

    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(onGroup)
  }

  final case class Scd2Event(user_id: Long, event_id: Long,
                             ts: java.sql.Timestamp, v: String)
  final case class Scd2State(last_us: Long, last_tie: Long,
                             has: Boolean, last_v: String)
  final case class Scd2Change(user_id: Long, change_us: Long,
                              event_id: Long, value: String)

  /** Streaming SCD-2 change-log stager: the live twin of
    * [[graft.operators.Relational.scd2History]]'s run collapse —
    * emits one row per VALUE CHANGE (the run start), holding only the
    * last (ts, tie, value) per key in state. Validity-interval
    * assignment (the `lead()` step) stays a batch presentation
    * concern: feeding the staged change log back through
    * `scd2History` yields intervals identical to the batch pass over
    * the raw events, because the log IS the collapsed run sequence —
    * the [[mixtureStream]]/[[binSketchStream]] staging discipline
    * applied to dimension history.
    *
    * Ordering contract: each micro-batch slice sorts per key (the
    * [[sessionizeStream]] discipline), so within-trigger disorder is
    * repaired; an event arriving in a LATER trigger with an earlier
    * (ts, tie) than the last processed one cannot be retro-inserted
    * into an already-emitted run sequence and is DROPPED — the
    * standard CDC late-record semantics; size the watermark/trigger
    * so ingest disorder stays within a trigger. State is one
    * (ts, tie, value) per key — O(active keys), the natural CDC
    * state bound — and never expires (a dimension key's last value
    * must outlive any timeout).
    */
  def scd2Stream(stream: DataFrame, tsCol: String = "ts",
                 userCol: String = "user_id",
                 valueCol: String = "event_type",
                 tieCol: String = "event_id"): Dataset[Scd2Change] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val ev = stream
      .select(col(userCol).cast("long").as("user_id"),
        col(tieCol).cast("long").as("event_id"),
        col(tsCol).as("ts"), col(valueCol).cast("string").as("v"))
      .as[Scd2Event]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def sameV(a: String, b: String): Boolean =
      (a == null && b == null) || (a != null && a == b)
    def onGroup(uid: Long, events: Iterator[Scd2Event],
                state: GroupState[Scd2State]): Iterator[Scd2Change] = {
      val slice = events.toArray
        .map(e => (micros(e.ts), e.event_id, e.v))
        .sortBy(t => (t._1, t._2))
      var st = state.getOption.getOrElse(Scd2State(Long.MinValue,
        Long.MinValue, has = false, null))
      val out = mutable.ArrayBuffer.empty[Scd2Change]
      slice.foreach { case (t, id, v) =>
        // cross-trigger stragglers older than the last processed
        // record cannot be retro-inserted: drop (documented)
        if (t > st.last_us || (t == st.last_us && id > st.last_tie)) {
          if (!st.has || !sameV(st.last_v, v))
            out += Scd2Change(uid, t, id, v)
          st = Scd2State(t, id, has = true, v)
        }
      }
      state.update(st)
      out.iterator
    }
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(onGroup)
  }

  /** One event for [[debounceStream]] — keeps the event id so the
    * burst's FIRST event is identifiable at close.
    */
  final case class DebEvent(user_id: Long, event_id: Long,
                            ts: java.sql.Timestamp)

  /** Open-burst state: the first event's identity plus the running
    * last-seen time and suppression count.
    */
  final case class BurstState(first_id: Long, first_us: Long,
                              last_us: Long, burst_idx: Long, n: Long)

  /** A closed burst: its first (surviving) event + suppression count. */
  final case class BurstOut(event_id: Long, user_id: Long,
                            ts_us: Long, burst_idx: Long,
                            n_suppressed: Long)

  /** Streaming twin of `Relational.debounce`: per user, events within
    * `gap` of the previous event extend the current burst and are
    * suppressed; the burst's FIRST event is emitted when the burst
    * closes (a later event past the gap, or the event-time timeout
    * when the watermark passes last + gap). State is O(users) — one
    * open burst each; same close discipline as [[sessionizeStream]].
    * The batch operator is the replay oracle (equivalence spec).
    */
  /** Streaming DSIR-affinity scoring: tag a live document stream with
    * (n_grams, affinity_ppm) against a target corpus — the ingest-time
    * "does this read like the target" gate. The target profile is
    * computed ONCE batch-side (a bucket-sized collect, the Bloom
    * bit-build contract) and ships as a dense array literal, so the
    * streaming side is a PURE PROJECTION: no stream-static join, no
    * state, no watermark needed, and the scores are bit-equal to
    * `Curation.dsirAffinity` on the same documents (equivalence
    * spec). NOTE calling this runs one small Spark job (the profile
    * build) — the index-building contract `decontaminateBloomAgainst`
    * documents.
    */
  def dsirScoreStream(stream: DataFrame, target: DataFrame,
                      textCol: String = "text",
                      n: Int = 2, buckets: Int = 65536): DataFrame = {
    val profile = graft.operators.Curation
      .dsirProfileArray(target, textCol, n, buckets)
    val (nGrams, affinity) = graft.operators.Curation
      .dsirScoreColumns(col(textCol), profile, n, buckets)
    stream.withColumn("n_grams", nGrams)
      .withColumn("affinity_ppm", affinity)
  }

  /** Streaming kNN label vote: tag a live embedding stream with the
    * majority label of its k nearest neighbors in a labeled REFERENCE
    * set — online label propagation / classifier distillation at
    * ingest. The reference set is collected once batch-side (a seed
    * set is small by definition — the expensive-to-label side) and
    * ships as literals, so the streaming side is a PURE PROJECTION:
    * one codegen'd dot per reference, no stream-static join, no
    * state, no watermark. Scoring and both tiebreaks are identical to
    * the batch `Similarity.knnLabelVote` (equivalence spec); NOTE
    * calling this runs one small Spark job (the reference collect).
    */
  def labelVoteStream(stream: DataFrame, refs: DataFrame, k: Int = 5,
                      vecCol: String = "embedding",
                      refIdCol: String = "vec_id",
                      refVecCol: String = "embedding",
                      refLabelCol: String = "label"): DataFrame = {
    val r = graft.operators.Similarity
      .labelRefs(refs, refIdCol, refVecCol, refLabelCol)
    val (pred, votes) = graft.operators.Similarity
      .labelVoteColumns(col(vecCol), r, k)
    stream.withColumn("pred_label", pred)
      .withColumn("pred_votes", votes)
  }

  /** Streaming bin-sketch staging: per (event-time window, group) the
    * same exact fixed-range bin-count array `Sketches.binSketch`
    * builds batch-side — closed windows ARE ingest slices, so the
    * emitted rows feed `Sketches.quantileRollup` directly and any
    * later rollup (per hour, per group, global) merges them without
    * replaying the stream. One stateful aggregation (Structured
    * Streaming forbids cascading two): the array is `bins`
    * conditional sums, O(bins) state per open (window, group) — no
    * collected values, no unbounded state. Integer-exact, so the
    * equivalence spec pins closed windows bit-equal to the batch
    * operator on the same rows. Emitted rows carry the same
    * (bins, lo, hi) contract columns as `Sketches.binSketch` — and
    * the same `bins` DEFAULT — so composing the stager with
    * `quantileRollup` on defaults validates the full binning
    * contract instead of tripping a width assert.
    */
  def binSketchStream(stream: DataFrame, tsCol: String,
                      groups: Seq[String], target: String,
                      bins: Int = 256, lo: Double, hi: Double,
                      windowDur: String = "1 hour",
                      watermarkDur: String = "1 hour"): DataFrame = {
    require(hi > lo, "need a non-empty value range")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(target) - lo) / w).cast("long"), lit(0L)),
      lit(bins - 1L))
    val counts = (0 until bins).map(i =>
      sum(when(col(target).isNotNull && bin === i.toLong, 1L)
        .otherwise(0L)))
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy((window(col(tsCol), windowDur) +: groups.map(col)): _*)
      .agg(array(counts: _*).as("bin_counts"))
      .select((Seq(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start")) ++ groups.map(col) :+
        col("bin_counts") :+
        lit(bins).as("bins") :+ lit(lo).as("lo") :+ lit(hi).as("hi")): _*)
  }

  /** Streaming mixture stager: per (event-time window, source) doc and
    * token counts from a live document stream — closed windows ARE
    * ingest slices, so the emitted rows feed `Curation.mixtureDrift`
    * directly (slice = the formatted window start) and any coarser
    * rollup merges them by addition without replaying the stream (the
    * binSketchStream discipline applied to the mixture). ONE stateful
    * aggregation, O(open windows × sources) state — two longs per key,
    * no collected values. Integer-exact, so the equivalence spec pins
    * closed windows bit-equal to batch `Curation.mixtureStage` on the
    * same rows; the drift-vs-target arithmetic stays in the batch
    * rollup, where Structured Streaming's one-aggregation rule never
    * binds.
    */
  def mixtureStream(stream: DataFrame, tsCol: String,
                    textCol: String = "text", srcCol: String = "source",
                    windowDur: String = "1 hour",
                    watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur),
        col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.operators.TextAnalysis.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType)).as("n_tokens"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice"),
        col("source"), col("n_docs"), col("n_tokens"))

  /** Streaming label-centroid stager: per (event-time window, label,
    * dimension) exact integer (count, sum) lanes from a live
    * embedding stream — closed windows are ingest slices whose lane
    * sums merge by ADDITION ([[graft.operators.Similarity
    * .centroidsFromStage]]) into exactly the batch `labelCentroids`
    * state, so the embedding-drift monitor
    * (`Similarity.centroidDriftStaged` vs a frozen previous snapshot)
    * runs on staged slices without ever re-reading vectors — the
    * binSketch/mixture staging discipline applied to centroid state.
    * ONE stateful aggregation, state O(open windows × labels × dim)
    * rows of two longs; the posexplode is a stateless row-local
    * projection ahead of it. Micro-int microization is the shared
    * ×1e6 floor — integer-exact, so closed slices are bit-equal to a
    * batch stage of the same rows on ANY replay order.
    */
  def centroidStream(stream: DataFrame, tsCol: String,
                     labelCol: String = "label",
                     vecCol: String = "embedding",
                     windowDur: String = "1 hour",
                     watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol), col(labelCol).as("label"),
        posexplode(transform(col(vecCol),
          v => floor(v.cast("double") * 1e6 + 0.5)
            .cast(org.apache.spark.sql.types.LongType)))
          .as(Seq("pos", "u")))
      .groupBy(window(col(tsCol), windowDur), col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("s"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("label"), col("pos"), col("n"), col("s"))

  /** Streaming benchmark-contamination monitor: the live twin of
    * `Dedup.contaminationReport` for a crawl/ingest stream — every
    * incoming training document's distinct word n-grams join the
    * BROADCAST test-suite gram table, and closed windows emit one row
    * per (window, leaked-into test doc) with the leak incidence count
    * (train-doc × leaked-gram pairs). An operator a pipeline alarms
    * on: a benchmark suddenly appearing in the crawl shows up as a
    * spike on its test_id within one watermark delay.
    *
    * State/scale shape: the gram explode is row-local; the
    * stream-static inner join is STATELESS (the static side is
    * benchmark-suite-sized by the same contract as
    * `decontaminateAgainst`'s broadcast); windowed count state is
    * O(open windows × leaked-into test docs) — bounded by the test
    * suite, not the stream. Batch-equivalence holds bit-for-bit on
    * replay because every step (distinct shingles, md5-free counts,
    * epoch-aligned windows) is the batch arithmetic.
    */
  def contaminationStream(stream: DataFrame, tsCol: String,
                          test: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id", n: Int = 8,
                          windowDur: String = "1 hour",
                          watermarkDur: String = "1 hour"): DataFrame = {
    import graft.operators.TextAnalysis
    val testG = test.select(col(idCol).as("test_id"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n)))
          .as("g"))
      .distinct()
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol).as("_ts"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n)))
          .as("g"))
      .join(broadcast(testG), "g")
      .groupBy(window(col("_ts"), windowDur), col("test_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("test_id"), col("n_hits"))
  }

  /** Streaming decontamination monitor — the live "is tonight's crawl
    * contaminated with the eval set" alarm, and the cheapest possible
    * stager: COMPLETELY STATELESS. Every incoming training document is
    * gated row-locally by the broadcast Bloom bits over the test
    * suite's n-grams ([[graft.operators.Dedup.bloomMightContain]] —
    * clean documents, the overwhelming majority, never explode and
    * never touch a join), survivors explode only their Bloom-hit
    * grams into the broadcast EXACT test-gram join (stream-static
    * inner join: stateless), which removes Bloom false positives — so
    * each emitted row is a verified leak evidence triple
    * (slice_start, doc_id, test_id, g), bit-equal to the batch join's
    * answer (no aggregation, no watermark, no state store at all; the
    * per-batch cost is the Bloom probe per gram, and rows emit within
    * the micro-batch that saw them — no watermark delay on the alarm).
    *
    * Contrast with [[contaminationStream]] (the per-test-doc windowed
    * incidence COUNT, one watermark behind): this is the raw evidence
    * feed a pipeline routes to quarantine the moment it appears.
    * `slice_start` is a row-local day floor carried for slice
    * bookkeeping, not a window.
    */
  def decontamStream(stream: DataFrame, tsCol: String,
                     test: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", n: Int = 8,
                     bitsPerKey: Int = 16,
                     numProbes: Int = 5): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val testG = test.select(col(idCol).as("test_id"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n)))
          .as("g"))
      .distinct()
    val mightContain =
      Dedup.bloomMightContain(testG, bitsPerKey, numProbes)
    stream
      .select(
        date_format(date_trunc("DAY", col(tsCol)),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        col(idCol).as("doc_id"),
        array_distinct(TextAnalysis.shingles(col(textCol), n))
          .as("gs"))
      // row-local document gate: no Bloom-hit gram => no explode
      .where(exists(col("gs"), g => mightContain(g)))
      .select(col("slice_start"), col("doc_id"),
        explode(col("gs")).as("g"))
      // per-gram gate: only the maybe-contaminated slice pays the join
      .where(mightContain(col("g")))
      .join(broadcast(testG), "g")
      .select(col("slice_start"), col("doc_id"), col("test_id"),
        col("g"))
  }

  /** Streaming content-addressed-store ingest monitor — the live
    * dedup-ratio view of [[graft.operators.Multimodal.cdcDedupReport]]
    * for a media feed: each incoming blob chunks ROW-LOCALLY
    * (gear CDC by default — O(1)/byte, the production rate), and
    * closed windows emit one row per (window, distinct chunk hash)
    * with its copy count and length — the census a storage planner
    * rolls up ("tonight's crawl is 38% duplicate bytes") and joins
    * against the store's existing chunk index to price the ingest
    * BEFORE writing it.
    *
    * State/scale shape: the chunk explode is row-local; state is one
    * (count, min-len) row per distinct chunk hash per OPEN window —
    * watermark-bounded, never store-history-bounded (the against-
    * the-store join is the consumer's broadcast/bucketed join on the
    * emitted hashes, outside the stream). Merge-only counters, so
    * closed slices roll up to the batch census by addition.
    */
  def cdcDedupStream(stream: DataFrame, tsCol: String,
                     binCol: String = "payload",
                     windowDur: String = "1 day",
                     watermarkDur: String = "1 day",
                     chunker: Column => Column =
                       graft.functions.CdcChunks.gearCdcChunks)
      : DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol).as("_ts"),
        explode(chunker(col(binCol))).as("c"))
      .groupBy(window(col("_ts"), windowDur),
        col("c.chunk_md5").as("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("c.len")).cast("long").as("chunk_len"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("chunk_md5"), col("n_copies"), col("chunk_len"))

  /** Streaming time-series resample: per (user, fixed epoch-aligned
    * interval) event count and DECIMAL-exact value sum, emitted when
    * the watermark closes the window — the streaming counterpart of
    * `Relational.resample`. Buckets line up exactly with the batch
    * operator's `floor(unix_micros / binUs)` arithmetic because
    * Spark's `window()` is epoch-aligned for divisor durations, so a
    * closed streaming row is bit-equal to its batch twin.
    *
    * Deliberately NOT gap-filled: the batch operator materializes
    * zero rows for quiet intervals from the corpus bucket range,
    * which is unknowable mid-stream (empty windows produce no state
    * and the range keeps growing). Zero-filling a live feed is the
    * reader's join against a calendar dimension — or run the batch
    * operator over the accumulated store. State is O(users × open
    * windows inside the watermark horizon).
    */
  def resampleStream(stream: DataFrame, tsCol: String = "ts",
                     userCol: String = "user_id",
                     valueCol: String = "value",
                     intervalMinutes: Int = 360,
                     watermarkDur: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(col(userCol).as("user_id"),
        window(col(tsCol), s"$intervalMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .as("_sv"))
      .select(col("user_id"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_start"),
        col("n_events"),
        // coalesce like the batch twin: a window whose events all
        // carry NULL values sums to NULL, batch emits 0.0
        coalesce(col("_sv").cast("double"), lit(0.0)).as("sum_value"))

  def debounceStream(stream: DataFrame, tsCol: String = "ts",
                     userCol: String = "user_id",
                     idCol: String = "event_id",
                     gapMinutes: Int = 5,
                     watermarkDur: String = "10 minutes")
      : Dataset[BurstOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    val ev = stream
      .select(col(userCol).cast("long").as("user_id"),
        col(idCol).cast("long").as("event_id"), col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDur)
      .as[DebEvent]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def close(uid: Long, s: BurstState): BurstOut =
      BurstOut(s.first_id, uid, s.first_us, s.burst_idx, s.n - 1)

    def onGroup(uid: Long, events: Iterator[DebEvent],
                state: GroupState[BurstState]): Iterator[BurstOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).toList
        state.remove()
        return out.iterator
      }
      // sort this user's micro-batch slice by (ts, id) — the batch
      // operator's tie-break
      val evs = events.map(e => (micros(e.ts), e.event_id))
        .toArray.sorted
      var open = state.getOption
      val closed = mutable.ArrayBuffer.empty[BurstOut]
      evs.foreach { case (t, id) =>
        open = open match {
          case Some(s) if t - s.last_us <= gapUs =>
            Some(s.copy(last_us = math.max(s.last_us, t), n = s.n + 1))
          case Some(s) =>
            closed += close(uid, s)
            Some(BurstState(id, t, t, s.burst_idx + 1, 1))
          case None => Some(BurstState(id, t, t, 1L, 1))
        }
      }
      open.foreach { s =>
        val timeoutMs = (s.last_us + gapUs) / 1000L + 1L
        if (timeoutMs <= state.getCurrentWatermarkMs()) {
          closed += close(uid, s)
          if (state.exists) state.remove()
        } else {
          state.update(s)
          state.setTimeoutTimestamp(timeoutMs)
        }
      }
      closed.iterator
    }

    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(onGroup)
  }

  final case class FunnelEvent(user_id: Long, step_idx: Int,
                               ts: java.sql.Timestamp)
  final case class FunnelState(times: Seq[Seq[Long]], last_us: Long)
  final case class FunnelOut(user_id: Long, steps_completed: Long,
                             step_ts_us: Seq[Long])

  /** Streaming twin of `Relational.funnel`: per user, the in-order
    * step completion times, emitted when the user's funnel closes
    * (no funnel-relevant event for `idleMinutes` of EVENT time).
    *
    * Unlike sessionize/debounce, exact funnel semantics cannot run on
    * O(1) state: batch takes sequential MINIMA (step k's time is the
    * earliest step-k event after step k-1's time), so a late-arriving
    * EARLIER step-1 event can re-qualify step-2 events that were
    * previously ineligible. The state therefore buffers the user's
    * step-event times inside the idle horizon — bounded by the user's
    * funnel-relevant events per horizon, not by the stream — and the
    * sequential-min reduction runs once at close, exactly as batch
    * computes it (the equivalence spec replays a disordered stream).
    */
  def funnelStream(stream: DataFrame, steps: Seq[String],
                   tsCol: String = "ts",
                   userCol: String = "user_id",
                   typeCol: String = "event_type",
                   idleMinutes: Int = 60,
                   watermarkDur: String = "10 minutes")
      : Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = stream.sparkSession
    import spark.implicits._
    val idleUs = idleMinutes.toLong * 60 * 1000000L
    // 1-based array_position → 0-based step index; 0 = not a step
    val stepIdx = (array_position(
      typedLit(steps.toArray), col(typeCol)) - 1).cast("int")
    val ev = stream
      .select(col(userCol).cast("long").as("user_id"),
        stepIdx.as("step_idx"), col(tsCol).as("ts"))
      .filter(col("step_idx") >= 0)
      .withWatermark("ts", watermarkDur)
      .as[FunnelEvent]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    // the batch reduction: sequential strictly-after minima
    def close(uid: Long, s: FunnelState): FunnelOut = {
      val out = mutable.ArrayBuffer.empty[Long]
      var prev = Option.empty[Long]
      var k = 0
      var go = true
      while (go && k < steps.length) {
        val cand = s.times(k).filter(t => prev.forall(t > _))
        if (cand.isEmpty) go = false
        else { prev = Some(cand.min); out += cand.min }
        k += 1
      }
      FunnelOut(uid, out.length.toLong, out.toSeq)
    }

    def onGroup(uid: Long, events: Iterator[FunnelEvent],
                state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).toList
        state.remove()
        return out.iterator
      }
      val empty = FunnelState(Seq.fill(steps.length)(Seq.empty), 0L)
      var s = state.getOption.getOrElse(empty)
      events.foreach { e =>
        val t = micros(e.ts)
        s = FunnelState(
          s.times.updated(e.step_idx, s.times(e.step_idx) :+ t),
          math.max(s.last_us, t))
      }
      val timeoutMs = (s.last_us + idleUs) / 1000L + 1L
      if (timeoutMs <= state.getCurrentWatermarkMs()) {
        val out = close(uid, s)
        if (state.exists) state.remove()
        Iterator.single(out)
      } else {
        state.update(s)
        state.setTimeoutTimestamp(timeoutMs)
        Iterator.empty
      }
    }

    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(onGroup)
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Deterministic batch-entry replay of [[binSketchStream]]: pushes a
    * finite table through the REAL streaming stager (file source →
    * watermark → windowed bin-count aggregation → append-mode memory
    * sink) and returns the closed-window slice rows as a LOCAL
    * DataFrame. One far-future sentinel row (year 2100, dropped by
    * `slice_start` bound before return) advances the watermark past
    * every real window so the append-mode sink sees them all — the
    * same flush discipline the equivalence specs use, packaged so a
    * declared oracle query can run the streaming code path itself
    * rather than a batch stand-in.
    *
    * The result is collected to the driver by design: slice rows are
    * (windows × groups) bin arrays — kilobytes — and localizing them
    * lets the temp input dir and memory sink be torn down before
    * return, so repeated invocations (Bench runs every query twice)
    * leak nothing. At production scale the stream is a real ingest
    * feed and the slices land in a staging table instead
    * (MIGRATION.md "Branch-point staging"); this harness exists to
    * make the streamed slices themselves oracle-checkable.
    */
  def replayedBinSlices(events: DataFrame, tsCol: String,
                        groups: Seq[String], target: String,
                        bins: Int = 256, lo: Double, hi: Double,
                        windowDur: String = "1 day"): DataFrame =
    replayedSlices(events, tsCol)(stream =>
      binSketchStream(stream, tsCol, groups, target,
        bins, lo, hi, windowDur))

  /** The general replay harness behind [[replayedBinSlices]]: run ANY
    * slice-stager (a streaming transform emitting a `slice_start`
    * column) over a finite table via a real file-source stream, flush
    * every real window with one year-2100 sentinel row (its own
    * window is dropped by the `slice_start` bound), and hand back the
    * closed slices as a LOCAL DataFrame with the temp input dir and
    * memory sink already torn down.
    */
  def replayedSlices(events: DataFrame, tsCol: String)(
      build: DataFrame => DataFrame): DataFrame = {
    val s = events.sparkSession
    // a finite replay's cost is dominated by fixed I/O: the temp input
    // parquet, the checkpoint offsets/commits, and one state-store
    // delta per micro-batch per partition — all fsync'd. None of it
    // needs durability (the harness tears the dir down on return), so
    // host it on tmpfs when the box has one: same code path, same
    // semantics, the fsyncs hit RAM. Falls back to java.io.tmpdir.
    val shm = java.nio.file.Paths.get("/dev/shm")
    // capacity guard, not just writability: Docker defaults /dev/shm
    // to 64 MB — writable, but an sf0.1 replay (input parquet +
    // checkpoint + state deltas) would ENOSPC mid-stream where
    // java.io.tmpdir succeeds. Require comfortable headroom.
    val shmUsable =
      try java.nio.file.Files.isWritable(shm) &&
        java.nio.file.Files.getFileStore(shm).getUsableSpace > (4L << 30)
      catch { case _: java.io.IOException => false }
    val dir =
      (if (shmUsable)
        java.nio.file.Files.createTempDirectory(shm, "graft_replay")
      else java.nio.file.Files.createTempDirectory("graft_replay"))
        .toString
    val in = dir + "/in"
    // harness-phase timing behind an env flag: the replay's cost is
    // fixed machinery, and tuning it blind was the round-10 mistake
    val dbg = sys.env.contains("SPARK_GRAFT_REPLAY_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      val t = System.nanoTime()
      System.err.println(
        f"[replay] $tag ${(t - t0) / 1e9}%.2fs")
      t0 = t
    }
    // parallelize the replay scan: the feed usually arrives as 1-2
    // parquet files (it was loaded from one), and the file-source
    // batch then runs its map-side partial aggregation at file
    // parallelism — single-threaded for the whole feed. 8 input
    // shards let batch 0's scan+partial stage use real cores while
    // the state-store stage stays at the small replay partition count.
    events.repartition(8).write.mode("overwrite").parquet(in)
    lap("write-input")
    val schema = s.read.parquet(in).schema
    val stream = s.readStream.schema(schema).parquet(in)
    val name = s"graft_replay_${replaySeq.incrementAndGet()}"
    // slice-stager state is tiny (windows × groups rows), but every
    // micro-batch commits one state-store file PER shuffle partition
    // — at the session default (32 here, thousands on a cluster)
    // those fsyncs dominate a finite replay. 8 partitions cuts the
    // commit count 4× with zero semantic effect (results are
    // partitioning-independent by construction). The conf is held
    // until the query STOPS, not restored right after start(): batch
    // 0 captures session confs on the query thread, so an immediate
    // restore would race the capture.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    // 2, not the session 32 or the former 8: state-store open/commit
    // is per partition per micro-batch and dominates a finite replay
    // (measured: empty flush batch 600 ms at 8 partitions, 450 at 2),
    // while the map-side partial agg still runs at input-file
    // parallelism regardless of this knob, so batch 0 loses nothing.
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_REPLAY_PARTS", "2"))
    // sentinel: one LITERAL row at 2100 closes every real window; its
    // own (never-closing) window is filtered below. Appended BEFORE
    // the query starts so batch 0 sees data + sentinel together — the
    // watermark jumps past every real window after one batch and the
    // single trailing no-data batch flushes them all. The earlier
    // start→process→append→process shape ran four micro-batches (two
    // of them no-data watermark batches of pure state-store/sink
    // overhead) for the same answer; processAllAvailable() blocks
    // through trailing no-data batches, so one call suffices. The row
    // is built from the schema (ts = 2100, every other column null —
    // watermark tracking only needs the event-time column, and the
    // stagers' explodes/filters drop the null payload before any
    // group), not `events.limit(1)`: the limit form re-scanned the
    // whole input for one row, a visible slice of the fixed replay
    // cost this harness exists to keep down.
    val sentinelTs: Any = schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        java.time.LocalDateTime.of(2100, 1, 1, 0, 0, 0)
      case _ => java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    }
    val sentinelRow = org.apache.spark.sql.Row.fromSeq(
      schema.map(f => if (f.name == tsCol) sentinelTs else null))
    s.createDataFrame(
        java.util.Collections.singletonList(sentinelRow), schema)
      .write.mode("append").parquet(in)
    lap("sentinel")
    val q = build(stream)
      .writeStream.outputMode("append")
      // pin the checkpoint inside the replay dir: the memory sink's
      // default temp checkpoint lands on java.io.tmpdir (disk), which
      // would put the offsets/commits/state fsyncs right back on the
      // slow path the tmpfs dir exists to avoid
      .option("checkpointLocation", dir + "/ckpt")
      .format("memory").queryName(name).start()
    val local =
      try {
        lap("start")
        q.processAllAvailable()
        lap("process")
        if (dbg) q.recentProgress.foreach(p => System.err.println(
          s"[replay]   batch ${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}"))
        // Tripwire for the silent-truncation class found in round 14:
        // if anything between the source and the EventTimeWatermark
        // node suppresses the flush sentinel (e.g. a plain .filter the
        // optimizer pushes below the watermark), the watermark stalls
        // at max-real-ts − delay and the NEWEST window's rows silently
        // never emit — the replay then returns a subset that LOOKS
        // complete. The sentinel sits at 2100-01-01, so a stalled
        // watermark is detectable by construction: fail loudly instead
        // of returning truncated slices. Scope: only queries whose
        // emission IS watermark-closed (a stateStoreSave aggregation) —
        // dedupe-based stagers emit first-sight and may legitimately
        // gate rows (sentinel included) before the watermark
        // (curateStream's quality filter); stateless queries report no
        // watermark at all.
        for {
          p <- Option(q.lastProgress)
          wm <- Option(p.eventTime.get("watermark"))
          if wm < "2099-01-01"
          if p.stateOperators.exists(_.operatorName
            .contains("stateStoreSave"))
        } throw new IllegalStateException(
          s"replayedSlices: final watermark $wm never reached the " +
            "2100 flush sentinel - a transform between the source " +
            "and the watermark node is suppressing it (pushable " +
            "filter?); the newest window's rows would be silently " +
            "missing. Express the drop inside a generator instead " +
            "(see nearDupStream).")
        val out = s.table(name).filter(col("slice_start") < "2099-01-01")
        // coalesce(1): the slices are kilobytes, but a bare local
        // relation parallelizes to defaultParallelism (32 here) and
        // every downstream rollup then schedules 32-task stages over
        // near-empty partitions — measured ~0.8 s of pure scheduling
        // per stream row. One partition keeps the consumer plans
        // task-count-proportional to the data.
        val r = s.createDataFrame(
          java.util.Arrays.asList(out.collect(): _*), out.schema)
          .coalesce(1)
        lap("collect")
        r
      } finally {
        q.stop()
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.catalog.dropTempView(name)
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
            .iterator().asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }
    local
  }

  /** Streaming frequent-items stager: per event-time window, ONE
    * bounded Misra-Gries summary of `key` (state = cap counters per
    * open window — vocabulary-sized key domains cost the same as
    * 5-value enums). Emits `(slice_start, n, keys)` when the
    * watermark closes the window.
    *
    * The per-slice candidate KEYS are partitioning-dependent (extra
    * survivors vary) but their UNION provably covers every globally
    * hot key: if a key's overall share is ≥ 1/k with cap ≥ 2k, then
    * by pigeonhole at least one slice gives it share > 1/(cap+1)
    * and MG retains it there. So downstream, union the slices'
    * keys and run the exact verify pass
    * (`Sketches.verifyHitters`) — deterministic final answer, no
    * vocabulary-wide shuffle anywhere, stream state O(windows × cap).
    */
  /** Streaming tokenizer-coverage monitor: per (event-time window,
    * group) token and OOV counts against a FROZEN vocabulary — the
    * live twin of `TextAnalysis.vocabCoverage`. Membership is a
    * stateless stream-static broadcast join (the vocab is bounded by
    * construction); the only state is ONE count row per open
    * (window, group). Counts are integers and merge by addition, so
    * closed slices roll up to the batch per-group answer exactly —
    * `oov_stream` pins that as a declared oracle row. The
    * distinct-OOV-terms column of the batch report is deliberately
    * absent here: distinct doesn't merge by addition, and the live
    * question is the RATE (is this feed drifting away from my
    * tokenizer?), not the term inventory — run the batch report over
    * the accumulated store for that.
    */
  def oovStream(stream: DataFrame, vocab: DataFrame, tsCol: String,
                textCol: String = "text", groupCol: String = "source",
                windowDur: String = "1 day",
                watermarkDur: String = "1 hour"): DataFrame = {
    // the vocabulary is FROZEN and bounded by contract, so membership
    // is collected ONCE into a row-local literal set here rather than
    // stream-static-joined: a static join side is re-executed on
    // EVERY micro-batch (the vocab's own top-N aggregation ran twice
    // per replay — measured ~1 s/batch at sf0.1), while a literal
    // in-set probe is compiled into the projection and costs the
    // stream nothing per batch. Long-lived production streams that
    // must hot-swap the vocabulary keep the join form — restart the
    // query (or move the set into a rocks-backed state op) on vocab
    // refresh, which is the tokenizer-release cadence anyway.
    // isNotNull: a NULL vocab term would put null into the IN-list,
    // making the predicate NULL (not true) for every non-matching
    // token — `otherwise(0)` would then count real OOV tokens as
    // in-vocab. The old left-join form counted them as OOV; keep that.
    val terms = vocab.select(col("term"))
      .where(col("term").isNotNull).distinct().collect()
      .map(_.getString(0)).sorted
    val miss = !col("term").isInCollection(terms)
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol), col(groupCol),
        explode(graft.operators.TextAnalysis.tokens(col(textCol)))
          .as("term"))
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(miss, 1L).otherwise(0L)).as("n_oov"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col(groupCol), col("n_tokens"), col("n_oov"))
  }

  /** Streaming JSON type-histogram stager — the reference's core
    * schemaless-document profile as a LIVE monitor: per event-time
    * window, one count row per (path, value-type tag) of the exploded
    * JSON column ([[graft.plans.JsonExplode]] runs unchanged inside
    * the stream). State is schema-sized — (windows × paths × tags)
    * count rows, never document-sized — and counts merge by addition,
    * so closed slices roll up to exactly the batch
    * [[graft.operators.JsonProfiler.typeHistogram]] (`json_types_
    * stream` pins that as a declared oracle row). Diff a slice's
    * (path, vtag) set against the frozen contract and you have the
    * "producer started sending a new field / re-typed one" alarm the
    * batch [[graft.operators.Profiler.schemaDiff]] raises offline.
    */
  def jsonTypeStream(stream: DataFrame, tsCol: String,
                     jsonCol: String, windowDur: String = "1 day",
                     watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol),
        graft.plans.JsonExplode.jsonExplode(col(jsonCol), false)
          .as(Seq("path", "vstr", "vnum", "vtag")))
      .groupBy(window(col(tsCol), windowDur), col("path"), col("vtag"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("path"), col("vtag"), col("cnt"))

  /** Live schema-drift report derived from [[jsonTypeStream]]'s closed
    * slices — the streaming twin of
    * [[graft.operators.Profiler.schemaDiff]]: between each closed
    * window and the PREVIOUS closed window, every path is tagged
    * `added` / `removed` / `type_changed` / `kept` by its DOMINANT
    * value-type tag (max count, ties to the lexicographically first
    * tag — deterministic like every other tie in the engine). Merge-
    * only: the input is the stager's (windows × paths × tags) count
    * state, so no new corpus scan happens here; the lag pairing runs
    * over DISTINCT slice starts (≤ #windows rows — the
    * WindowAuditSpec boundedness contract), and the diff join is
    * schema-sized per window pair.
    */
  def schemaDiffSlices(slices: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = slices.groupBy(col("slice_start"), col("path"))
      .agg(min(struct((-col("cnt")).as("negc"),
        col("vtag").as("tag"))).as("m"))
      .select(col("slice_start"), col("path"),
        col("m").getField("tag").as("tag"))
    val ws = slices.select("slice_start").distinct()
      .withColumn("prev_start",
        lag("slice_start", 1).over(Window.orderBy("slice_start")))
      .filter(col("prev_start").isNotNull)
    val oldT = ws.alias("w").join(dom.alias("o"),
        col("o.slice_start") === col("w.prev_start"))
      .select(col("w.slice_start").as("slice_start"),
        col("o.path").as("path"), col("o.tag").as("old_tag"))
    val newT = ws.select("slice_start").join(dom, Seq("slice_start"))
      .select(col("slice_start"), col("path"),
        col("tag").as("new_tag"))
    oldT.join(newT, Seq("slice_start", "path"), "full_outer")
      .select(col("slice_start"), col("path"),
        when(col("old_tag").isNull, lit("added"))
          .when(col("new_tag").isNull, lit("removed"))
          .when(col("old_tag") =!= col("new_tag"),
            lit("type_changed"))
          .otherwise(lit("kept")).as("status"),
        col("old_tag"), col("new_tag"))
      .orderBy("slice_start", "path")
  }

  /** Live language-mixture monitor: per event-time window, document
    * counts per PREDICTED language — the "did the crawl's language
    * mix drift" alarm for a multilingual ingest feed. The classifier
    * ([[graft.operators.TextAnalysis.langIdNgram]], Cavnar–Trenkle
    * with compiled-in profiles) is a row-local projection, so the
    * only state is one count row per (window, language) and closed
    * slices merge by addition to the batch per-language census
    * exactly (`lang_mix_stream` pins that as a declared oracle row).
    */
  def langMixStream(stream: DataFrame, tsCol: String,
                    textCol: String = "text",
                    windowDur: String = "1 day",
                    watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur),
        graft.operators.TextAnalysis.langIdNgram(col(textCol))
          .as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("lang_pred"), col("n_docs"))

  /** Live token-budget monitor: per (event-time window, stratum),
    * document count plus whitespace-proxy AND exact byte-BPE token
    * totals — the "is the mixture filling to budget, in the unit the
    * tokenizer actually bills" feed for a budgeted ingest
    * ([[graft.operators.Sampling.tokenBudgetSample]]'s live twin).
    * Both token counters are row-local compiled expressions
    * ([[graft.functions.ByteBpe]]), so state is ONE count row per
    * open (window, stratum) and closed slices merge by addition to
    * the batch [[graft.operators.TextAnalysis.bpeBudgetReport]].
    */
  def tokenBudgetStream(stream: DataFrame, tsCol: String,
                        textCol: String = "text",
                        groupCol: String = "source",
                        windowDur: String = "1 day",
                        watermarkDur: String = "1 hour"): DataFrame = {
    val c = col(textCol)
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.operators.TextAnalysis.tokenCount(c)
          .cast(org.apache.spark.sql.types.LongType)).as("ws_tokens"),
        sum(graft.operators.TextAnalysis.bpeTokenCount(c))
          .as("bpe_tokens"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col(groupCol), col("n_docs"), col("ws_tokens"),
        col("bpe_tokens"))
  }

  /** Live correlation-drift monitor: per (event-time window, stratum),
    * the SAME six exact integer sufficient-statistic lanes per column
    * pair as the batch [[graft.operators.Profiler.corrStats]] (shared
    * lane builders — `Profiler.corrLanes`), emitted as one
    * (slice_start, group, col_x, col_y, n, Σx, Σy, Σxy, Σx², Σy²) row
    * per closed (window, pair). The lanes are sums, so closed slices
    * merge by ADDITION to the batch grouped answer exactly — the
    * "is the quality/length relationship drifting live" alarm with a
    * deterministic rollup, no float corr() anywhere.
    *
    * Scale shape: state is ONE lane row per open (window, stratum) —
    * pairs × 6 longs — whatever the feed weighs; the per-pair unpack
    * is a stateless post-aggregation explode. Same 64-bit overflow
    * contract as the batch operator (caller keeps units small).
    */
  def corrStatsStream(stream: DataFrame, tsCol: String,
                      cols: Seq[String],
                      groupCol: String = "source",
                      windowDur: String = "1 day",
                      watermarkDur: String = "1 hour"): DataFrame = {
    val (lanes, entries) = Profiler.corrLanes(cols)
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(lanes.head, lanes.tail: _*)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col(groupCol), explode(array(entries: _*)).as("e"))
      .select(col("slice_start"), col(groupCol), col("e.*"))
  }

  /** Live exact-dedup monitor: per (event-time window, normalized-text
    * fingerprint), copy count and canonical survivor (min id), emitted
    * only for groups with ≥ 2 copies when the watermark closes the
    * window — the ingest-time "this batch is re-crawling what it
    * already sent" alarm, using the SAME 16-byte fingerprint as the
    * batch exact-dedup family so live findings join directly against
    * [[graft.operators.Dedup.exactGroups]] output.
    *
    * Scale shape: state is one (count, min-id) row per distinct
    * fingerprint per OPEN window — the irreducible memory of any
    * exact streaming dedup, bounded by the watermark horizon, never
    * by corpus history; counts/min merge associatively so closed
    * slices equal the batch per-window groupBy exactly. The ≥ 2
    * filter is stateless and post-aggregation: it trims the emitted
    * feed (duplicates are the rare case), not the state.
    */
  def dupGroupsStream(stream: DataFrame, tsCol: String,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      windowDur: String = "1 day",
                      watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur),
        graft.operators.TextAnalysis.fingerprint(col(textCol))
          .as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .filter(col("n_copies") >= 2)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("fp"), col("n_copies"), col("keep_id"))

  /** Live NEAR-dup census: per closed window and MinHash-LSH band
    * bucket with ≥ 2 members, the member count and min id — the
    * "tonight's crawl is 30% near-dup" alarm
    * ([[dupGroupsStream]] covers exact fingerprints only; a
    * re-worded boilerplate flood is invisible to it). Signatures are
    * the row-local [[graft.operators.Dedup.minhashSigExpr]] (the
    * documented streaming shape — a pure projection, no explode-
    * groupBy stage a stateful query can't host), banded exactly like
    * the batch [[graft.operators.Dedup.minhashBands]] (same md5 band
    * keys), so emitted buckets join the batch near-dup family
    * directly.
    *
    * Contract: bucket membership is the LSH CANDIDATE signal — the
    * same pre-verify stage `minhashNearDups` Jaccard-checks offline.
    * A live alarm wants the candidate rate (false positives are rare
    * and benign at alarm granularity); the verified pair list stays a
    * batch job against the emitted buckets. Scale shape: state is one
    * (count, min-id) row per distinct (band, bucket) per OPEN window
    * — watermark-bounded, never corpus-bounded; counters merge-only,
    * so closed slices equal the batch per-window band census exactly
    * (spec-pinned), the [[cdcDedupStream]] roll-up contract. Docs
    * with < 3 tokens have no shingles and drop, mirroring the batch
    * signature path.
    */
  def nearDupStream(stream: DataFrame, tsCol: String,
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    numHashes: Int = 8, bands: Int = 4,
                    windowDur: String = "1 day",
                    watermarkDur: String = "1 hour"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val bandArr = array((0 until bands).map(b =>
      struct(lit(b).as("band_idx"),
        md5(concat_ws("|",
          (0 until r).map(i => col("_sig").getItem(b * r + i)): _*))
          .as("band_key"))): _*)
    // the shingle-less drop lives INSIDE the generator (explode of an
    // empty array), NOT as a .filter before the aggregation: a plain
    // predicate here is pushed by the optimizer BELOW the
    // EventTimeWatermark node, so any max-timestamp row it rejects
    // (a replay's flush sentinel, a heartbeat with an empty payload)
    // dies before its event time registers — and the newest real
    // window then never closes (found live: the last daily slice
    // vanished from the replay while every earlier one emitted).
    // Generators are never pushed below the watermark.
    val bandsOrEmpty = when(col("_sig").getItem(0).isNotNull, bandArr)
      .otherwise(array().cast(
        "array<struct<band_idx:int,band_key:string>>"))
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol).as("_ts"), col(idCol).as("_id"),
        graft.operators.Dedup.minhashSigExpr(col(textCol), numHashes)
          .as("_sig"))
      .select(col("_ts"), col("_id"), explode(bandsOrEmpty).as("b"))
      .groupBy(window(col("_ts"), windowDur),
        col("b.band_idx").as("band_idx"),
        col("b.band_key").as("band_key"))
      .agg(count(lit(1)).as("n_members"), min(col("_id")).as("keep_id"))
      .filter(col("n_members") >= 2)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("band_idx"), col("band_key"), col("n_members"),
        col("keep_id"))
  }

  /** Live PERCEPTUAL near-dup census for binary media — the image
    * twin of [[nearDupStream]], completing the 2×2 dedup matrix:
    * batch exact chunk ([[graft.operators.Multimodal.cdcDedupReport]]),
    * live exact chunk ([[cdcDedupStream]]), batch perceptual
    * (`phash_near_dups`), live perceptual (this). Each incoming
    * bitmap hashes ROW-LOCALLY ([[graft.functions.DHash64]] — one
    * compiled projection, streaming-safe by construction), the 64-bit
    * hash splits into maxDist+1 pigeonhole blocks (the
    * [[graft.operators.Dedup.hamming64NearDups]] band keys), and
    * closed windows emit every (block, value) bucket with ≥ 2
    * members — "tonight's media crawl is re-encoding yesterday's
    * images" at alarm granularity; the exact-Hamming pair list stays
    * a batch job against the emitted buckets, like the text family.
    *
    * State: one (count, min-id) row per distinct block bucket per
    * OPEN window — watermark-bounded; merge-only counters, so closed
    * slices equal the batch per-window block census exactly. The
    * undecodable-bitmap drop (null hash: wrong byte length) lives
    * INSIDE the generator — the [[nearDupStream]] watermark-pushdown
    * lesson, enforced by the replay tripwire.
    */
  def phashDupStream(stream: DataFrame, tsCol: String,
                     bmpCol: String = "bmp", wCol: String = "w",
                     hCol: String = "h", idCol: String = "id",
                     maxDist: Int = 3,
                     windowDur: String = "1 day",
                     watermarkDur: String = "1 hour"): DataFrame = {
    val nBlocks = maxDist + 1
    require(64 % nBlocks == 0, "64 bits must split into maxDist+1")
    val width = 64 / nBlocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val blockArr = array((0 until nBlocks).map(b =>
      struct(lit(b).as("block_idx"),
        shiftright(col("_sig"), b * width).bitwiseAND(mask)
          .as("block_val"))): _*)
    val blocksOrEmpty = when(col("_sig").isNotNull, blockArr)
      .otherwise(array().cast(
        "array<struct<block_idx:int,block_val:bigint>>"))
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol).as("_ts"), col(idCol).as("_id"),
        graft.functions.DHash64.dHash64(col(bmpCol), col(wCol),
          col(hCol)).as("_sig"))
      .select(col("_ts"), col("_id"), explode(blocksOrEmpty).as("b"))
      .groupBy(window(col("_ts"), windowDur),
        col("b.block_idx").as("block_idx"),
        col("b.block_val").as("block_val"))
      .agg(count(lit(1)).as("n_members"), min(col("_id")).as("keep_id"))
      .filter(col("n_members") >= 2)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("block_idx"), col("block_val"), col("n_members"),
        col("keep_id"))
  }

  /** Live perceptual near-dup census for PCM AUDIO — the wav-branch
    * twin of [[phashDupStream]], completing the perceptual matrix
    * (image/audio × batch/live): each incoming payload fingerprints
    * ROW-LOCALLY ([[graft.functions.AudioHash64]] — one compiled
    * byte loop, streaming-safe), the 64-bit code splits into
    * maxDist+1 pigeonhole blocks, and closed windows emit every
    * (block, value) bucket with ≥ 2 members — "tonight's crawl is
    * re-encoding yesterday's audio" at alarm granularity; the exact
    * Hamming pair list stays a batch job against the emitted
    * buckets, like the image and text families.
    *
    * State: one (count, min-id) row per distinct block bucket per
    * OPEN window — watermark-bounded; merge-only counters, so closed
    * slices equal the batch per-window block census exactly. The
    * unfingerprintable-payload drop (null hash: odd length,
    * all-silence, too short) lives INSIDE the generator — the
    * watermark-pushdown lesson, enforced by the replay tripwire.
    */
  def audioDupStream(stream: DataFrame, tsCol: String,
                     pcmCol: String = "pcm", idCol: String = "id",
                     maxDist: Int = 3,
                     windowDur: String = "1 day",
                     watermarkDur: String = "1 hour"): DataFrame = {
    val nBlocks = maxDist + 1
    require(64 % nBlocks == 0, "64 bits must split into maxDist+1")
    val width = 64 / nBlocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val blockArr = array((0 until nBlocks).map(b =>
      struct(lit(b).as("block_idx"),
        shiftright(col("_sig"), b * width).bitwiseAND(mask)
          .as("block_val"))): _*)
    val blocksOrEmpty = when(col("_sig").isNotNull, blockArr)
      .otherwise(array().cast(
        "array<struct<block_idx:int,block_val:bigint>>"))
    stream
      .withWatermark(tsCol, watermarkDur)
      .select(col(tsCol).as("_ts"), col(idCol).as("_id"),
        graft.functions.AudioHash64.audioHash64(col(pcmCol))
          .as("_sig"))
      .select(col("_ts"), col("_id"), explode(blocksOrEmpty).as("b"))
      .groupBy(window(col("_ts"), windowDur),
        col("b.block_idx").as("block_idx"),
        col("b.block_val").as("block_val"))
      .agg(count(lit(1)).as("n_members"), min(col("_id")).as("keep_id"))
      .filter(col("n_members") >= 2)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("block_idx"), col("block_val"), col("n_members"),
        col("keep_id"))
  }

  /** Live SEMANTIC decontamination — the paraphrase-leak alarm
    * completing the decontamination matrix (exact batch / Bloom batch
    * / n-gram stream / semantic batch / semantic STREAM): each
    * incoming training vector probes the broadcast LSH bucket table
    * of the benchmark suite and emits exact-cosine-verified evidence
    * rows (slice_start, train_id, test_id, score ≥ threshold) —
    * bit-equal to [[graft.operators.Similarity.semanticDecontam]]'s
    * batch answer on the same rows, within the micro-batch that saw
    * them (no watermark delay on the alarm).
    *
    * COMPLETELY STATELESS, like [[decontamStream]] — but the batch
    * operator dedupes candidates that collide in several tables with
    * a `.distinct()`, which in a stream would be a state store. The
    * stateless replacement is row-local: both sides carry their full
    * per-table bucket arrays (tables × 8 bytes, broadcast side tiny
    * by the benchmark-sized contract), and after the bucket join only
    * the row whose `tbl` is the SMALLEST colliding table survives —
    * each colliding pair has exactly one such row, so emission is
    * exactly-once per pair with zero state. Scale shape: one
    * row-local lshTables projection + explode(tables) per train
    * vector, broadcast probe, no shuffle of stream rows, no state
    * store; `slice_start` is a row-local day floor for bookkeeping,
    * not a window.
    */
  def semanticDecontamStream(stream: DataFrame, tsCol: String,
                             test: DataFrame, threshold: Double = 0.5,
                             tables: Int = 16, planesPerTable: Int = 6,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             dim: Int = 64): DataFrame = {
    import graft.operators.Similarity
    val tbs = Similarity.lshTables(col(vecCol), tables,
      planesPerTable, dim)
    val testB = test
      .select(col(idCol).as("test_id"), col(vecCol).as("_v2"),
        tbs.as("_tbs2"))
      .select(col("test_id"), col("_v2"), col("_tbs2"),
        explode(col("_tbs2")).as("_tb"))
      .select(col("test_id"), col("_v2"), col("_tbs2"),
        col("_tb.tbl").as("tbl"), col("_tb.bucket").as("bucket"))
    stream
      .select(
        date_format(date_trunc("DAY", col(tsCol)),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        col(idCol).as("train_id"), col(vecCol).as("_v1"),
        tbs.as("_tbs1"))
      .select(col("slice_start"), col("train_id"), col("_v1"),
        col("_tbs1"), explode(col("_tbs1")).as("_tb"))
      .select(col("slice_start"), col("train_id"), col("_v1"),
        col("_tbs1"),
        col("_tb.tbl").as("tbl"), col("_tb.bucket").as("bucket"))
      .join(broadcast(testB), Seq("tbl", "bucket"))
      // exactly-once per colliding pair WITHOUT a stateful distinct:
      // keep the row at the smallest table index where the pair
      // collides — a row-local decision over the two bucket arrays
      .filter(col("tbl") ===
        array_min(zip_with(col("_tbs1"), col("_tbs2"), (a, b) =>
          when(a.getField("bucket") === b.getField("bucket"),
            a.getField("tbl")))))
      .withColumn("score", Similarity.cosine(col("_v1"), col("_v2")))
      .filter(col("score") >= threshold)
      .select(col("slice_start"), col("train_id"), col("test_id"),
        col("score"))
  }

  def freqSketchStream(stream: DataFrame, tsCol: String, key: String,
                       cap: Int, windowDur: String = "1 day",
                       watermarkDur: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.functions.FreqSketch.misraGries(col(key), cap).as("mg"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"),
        col("mg.n").as("n"), col("mg.keys").as("keys"))

  /** The flatten projection of the `_doc` struct column (reuses the
    * Profiler's schema walk through a one-field wrapper).
    */
  private def flattenedLeaves(withTs: DataFrame) = {
    val docType = withTs.schema("_doc").dataType
    Profiler.leafRowsFor("_doc", col("_doc"), docType)
  }

  /** Cumulative drift monitor for `foreachBatch`: keeps the merged
    * (path → type histogram) state on the driver (tiny — path count ×
    * tag count) and reports per batch: new paths, vanished paths
    * (present in the previous batch, absent now), and new type tags on
    * existing paths — the operational "schema drift" signal.
    *
    * The retained drift LOG is a ring buffer capped at `maxDrifts`
    * (r14 verdict item 5: the unbounded `allDrifts` accumulator would
    * leak driver memory on a month-long stream with churning schemas
    * — each batch's drifts are still RETURNED in full to the caller;
    * only the convenience history is bounded). [[totalDrifts]] keeps
    * the exact lifetime count regardless of eviction, so "how many"
    * never degrades even when "which" has rolled off.
    */
  final class DriftMonitor(maxDrifts: Int = 10000) extends Serializable {
    private val state = mutable.Map.empty[String, mutable.Map[String, Long]]
    private val drifts = mutable.ArrayDeque.empty[String]
    private var driftCount = 0L
    private var lastBatchPaths: Set[String] = Set.empty

    def processBatch(batch: DataFrame): Seq[String] = {
      val hist = Profiler.typeHistogram(batch).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val batchDrifts = mutable.ArrayBuffer.empty[String]
      hist.foreach { case (path, tag, cnt) =>
        state.get(path) match {
          case None =>
            batchDrifts += s"new path: $path ($tag)"
            state.update(path, mutable.Map(tag -> cnt))
          case Some(tags) =>
            if (!tags.contains(tag) && tag != "null")
              batchDrifts += s"new type on $path: $tag"
            tags.update(tag, tags.getOrElse(tag, 0L) + cnt)
        }
      }
      val batchPaths = hist.map(_._1).toSet
      (lastBatchPaths -- batchPaths).toSeq.sorted.foreach(p =>
        batchDrifts += s"vanished path: $p")
      lastBatchPaths = batchPaths
      drifts ++= batchDrifts
      driftCount += batchDrifts.size
      while (drifts.size > maxDrifts) drifts.removeHead()
      batchDrifts.toSeq
    }

    /** The most recent ≤ maxDrifts drift lines (ring-buffered). */
    def allDrifts: Seq[String] = drifts.toSeq

    /** Exact lifetime drift count — unaffected by ring eviction. */
    def totalDrifts: Long = driftCount
    def knownPaths: Set[String] = state.keySet.toSet
    def typeCounts(path: String): Map[String, Long] =
      state.get(path).map(_.toMap).getOrElse(Map.empty)
  }
}
