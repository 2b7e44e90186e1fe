package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Sampling, TextAnalysis}
import graft.sources.Tables

/** Semantics pins for the round-6 curation operators: Bloom-prefiltered
  * decontamination, line-level boilerplate removal, token-budget
  * mixture fill, the hashed-features classifier gate, and the
  * per-stratum cap.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("decontaminateBloomAgainst: bit-identical to the exact operator") {
    val docs = Tables.load(spark, dir, "documents")
    val isTest = substring(md5($"doc_id".cast("string")), 1, 1)
      .isin("0", "1")
    val exact = Dedup
      .decontaminateAgainst(docs.filter(!isTest), docs.filter(isTest))
      .collect().toSeq
    val bloom = Dedup
      .decontaminateBloomAgainst(docs.filter(!isTest), docs.filter(isTest))
      .collect().toSeq
    assert(exact == bloom)
  }

  test("decontaminateBloomAgainst: a deliberately saturated Bloom " +
      "(false positives everywhere) still yields the exact result") {
    // 2 bits/key + 1 probe ≈ most probes collide: the prefilter lets
    // junk through and the exact verify join must remove ALL of it
    val docs = Tables.load(spark, dir, "documents")
    val isTest = substring(md5($"doc_id".cast("string")), 1, 1)
      .isin("0", "1")
    val exact = Dedup
      .decontaminateAgainst(docs.filter(!isTest), docs.filter(isTest))
      .collect().toSeq
    val bloom = Dedup
      .decontaminateBloomAgainst(docs.filter(!isTest),
        docs.filter(isTest), bitsPerKey = 2, numProbes = 1)
      .collect().toSeq
    assert(exact == bloom)
  }

  test("lineDedup: boilerplate dropped, blanks kept, within-doc " +
      "repetition untouched, all-banned doc goes empty") {
    val docs = Seq(
      (1L, "hdr\nbody one\nftr"),
      (2L, "hdr\nbody two\nftr"),
      (3L, "hdr\n\nbody three\nftr"), // blank line always survives
      (4L, "hdr\nftr"),               // nothing but boilerplate
      (5L, "rep\nrep")                // same doc twice: NOT boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 1)
    assert(out(1L).getString(3) == "body one")
    assert(out(2L).getString(3) == "body two")
    assert(out(3L).getLong(1) == 4 && out(3L).getLong(2) == 2)
    assert(out(3L).getString(3) == "\nbody three")
    assert(out(4L).getLong(2) == 0 && out(4L).getString(3) == "")
    assert(out(5L).getLong(2) == 2 && out(5L).getString(3) == "rep\nrep")
  }

  test("lineDedup: maxDocs raises the bar — a line must exceed the " +
      "cap in DISTINCT docs to be banned") {
    val docs = Seq(
      (1L, "twice\na"), (2L, "twice\nb"),
      (3L, "thrice\nc"), (4L, "thrice\nd"), (5L, "thrice\ne")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, maxDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "twice\na")  // 2 docs ≤ cap: kept
    assert(out(3L) == "c")         // 3 docs > cap: banned
  }

  test("tokenBudgetSample: fills each stratum's budget in md5 order, " +
      "boundary doc included, zero budget takes nothing") {
    val docs = (1L to 40L).map { i =>
      val stratum = if (i <= 20) "a" else if (i <= 30) "b" else "z"
      (i, stratum, Seq.fill(5)("tok").mkString(" ")) // 5 tokens each
    }.toDF("doc_id", "stratum", "text")
    val budgets = Map("a" -> 12L, "b" -> 0L)
    val out = Sampling
      .tokenBudgetSample(docs, "stratum", budgets = budgets,
        defaultBudget = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // naive model: per stratum, ids in (md5(id), id) order, cumulative
    // 5-token docs kept while start < budget
    def expect(ids: Seq[Long], budget: Long): Seq[Long] = {
      val ordered = ids.sortBy(i => (md5hex(i.toString), i))
      ordered.zipWithIndex.takeWhile { case (_, k) => k * 5L < budget }
        .map(_._1)
    }
    val gotA = out.filter(_._2 == "a").map(_._1).toSeq.sorted
    assert(gotA == expect(1L to 20L, 12L).sorted) // 12/5 → 3 docs
    assert(gotA.size == 3)
    assert(!out.exists(_._2 == "b"))              // zero budget
    val gotZ = out.filter(_._2 == "z").map(_._1).toSeq.sorted
    assert(gotZ == expect(31L to 40L, 5L).sorted) // default budget
    assert(gotZ.size == 1)
    // start_tok is the exact resume offset: multiples of 5 here
    assert(out.forall(_._3 % 5 == 0))
  }

  test("classifierScore: matches a naive md5 pseudo-weight recompute, " +
      "bounded to [-1e6, 1e6]") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "one"),
      (3L, "x y z w v u t s"),
      (4L, "")                       // zero tokens: filtered out
    ).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    def weight(t: String): Long =
      java.lang.Long.parseLong(md5hex("w:" + t).take(8), 16) % 2000001L
    def score(toks: Seq[String]): Long = {
      val w = toks.map(weight).sum
      val n = toks.size.toLong
      (2 * w + n) / (2 * n) - 1000000L
    }
    assert(out(1L).getLong(2) == score(Seq("alpha", "beta", "gamma")))
    assert(out(2L).getLong(2) == score(Seq("one")))
    assert(out(3L).getLong(2) ==
      score(Seq("x", "y", "z", "w", "v", "u", "t", "s")))
    assert(out.values.forall(r =>
      r.getLong(2) >= -1000000L && r.getLong(2) <= 1000000L))
    assert(out.values.forall(r =>
      r.getBoolean(3) == (r.getLong(2) >= 0L)))
  }

  test("round-6 operators: an empty corpus flows through every op " +
      "without exceptions (incl. the zero-key Bloom build)") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(Dedup.lineDedup(empty).count() == 0)
    assert(Dedup.decontaminateBloomAgainst(empty, empty).count() == 0)
    assert(TextAnalysis.gopherRules(empty).count() == 0)
    assert(TextAnalysis.classifierScore(empty).count() == 0)
    assert(TextAnalysis.chunkDocuments(empty).count() == 0)
    assert(TextAnalysis.vocabulary(empty).count() == 0)
    assert(Sampling.shuffleOrder(empty).count() == 0)
    assert(Sampling.tokenBudgetSample(empty, "source",
      budgets = Map("a" -> 10L)).count() == 0)
    assert(Curation.capPerStratum(empty).count() == 0)
    assert(Curation.curateModern(empty).count() == 0)
  }

  test("this session's operators: empty inputs flow through without " +
      "exceptions") {
    import java.sql.Timestamp
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    val emptyEvents = Seq
      .empty[(Long, Long, Timestamp, String, Double, String)]
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val emptyVecs = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val R = graft.operators.Relational
    assert(graft.operators.Dedup.repeatedSpans(emptyDocs).count() == 0)
    // funnel on an empty stream still reports every step, at zero
    val f = R.funnel(emptyEvents, Seq("view", "click")).collect()
    assert(f.length == 2 && f.forall(_.getLong(2) == 0L))
    assert(R.cohortRetention(emptyEvents).count() == 0)
    assert(R.upsertLatest(emptyEvents,
      Seq("user_id", "event_type")).count() == 0)
    assert(R.skewReport(emptyEvents, Seq("user_id")).count() == 0)
    assert(R.rfm(emptyEvents).count() == 0)
    val iv = Seq.empty[(Long, Timestamp, Timestamp)]
      .toDF("user_id", "s", "e")
    assert(R.rangeJoinBinned(emptyEvents, iv, Seq("user_id"),
      "ts", "s", "e").count() == 0)
    assert(graft.operators.Profiler.histogram(
      Seq.empty[Tuple1[Double]].toDF("x")).count() == 0)
    assert(Curation.keepTopQuantile(emptyDocs).count() == 0)
    assert(graft.operators.Similarity.kmeans(emptyVecs).count() == 0)
    assert(Curation.semdedup(emptyVecs).count() == 0)
    assert(graft.operators.Similarity.ivfTopKTrained(emptyVecs,
      emptyVecs).count() == 0)
    assert(graft.operators.Similarity
      .centroidSimilarity(emptyVecs).count() == 0)
    val sk = graft.operators.Sketches.sketchTable(emptyEvents,
      Seq("event_type"), "user_id")
    assert(sk.count() == 0)
    assert(graft.operators.Sketches.rollup(sk,
      Seq("event_type")).count() == 0)
  }

  test("round-8 operators: empty inputs (and empty TARGETS) flow " +
      "through without exceptions") {
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    val someDocs = Seq((1L, "s", "a b c")).toDF("doc_id", "source", "text")
    val emptyVecs = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val S = graft.operators.Similarity
    // DSIR: empty raw, empty target (zero-gram profile), both empty
    assert(Curation.dsirAffinity(emptyDocs, someDocs).count() == 0)
    val vsEmptyTarget = Curation.dsirAffinity(someDocs, emptyDocs)
      .collect()
    assert(vsEmptyTarget.length == 1 &&
      vsEmptyTarget.head.getLong(2) == 0L)
    assert(Curation.dsirProfileArray(emptyDocs).forall(_ == 0L))
    // PQ family: empty corpus and/or empty query side
    assert(S.pqTopK(emptyVecs, emptyVecs, dim = 16).count() == 0)
    assert(S.pqTopKTrained(emptyVecs, emptyVecs, dim = 16).count() == 0)
    assert(S.ivfPqTopK(emptyVecs, emptyVecs, dim = 16).count() == 0)
    // contamination report: empty train leaves every test row at zero
    val rep = graft.operators.Dedup
      .contaminationReport(emptyDocs, someDocs).collect()
    assert(rep.length == 1 && rep.head.getLong(2) == 0L)
    assert(graft.operators.Dedup
      .contaminationReport(someDocs, emptyDocs).count() == 0)
    // quantile staging: empty sketches roll up to nothing
    val bs = graft.operators.Sketches.binSketch(emptyDocs,
      Seq("source"), "doc_id", bins = 8, lo = 0.0, hi = 8.0)
    assert(bs.count() == 0)
    assert(graft.operators.Sketches.quantileRollup(bs, Seq("source"),
      Seq(0.5), bins = 8, lo = 0.0, hi = 8.0).count() == 0)
    // frame sampling: empty table and empty payload
    assert(graft.operators.Multimodal.frameSample(
      Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload"),
      "payload").count() == 0)
    val zero = graft.operators.Multimodal.frameSample(
      Seq((1L, Array.empty[Byte])).toDF("doc_id", "payload"), "payload")
      .collect()
    assert(zero.length == 4 && zero.forall(_.getLong(3) == 0L))
  }

  test("gopherRules: each rule fails on its own counterexample") {
    // 52 words, mean length 25/4 = 6.25 ∈ [3,10], 26 stopword hits
    val fiftyGood = ("the and bigwords longerwords " * 13).trim
    val docs = Seq(
      (1L, fiftyGood),                                // all rules pass
      (2L, "the of too short"),                       // words_ok fails
      (3L, ("the of " + Seq.fill(48)("xx").mkString(" "))), // mean len 2
      (4L, ("the of " + Seq.fill(48)("####").mkString(" "))), // symbols
      (5L, ("the of " + Seq.fill(48)("1234").mkString(" "))), // alpha
      (6L, Seq.fill(50)("zz").mkString(" "))          // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(out(1L)._6, out(1L).toString)              // pass
    assert(!out(2L)._1 && !out(2L)._6)                // words_ok
    assert(!out(3L)._2 && !out(3L)._6)                // mean_len_ok
    assert(!out(4L)._3 && !out(4L)._6)                // symbol_ok
    assert(!out(5L)._4 && !out(5L)._6)                // alpha_ok
    assert(!out(6L)._5 && !out(6L)._6)                // stop_ok
  }

  test("shuffleOrder: a permutation of 0..n-1 equal to the naive " +
      "global rank, invariant to input partitioning") {
    val docs = (1L to 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Sampling.shuffleOrder(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.toSeq.sorted == (0L until 300L).toList)
    val naive = (1L to 300L)
      .sortBy(i => (md5hex("42:" + i), i)).zipWithIndex
      .map { case (id, k) => id -> k.toLong }.toMap
    assert(out == naive)
    val repart = Sampling.shuffleOrder(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(repart == naive)
  }

  test("curriculumOrder: a permutation of 0..n-1, stages weakly " +
      "increase along the position, best-quality tier leads, and " +
      "within a tier the order is the seeded md5 shuffle") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val out = graft.operators.Curation.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val n = docs.count()
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq)
    // walking positions in order, the stage never decreases (the
    // curriculum property) and position 0 sits in the best tier seen
    val byPos = out.sortBy(_._3)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a._2 <= b._2 })
    assert(byPos.head._2 == byPos.map(_._2).min)
    // within each stage, order == rank under (md5("42:"+id), id)
    byPos.groupBy(_._2).foreach { case (_, rows) =>
      val ids = rows.sortBy(_._3).map(_._1).toSeq
      assert(ids == ids.sortBy(i => (md5hex("42:" + i), i)))
    }
  }

  test("labelCentroids: exact integer means, any reduction order") {
    val vecs = Seq(
      (1L, 0, Array(0.25f, -0.5f)),
      (2L, 0, Array(0.35f, -0.1f)),
      (3L, 1, Array(-1.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    def centroids(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.labelCentroids(df).collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    val c = centroids(vecs)
    // label 0: means of (250000, 350000) and (-500000, -100000),
    // half-up toward +inf
    assert(c(0) == List(300000L, -300000L))
    assert(c(1) == List(-1000000L, 1000000L))
    assert(centroids(vecs.repartition(5)) == c)
  }

  test("embeddingOutliers: a vector AT its centroid scores 1e6 ppm; " +
      "an opposed one is flagged") {
    val vecs = Seq(
      (1L, 0, Array(0.5f, 0.5f)),   // lone vector = its own centroid
      (2L, 1, Array(1.0f, 0.0f)),
      (3L, 1, Array(1.0f, 0.02f)),
      (4L, 1, Array(-1.0f, -0.01f)) // anti-aligned with label-1 mean
    ).toDF("vec_id", "label", "embedding")
    val out = graft.operators.Similarity.embeddingOutliers(vecs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 1000000L && !out(1L).getBoolean(3))
    assert(out(2L).getLong(2) > 500000L && !out(2L).getBoolean(3))
    assert(out(4L).getLong(2) < 0L && out(4L).getBoolean(3))
  }

  test("debounce: first event of each burst survives, suppression " +
      "counts per burst, gap boundary is strict") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: burst of 3, then a 6-min gap (> 5-min debounce) opens
      // a new burst
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 1.0, "{}"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click", 1.0, "{}"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "view", 1.0, "{}"),
      (4L, 1L, ts("2024-01-01 10:08:00"), "click", 1.0, "{}"),
      // user 2: exactly 5 minutes apart — NOT > gap, same burst
      (5L, 2L, ts("2024-01-01 10:00:00"), "view", 1.0, "{}"),
      (6L, 2L, ts("2024-01-01 10:05:00"), "view", 1.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = graft.operators.Relational.debounce(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Set(1L, 4L, 5L))
    assert(out(1L) == ((1L, 2L)))   // burst 1, two suppressed
    assert(out(4L) == ((2L, 0L)))   // burst 2, alone
    assert(out(5L) == ((1L, 1L)))   // 5-min twin suppressed
  }

  test("resample: quiet periods materialize as zero rows on the " +
      "corpus-wide grid") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: hours 10 and 12 — hour 11 is a GAP
      (1L, 1L, ts("2024-01-01 10:15:00"), "view", 2.0, "{}"),
      (2L, 1L, ts("2024-01-01 10:45:00"), "view", 3.0, "{}"),
      (3L, 1L, ts("2024-01-01 12:30:00"), "view", 1.0, "{}"),
      // user 2: only hour 12 — hours 10-11 must zero-fill anyway
      (4L, 2L, ts("2024-01-01 12:00:00"), "view", 5.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = graft.operators.Relational
      .resample(events, intervalMinutes = 60).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 6)   // 2 users x 3 buckets
    assert(out((1L, "2024-01-01 10:00:00")) == ((2L, 5.0)))
    assert(out((1L, "2024-01-01 11:00:00")) == ((0L, 0.0)))
    assert(out((1L, "2024-01-01 12:00:00")) == ((1L, 1.0)))
    assert(out((2L, "2024-01-01 10:00:00")) == ((0L, 0.0)))
    assert(out((2L, "2024-01-01 12:00:00")) == ((1L, 5.0)))
  }

  test("rangeJoinBinned: inclusive boundaries, multi-bin intervals, " +
      "key isolation, exactly-once pairs") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),   // == interval start
      (2L, 1L, ts("2024-01-01 12:30:00")),   // inside, 3rd bin
      (3L, 1L, ts("2024-01-01 13:00:00")),   // == interval end
      (4L, 1L, ts("2024-01-01 13:00:01")),   // just outside
      (5L, 2L, ts("2024-01-01 12:00:00"))    // other user, no interval
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      // spans bins 10,11,12,13 at 60-min bins
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00"), "w1")
    ).toDF("user_id", "s", "e", "tag")
    val out = graft.operators.Relational
      .rangeJoinBinned(events, intervals, Seq("user_id"),
        "ts", "s", "e")
      .select("event_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq((1L, "w1"), (2L, "w1"), (3L, "w1")))
  }

  test("rfm: recency from corpus max day, decimal-exact monetary, " +
      "quintile-threshold scores — ties score equally") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val events = Seq(
      (1L, 1L, ts("2024-01-01"), "purchase", 10.10, "{}"),
      (2L, 1L, ts("2024-01-05"), "purchase", 0.20, "{}"),
      (3L, 2L, ts("2024-01-03"), "purchase", 99.99, "{}"),
      (4L, 3L, ts("2024-01-02"), "purchase", 5.00, "{}"),
      (5L, 3L, ts("2024-01-02"), "view", 1000.0, "{}")   // not counted
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = graft.operators.Relational.rfm(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // corpus max purchase day = 01-05 (user 1). Interpolated quintile
    // thresholds over recency [0,2,3], frequency [2,1,1] and
    // monetary [10.30, 99.99, 5.00]; scores count thresholds beaten,
    // so the tied frequency 1 users score identically (3)
    assert(out(1L) == ((0L, 2L, 10.30, 1L, 1L, 3L)))
    assert(out(2L) == ((2L, 1L, 99.99, 3L, 3L, 1L)))
    assert(out(3L) == ((3L, 1L, 5.00, 5L, 3L, 5L)))
  }

  test("upsertLatest: latest per key by (ts, tie), aggregate plan — " +
      "no window, no sort of versions") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val changes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a", 1.0, "v1"),
      (2L, 10L, ts("2024-01-01 11:00:00"), "a", 2.0, "v2"),   // latest
      (3L, 10L, ts("2024-01-01 11:00:00"), "b", 3.0, "x"),    // other key
      // same ts as event 5: higher event_id wins the tie
      (4L, 20L, ts("2024-01-01 09:00:00"), "a", 4.0, "old"),
      (5L, 20L, ts("2024-01-01 09:00:00"), "a", 5.0, "tie")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val up = graft.operators.Relational.upsertLatest(changes,
      Seq("user_id", "event_type"))
    val got = up.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> (r.getLong(3), r.getString(5)))
      .toMap
    assert(got == Map((10L, "a") -> ((2L, "v2")),
      (10L, "b") -> ((3L, "x")), (20L, "a") -> ((5L, "tie"))))
    val plan = up.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "upsert must not plan a window")
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"))
  }

  test("temperedShares: α=0.5 targets from integer-micro square " +
      "roots — exact hand values; flattens the head, lifts the tail") {
    val docs = Seq.fill(1)(("a", (1 to 9).map(_ => "w").mkString(" "))) ++
      Seq.fill(1)(("b", (1 to 16).map(_ => "w").mkString(" ")))
    val got = Curation.temperedShares(docs.toDF("source", "text"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // tokens 9 and 16: s6 = 3e6, 4e6; targets 3/7 and 4/7 of 1e6
    assert(got == Seq(("a", 9L, 360000L, 428571L),
      ("b", 16L, 640000L, 571428L)))
    // the tempering property: the big source's target share sits
    // below its corpus share, the small one's above
    assert(got(1)._4 < got(1)._3 && got(0)._4 > got(0)._3)
  }

  test("joinSizeReport: the forecast equals the real inner-join " +
      "cardinality, counts and overlap hand-checked, hottest key " +
      "deterministic") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")       // nl: 1→3, 2→1, 3→1
    val r = Seq(1L, 1L, 2L, 2L, 2L, 9L).toDF("k")   // nr: 1→2, 2→3, 9→1
    val got = graft.operators.Relational.joinSizeReport(l, r, Seq("k"))
      .collect().map(row => (row.getLong(0), row.getLong(1),
        row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
        row.getString(6), row.getLong(7))).toSeq
    // overlap {1, 2}: contrib 3·2=6 and 1·3=3 → 9 rows; top key "1"
    assert(got == Seq((5L, 6L, 3L, 3L, 2L, 9L, "1", 6L)))
    val actual = l.join(r, Seq("k")).count()
    assert(actual == got.head._6)
    // contribution tie (both keys 2 rows): top key breaks to the
    // lexicographically LARGER key string
    val tie = graft.operators.Relational.joinSizeReport(
        Seq(4L, 5L).toDF("k"), Seq(4L, 4L, 5L, 5L).toDF("k"), Seq("k"))
      .collect().head
    assert(tie.getString(6) == "5" && tie.getLong(7) == 2L)
    // DISJOINT key sets: still one forecast row — join_rows and
    // top_key_rows coalesce to 0, top_key is NULL (the engine/oracle
    // agreement on the empty-overlap shape)
    val disjoint = graft.operators.Relational.joinSizeReport(
        Seq(1L, 2L).toDF("k"), Seq(8L, 9L).toDF("k"), Seq("k"))
      .collect()
    assert(disjoint.length == 1)
    val dr = disjoint.head
    assert(dr.getLong(4) == 0L && dr.getLong(5) == 0L &&
      dr.isNullAt(6) && dr.getLong(7) == 0L)
  }

  test("scd2History: consecutive duplicates collapse into runs with " +
      "chained validity intervals; a NULL first value still opens a " +
      "run; the open run is current") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val changes = Seq(
      // user 10: a, a (dup), b, a — three runs
      (1L, 10L, ts("2024-01-01 10:00:00"), Some("a")),
      (2L, 10L, ts("2024-01-01 11:00:00"), Some("a")),
      (3L, 10L, ts("2024-01-01 12:00:00"), Some("b")),
      (4L, 10L, ts("2024-01-01 13:00:00"), Some("a")),
      // user 20: NULL, NULL (dup), c — the rn-guard case
      (5L, 20L, ts("2024-01-01 09:00:00"), None),
      (6L, 20L, ts("2024-01-01 09:30:00"), None),
      (7L, 20L, ts("2024-01-01 10:00:00"), Some("c"))
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.operators.Relational
      .scd2History(changes, Seq("user_id"), "event_type")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("∅"), r.getString(2),
        Option(r.getString(3)).getOrElse("open"), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      (10L, "a", "2024-01-01 10:00:00.000000",
        "2024-01-01 12:00:00.000000", false),
      (10L, "b", "2024-01-01 12:00:00.000000",
        "2024-01-01 13:00:00.000000", false),
      (10L, "a", "2024-01-01 13:00:00.000000", "open", true),
      (20L, "∅", "2024-01-01 09:00:00.000000",
        "2024-01-01 10:00:00.000000", false),
      (20L, "c", "2024-01-01 10:00:00.000000", "open", true)))
  }

  test("skewReport: counts, half-up ppm share, ceil salt factor, " +
      "deterministic ties") {
    val rows = (Seq.fill(5)("hot") ++ Seq.fill(3)("warm") ++
      Seq("cold1", "cold2")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val rep = graft.operators.Relational.skewReport(rows, Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
    // total 10 rows, 4 keys, mean load 2.5
    assert(rep.head == ("hot" -> ((5L, 500000L, 2L))))
    assert(rep(1) == ("warm" -> ((3L, 300000L, 2L))))
    // 1-row keys tie: lexicographic key order breaks it
    assert(rep(2)._1 == "cold1" && rep(3)._1 == "cold2")
    assert(rep(2)._2 == ((1L, 100000L, 1L)))
  }

  test("funnel: in-order completion only, strict ordering, exact " +
      "integer lag sums") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1 completes view -> click -> purchase in order
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0, "{}"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click", 1.0, "{}"),
      (3L, 1L, ts("2024-01-01 10:03:00"), "purchase", 1.0, "{}"),
      // user 2: click BEFORE the first view doesn't count; no click
      // after the view, so the funnel stops at step 0
      (4L, 2L, ts("2024-01-01 09:00:00"), "click", 1.0, "{}"),
      (5L, 2L, ts("2024-01-01 09:30:00"), "view", 1.0, "{}"),
      // user 3: view then click, never purchases
      (6L, 3L, ts("2024-01-01 08:00:00"), "view", 1.0, "{}"),
      (7L, 3L, ts("2024-01-01 08:05:00"), "click", 1.0, "{}"),
      // user 4: purchases without ever viewing — not in the funnel
      (8L, 4L, ts("2024-01-01 07:00:00"), "purchase", 1.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = graft.operators.Relational
      .funnel(events, Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out("view") == ((3L, None)))
    // users 1 (60 s) and 3 (300 s) clicked after viewing
    assert(out("click") == ((2L, Some(360000000L))))
    // only user 1 purchased after clicking (120 s)
    assert(out("purchase") == ((1L, Some(120000000L))))
  }

  test("cohortRetention: week offsets are exact day arithmetic from " +
      "each user's first event") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val events = Seq(
      // user 1: first event Tue 2024-01-02 (cohort week Mon 01-01),
      // active again 8 days later (offset 1) twice
      (1L, 1L, ts("2024-01-02"), "view", 1.0, "{}"),
      (2L, 1L, ts("2024-01-10"), "view", 1.0, "{}"),
      (3L, 1L, ts("2024-01-10"), "click", 1.0, "{}"),
      // user 2: first event Thu 2024-01-11 (cohort week Mon 01-08),
      // active 6 days later — still offset 0 (day arithmetic, not
      // calendar-week crossing: 01-17 IS in the next calendar week)
      (4L, 2L, ts("2024-01-11"), "view", 1.0, "{}"),
      (5L, 2L, ts("2024-01-17"), "view", 1.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = graft.operators.Relational.cohortRetention(events)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> ((1L, 1L)),
      ("2024-01-01", 1L) -> ((1L, 2L)),
      ("2024-01-08", 0L) -> ((1L, 2L))))
  }

  test("lmScore: matches a naive bigram conditional-probability " +
      "recompute; bigram-free docs get null") {
    val docs = Seq(
      (1L, "a b a b"),     // bigrams: "a b"×2, "b a"×1
      (2L, "a b c"),       // "a b", "b c"
      (3L, "solo"),        // no bigrams → null score
      (4L, "c a")          // "c a"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    // corpus: c2("a b")=3, c2("b a")=1, c2("b c")=1, c2("c a")=1
    // prefix counts: c1(a·)=3, c1(b·)=2, c1(c·)=1
    def ppm(c2: Long, c1: Long) = (2000000L * c2 + c1) / (2 * c1)
    val pAB = ppm(3, 3); val pBA = ppm(1, 2)
    val pBC = ppm(1, 2); val pCA = ppm(1, 1)
    def mean(ws: Seq[Long]) = {
      val w = ws.sum; val n = ws.size.toLong; (2 * w + n) / (2 * n)
    }
    assert(out(3L) == ((0L, None)))
    assert(out(1L) == ((3L, Some(mean(Seq(pAB, pAB, pBA))))))
    assert(out(2L) == ((2L, Some(mean(Seq(pAB, pBC))))))
    assert(out(4L) == ((1L, Some(pCA))))
  }

  test("chunkDocuments: stride/overlap offsets are exact and the " +
      "chunks reconstruct the token stream") {
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")),  // 80 tokens
      (2L, "a b c"),                                    // single chunk
      (3L, "")                                          // no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .chunkDocuments(docs, chunkTokens = 32, overlap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(!out.exists(_._1 == 3L))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._5 == "a b c" && d2.head._4 == 3L)
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts at multiples of 24; ends clipped at 80; overlap of 8
    assert(d1.map(_._3).toSeq == Seq(0L, 24L, 48L, 72L))
    assert(d1.map(_._4).toSeq == Seq(32L, 56L, 80L, 80L))
    // stitching non-overlapping spans rebuilds the original stream
    val toks = (1 to 80).map(i => s"t$i")
    d1.foreach { case (_, _, s, e, text) =>
      assert(text == toks.slice(s.toInt, e.toInt).mkString(" "))
    }
  }

  test("vocabulary: tf/df from the corpus, deterministic rank ties, " +
      "minDf prunes, topN cuts") {
    val docs = Seq(
      (1L, "apple apple pear"),
      (2L, "apple pear plum"),
      (3L, "plum quince")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(docs, topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // apple tf=3; pear/plum tie at tf=2 → lexicographic; quince cut
    assert(out.map(_._1).toSeq == Seq("apple", "pear", "plum"))
    assert(out.map(_._2).toSeq == Seq(3L, 2L, 2L))
    assert(out.map(_._3).toSeq == Seq(2L, 2L, 2L))
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L))
    val pruned = TextAnalysis.vocabulary(docs, minDf = 2).collect()
    assert(!pruned.map(_.getString(0)).contains("quince"))
  }

  test("capPerStratum: at most maxDocs per stratum, contiguous ranks, " +
      "quality-monotone within each stratum") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Curation.capPerStratum(docs, maxDocs = 3).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 3))
    bySrc.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toList)
      // rank order implies non-increasing q6
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(a, b) => a._3 >= b._3
        case _         => true
      })
    }
    // the cap is a pure filter over the full ranking
    val full = Curation
      .capPerStratum(docs, maxDocs = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = full.filter(_._4 <= 3).sortBy(_._1).toSeq
    val got = Curation.capPerStratum(docs, maxDocs = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected)
  }

  test("dsirAffinity: target look-alikes outrank aliens, zero-gram " +
      "docs score zero, single-gram doc equals its bucket frequency") {
    // target: two 3-token docs -> four bigrams total, "a b" twice
    val target = Seq((100L, "a b c"), (101L, "a b d")).toDF("doc_id", "text")
    // raw: a target clone, an alien, a single-gram doc, a gram-less doc
    val raw = Seq(
      (1L, "a b c"),            // pure target material
      (2L, "zz qq ww ee rr"),   // alien vocabulary
      (3L, "a b"),              // exactly one gram, target-frequent
      (4L, "solo")              // 1 token -> zero grams
    ).toDF("doc_id", "text")
    val got = Curation.dsirAffinity(raw, target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // zero-gram doc: defined as 0/0 -> (0, 0)
    assert(got(4L) == (0L, 0L))
    // the single-gram doc's affinity IS the target ppm of "a b":
    // 2 occurrences of 4 target grams -> floor(2e6/4) = 500000
    assert(got(3L) == (1L, 500000L))
    // clone of target text scores the mean of its grams' target ppm:
    // "a b"=500000, "b c"=250000 -> round-half-up mean 375000
    assert(got(1L) == (2L, 375000L))
    // alien grams hit empty buckets (no collision at this tiny scale)
    assert(got(2L) == (4L, 0L))
    // ordering property the selection step relies on
    assert(got(1L)._2 > got(2L)._2)
  }

  test("dsirSelect: per-stratum budgets fill highest-affinity first, " +
      "ties break on doc_id, zero-budget strata select nothing") {
    val target = Seq((100L, "a b c"), (101L, "a b d")).toDF("doc_id", "text")
    // stratum s1: clone (375000 ppm, 3 tokens), then the half-target
    // doc (500000 ppm, 2 tokens) outranks it; s2 is budget-zero
    val raw = Seq(
      (1L, "s1", "a b c"),           // 3 tokens, affinity 375000
      (2L, "s1", "zz qq ww ee rr"),  // 5 tokens, affinity 0
      (3L, "s1", "a b"),             // 2 tokens, affinity 500000
      (4L, "s2", "a b c")            // budget-zero stratum
    ).toDF("doc_id", "source", "text")
    val got = Curation.dsirSelect(raw, target,
        budgets = Map("s1" -> 5L, "s2" -> 0L))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // fill order in s1: doc 3 (500000) at 0, doc 1 (375000) starts at
    // 2 < 5 so it enters, doc 2 (0) would start at 5 — excluded
    assert(got.keySet == Set(1L, 3L))
    assert(got(3L) == (("s1", 500000L, 2L, 0L)))
    assert(got(1L) == (("s1", 375000L, 3L, 2L)))
    // widening the budget by one token admits the zero-affinity doc
    val wide = Curation.dsirSelect(raw, target,
        budgets = Map("s1" -> 6L, "s2" -> 0L))
      .collect().map(_.getLong(0)).toSet
    assert(wide == Set(1L, 2L, 3L))
  }

  test("mixtureWeights: hand-computed up/down-sampling weights " +
      "and the default target") {
    // srcA 6 of 10 tokens (over target → downsample), srcB 2/10
    // (under → upsample), srcC picks up the default target
    val docs = Seq(
      (1L, "srcA", "a b c"), (2L, "srcA", "d e f"),
      (3L, "srcB", "a b"), (4L, "srcC", "c d")
    ).toDF("doc_id", "source", "text")
    val got = Curation.mixtureWeights(docs,
        Map("srcA" -> 200000L, "srcB" -> 700000L),
        defaultTargetPpm = 100000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      // weight = ⌊target · total / tokens⌋; expected = ⌊tokens·w/1e6⌋
      ("srcA", 2L, 6L, 600000L, 200000L, 333333L, 1L),
      ("srcB", 1L, 2L, 200000L, 700000L, 3500000L, 7L),
      ("srcC", 1L, 2L, 200000L, 100000L, 500000L, 1L)))
  }

  test("mixtureApply: repeat-epoch copies and md5-coin drops, " +
      "hand-computed") {
    // same fixture as the weights spec: srcA w=333333 (coin-only),
    // srcB w=3500000 (3 full copies + coin at f=500000), srcC w=500000
    val docs = Seq(
      (1L, "srcA", "a b c"), (2L, "srcA", "d e f"),
      (3L, "srcB", "a b"), (4L, "srcC", "c d")
    ).toDF("doc_id", "source", "text")
    // first-5-hex-digit md5 grains: doc1 c4ca4=806052, doc2
    // c81e7=819687, doc3 eccbc=969916, doc4 a87ff=690175; coin keeps
    // iff h·1e6 < f·2²⁰ → f=333333 needs h<349525-ish (both srcA docs
    // drop), f=500000 needs h<524288e6/1e6 (docs 3 and 4 both miss)
    val got = Curation.mixtureApply(docs,
        Map("srcA" -> 200000L, "srcB" -> 700000L),
        defaultTargetPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (3L, "srcB", 3500000L, 1L),
      (3L, "srcB", 3500000L, 2L),
      (3L, "srcB", 3500000L, 3L)))
  }

  test("paddingReport: bucket edges, max-bucket truncation, waste ppm") {
    val docs = Seq(
      (1L, "a b c"),                                  // 3 → bucket 4
      (2L, "a b c d e"),                              // 5 → bucket 8
      (3L, (1 to 8).map(_ => "w").mkString(" ")),     // 8 → bucket 8
      (4L, (1 to 20).map(_ => "w").mkString(" "))     // 20 → truncated
    ).toDF("doc_id", "text")
    val got = Curation.paddingReport(docs, buckets = Seq(4L, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      // bucket 4: one 3-token doc → 1 pad of 4 capacity = 250000 ppm
      (4L, 1L, 3L, 1L, 250000L),
      // bucket 8: kept 5+8+8 = 21 of 24 capacity → 3 pads = 125000 ppm
      (8L, 3L, 21L, 3L, 125000L)))
  }

  test("madOutlierReport: hand-computed median/MAD gate in doubled " +
      "units — even and odd counts, a constant stratum, and the " +
      "cross-multiplied no-division predicate") {
    val rows = Seq(
      ("a", 10L), ("a", 12L), ("a", 14L), ("a", 100L), // even n: med 13
      ("b", 5L), ("b", 5L), ("b", 5L),                 // constant: MAD 0
      ("c", 1L), ("c", 2L), ("c", 9L))                 // odd n: med 2
      .toDF("source", "n_chars")
    val got = Curation.madOutlierReport(rows)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      // a: med2 = 26, dev2 = [6,2,2,174], mad4 = 2*(2+6)/2 = 8;
      //    outlier iff 2*dev2 > 24 → only 174 → 1/4 = 250000 ppm
      ("a", 4L, 26L, 8L, 1L, 250000L),
      // b: constant stratum — MAD 0, strict > keeps zero deviations in
      ("b", 3L, 10L, 0L, 0L, 0L),
      // c: med2 = 4, dev2 = [2,0,14], mad4 = 4; 2*dev2 > 12 → 14 only
      ("c", 3L, 4L, 4L, 1L, 333333L)))
  }
}
