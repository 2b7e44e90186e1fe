package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profiler, Relational}
import graft.sources.Tables

/** Physical-plan assertions (the "would this survive 100×" checks):
  * predicate pushdown reaches the parquet scan, projection pruning
  * limits ReadSchema, small dimensions broadcast, top-k avoids full
  * sorts, and the hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q6: filters pushed to the parquet scan") {
    val p = planOf(Relational.q6(spark, dir))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("IsNotNull(l_shipdate)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
  }

  test("q1: column pruning — scan reads only the 7 needed columns") {
    val p = planOf(Relational.q1(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_orderkey"))   // not referenced by q1
    assert(!readSchema.contains("l_partkey"))
  }

  test("q5: dimension joins broadcast, no shuffle of small sides") {
    val p = planOf(Relational.q5(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1: aggregation inside whole-stage codegen") {
    val df = Relational.q1(spark, dir)
    df.collect()   // AQE assigns codegen stages at execution
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n)" markers in the final plan tree
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, p)
    assert(p.contains("HashAggregate"))
  }

  test("profiler flatten: single scan of the source") {
    val p = planOf(Profiler.profileStats(Tables.load(spark, dir, "orders")))
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 parquet scan, plan had $scans")
  }

  test("json profileStats: single scan (doc total from the same pass)") {
    val p = planOf(graft.operators.JsonProfiler.profileStats(
      Tables.load(spark, dir, "events"), "props"))
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 parquet scan, plan had $scans")
  }

  test("q3: top-10 plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf(Relational.q3(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("decontaminate: test-split n-gram set broadcasts — the corpus " +
      "side never shuffles") {
    val p = planOf(graft.operators.Dedup.decontaminate(
      Tables.load(spark, dir, "documents")))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("asofJoin: one hash exchange for the merge window, no range " +
      "join explosion") {
    // drop the final orderBy so only the operator's own exchanges count
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val pur = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value").as("p_value"))
    val p = planOf(Relational.asofJoin(clicks, pur, Seq("user_id"), "ts",
      "event_id", Seq("p_value")))
    // formatted mode puts "(n) Exchange" and its hashpartitioning
    // arguments on separate lines — count operator headers
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan had $exchanges\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("repetitionProfile: exactly the two doc-keyed exchanges, " +
      "single scan") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.TextAnalysis.repetitionProfile(docs))
    // (doc,bigram) groupBy + per-doc groupBy + the left-join back +
    // final sort: every exchange is keyed by doc_id or tiny; no
    // all-pairs or global-window shape may appear
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <=2 parquet scans, had $scans")
  }

  test("redactPii: row-local — zero exchanges beyond the output sort") {
    val docs = Tables.load(spark, dir, "documents")
    // the operator body is select-only: a single projection over the
    // scan; the orderBy is the only sort/exchange source
    val p = planOf(graft.operators.TextAnalysis.redactPii(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange\n$p")
  }

  test("packSequences: one shard-keyed window exchange + output sort") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Sampling.packSequences(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2, s"expected shard window + orderBy, got $exchanges\n$p")
    assert(p.contains("Window"))
  }

  test("sourceOverlap: fingerprint join sides reduce to distinct " +
      "(src, fp) scalars before the join") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Dedup.sourceOverlap(docs))
    // the join must consume 16-byte fp + src pairs, never text
    val joinLine = p.linesIterator.find(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
      l.contains("BroadcastHashJoin"))
    assert(joinLine.isDefined, p)
    assert(!p.contains("CartesianProduct"))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema"))
    assert(readSchema.forall(l => l.contains("source") && l.contains("text")))
  }

  test("curation funnel: quality gate prunes before any exchange, " +
      "decontamination broadcasts, no cartesian") {
    val p = planOf(graft.operators.Curation.curate(
      Tables.load(spark, dir, "documents"),
      rates = Map("src0" -> 1000), defaultPermille = 100))
    assert(p.contains("BroadcastHashJoin"))   // n-gram + bad-id sides
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the row-local gate must sit under any shuffle: formatted mode
    // numbers operators from the scan upward, so the smallest Filter
    // id must be below the smallest Exchange id
    def ids(op: String): Seq[Int] =
      s"\\((\\d+)\\) $op".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val filterIds = ids("Filter")
    val exchangeIds = ids("Exchange")
    assert(filterIds.nonEmpty, p.take(2000))
    assert(exchangeIds.isEmpty || filterIds.min < exchangeIds.min,
      s"gate not below the first shuffle: filters=$filterIds " +
        s"exchanges=$exchangeIds")
  }

  test("partitioned staging: partition-column filter prunes at plan " +
      "time (PartitionFilters, not data filters)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part")
    val out = tmp.toString + "/events"
    graft.operators.Export.writePartitioned(
      Tables.load(spark, dir, "events")
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("event_type")),
      out, "event_type")
    val q = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val p = planOf(q)
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no PartitionFilters in plan\n$p"))
    assert(pf.contains("event_type"), pf)
    // the partition predicate must NOT appear as a post-scan Filter
    // over the data — pruning happens before I/O
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"), p)
  }

  test("decontaminateBloom: prefilter is a row-local Filter under the " +
      "broadcast verify join — the corpus never sort-merge joins") {
    val docs = Tables.load(spark, dir, "documents")
    val isTest = org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("doc_id").cast("string")),
      1, 1).isin("0", "1")
    val p = planOf(graft.operators.Dedup.decontaminateBloomAgainst(
      docs.filter(!isTest), docs.filter(isTest)))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // the bloom membership test compiles to a Filter on the train side
    // (below the first Exchange: prune before anything shuffles)
    def ids(op: String): Seq[Int] =
      s"\\((\\d+)\\) $op".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val filterIds = ids("Filter")
    val exchangeIds = ids("Exchange")
    assert(filterIds.nonEmpty)
    assert(exchangeIds.isEmpty || filterIds.min < exchangeIds.min,
      s"bloom prefilter not below the first shuffle\n$p")
  }

  test("lineDedup: banned-line removal is a broadcast anti-join; no " +
      "cartesian, no global window") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Dedup.lineDedup(
      SparkEntry.linedFixture(docs)))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("classifierScore: row-local token fold — zero exchanges beyond " +
      "the output sort") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.TextAnalysis.classifierScore(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange\n$p")
  }

  test("capPerStratum: per-stratum top-k pushes a WindowGroupLimit " +
      "(partial top-k before the stratum shuffle)") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Curation.capPerStratum(docs))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("gopherRules: row-local rule battery — zero exchanges beyond " +
      "the output sort") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.TextAnalysis.gopherRules(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange\n$p")
  }

  test("shuffleOrder: shard-partitioned rank + broadcast offsets — " +
      "the ranking window is NEVER a single global partition") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Sampling.shuffleOrder(docs))
    assert(p.contains("BroadcastHashJoin"))
    // the corpus-sized window must be keyed by shard: a global-order
    // Window would show an empty partition spec on the big side
    val hashParts = "hashpartitioning\\(shard".r.findAllIn(p).size
    assert(hashParts >= 1, s"no shard-keyed exchange\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("embeddingOutliers: centroid table broadcasts; corpus rows " +
      "never shuffle for scoring") {
    val emb = Tables.load(spark, dir, "embeddings")
    val p = planOf(graft.operators.Similarity.embeddingOutliers(emb))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // only the (label, pos) centroid aggregation and the final sort
    // may exchange — scoring itself is a projection
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 4, s"too many exchanges ($exchanges)\n$p")
  }

  test("curateModern: both text gates fuse into row-local Filters, " +
      "decontamination broadcasts, no cartesian anywhere") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Curation.curateModern(
      SparkEntry.linedFixture(docs)))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the gopher ∧ classifier gate is one Filter node (Catalyst fuses
    // conjunctive row-local predicates), not a chain of projections
    val filters = "\\(\\d+\\) Filter".r.findAllIn(p).size
    assert(filters >= 1)
  }

  test("q4: correlated EXISTS plans as a semi join (orders never " +
      "duplicated by matching lineitems)") {
    val p = planOf(Relational.q4(spark, dir))
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q18: the HAVING aggregate reduces lineitem BELOW the join") {
    val p = planOf(Relational.q18(spark, dir))
    def ids(op: String): Seq[Int] =
      s"\\((\\d+)\\) $op".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    // formatted mode numbers from the scan up: the quantity aggregate
    // must carry a smaller id than any join it feeds
    val aggIds = ids("HashAggregate")
    val joinIds = ids("BroadcastHashJoin") ++ ids("SortMergeJoin") ++
      ids("ShuffledHashJoin")
    assert(aggIds.nonEmpty && joinIds.nonEmpty)
    assert(aggIds.min < joinIds.max, s"agg not below join\n$p")
  }

  test("q19: OR-of-ANDs across join sides keeps the hash join (the " +
      "common key conjunct is extracted, no nested loop)") {
    val p = planOf(Relational.q19(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("vocabulary: global top-N plans as TakeOrderedAndProject — " +
      "never a single-partition global window over the vocab table") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.TextAnalysis.vocabulary(docs))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("chunkDocuments: row-local chunking — zero exchanges beyond " +
      "the output sort") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.TextAnalysis.chunkDocuments(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange\n$p")
  }

  test("kmeans: centroids are literals — assignment plans with no " +
      "join anywhere") {
    val emb = Tables.load(spark, dir, "embeddings")
    val p = planOf(graft.operators.Similarity.kmeans(emb, k = 4,
      iters = 2))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("histogram: the range table broadcasts — no sort-merge join " +
      "of the value rows") {
    val li = Tables.load(spark, dir, "lineitem")
    val p = planOf(Profiler.histogram(li))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("skewReport: top-N is TakeOrderedAndProject, not a global sort") {
    val ev = Tables.load(spark, dir, "events")
    val p = planOf(Relational.skewReport(ev, Seq("user_id")))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q13: the ON-clause filter keeps the join LEFT OUTER — " +
      "order-less customers survive into the 0 bucket") {
    val df = Relational.q13(spark, dir)
    val p = planOf(df)
    assert(p.contains("LeftOuter"), p.take(2000))
    // the zero bucket exists at this SF (some customers never order
    // below priority 1-URGENT... i.e. have only urgent orders or none)
    val counts = df.collect().map(r => r.getLong(0)).toSet
    assert(counts.nonEmpty)
  }

  test("q21: EXISTS and NOT EXISTS plan as semi and anti self-joins") {
    val p = planOf(Relational.q21(spark, dir))
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q2: correlated scalar min decorrelates to equi-joins — " +
      "dims broadcast, no nested-loop, no cartesian") {
    val p = planOf(Relational.q2(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q9: LIKE filter pushes to the part scan as StartsWith and " +
      "the dims broadcast") {
    val p = planOf(Relational.q9(spark, dir))
    assert(p.contains("StringStartsWith(p_name,red)"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q11: group HAVING vs global scalar — the total is a 1-row " +
      "broadcast, not a shuffled join") {
    val p = planOf(Relational.q11(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q11: the 1.5x-average threshold is non-vacuous — the filter " +
      "passes some parts and rejects others at every scale") {
    val rows = Relational.q11(spark, dir).collect()
    assert(rows.nonEmpty, "q11 returned 0 rows — the threshold went vacuous")
    val nparts = Tables.load(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.length < nparts,
      s"q11 passed all $nparts parts — the threshold filters nothing")
  }

  test("q16: NOT IN plans as LEFT ANTI and the distinct count " +
      "expands, no cartesian") {
    val p = planOf(Relational.q16(spark, dir))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q20: nested correlated IN plans as LEFT SEMI into supplier, " +
      "no nested-loop") {
    val p = planOf(Relational.q20(spark, dir))
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("dsirAffinity: the target profile rides a broadcast hash " +
      "join, never a shuffled one") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Curation.dsirAffinity(docs,
      docs.filter(org.apache.spark.sql.functions.col("source") === "src0")))
    // the bucket-keyed profile join must broadcast; the one
    // SortMergeJoin allowed is the doc-keyed LEFT OUTER gap fill
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin Inner"), p.take(2000))
  }

  test("frameSample: pure projection — no exchange anywhere in the " +
      "plan before the output sort") {
    val docs = Tables.load(spark, dir, "documents")
    val df = graft.operators.Multimodal.frameSample(
      graft.operators.Multimodal.testPayload(docs), "payload")
    // the operator body must be shuffle-free: the ONLY exchange in
    // the whole plan is the presentation orderBy's range partitioning
    val p = planOf(df)
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert("Exchange rangepartitioning".r.findAllMatchIn(p).length <= 1,
      p.take(2000))
  }

  test("trained PQ: the advertised plan upgrade — encoding is " +
      "row-local argmin over literals, so the ONLY window is the " +
      "final per-query rank (the sampled variant needs a codebook " +
      "rank window on top)") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    def windows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    val trained = windows(
      graft.operators.Similarity.pqTopKTrained(e, q, k = 5))
    assert(trained.length == 1, s"expected only the per-query rank " +
      s"window, got ${trained.length}")
    assert(trained.head.partitionSpec.nonEmpty,
      "the surviving window must be query-partitioned, not global")
    assert(windows(graft.operators.Similarity.pqTopK(e, q, k = 5))
      .length > 1, "fixture: the sampled variant should carry the " +
      "extra codebook-rank window the trained one eliminates")
  }

  test("sq8TopK: encode + reconstruct are row-local — the only " +
      "window is the per-query rank, scoring is codegen'd, and the " +
      "corpus side never sorts") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val df = graft.operators.Similarity.sq8TopK(e, q, k = 5)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length == 1 && windows.head.partitionSpec.nonEmpty,
      "expected exactly the query-partitioned rank window")
    val p = planOf(df)
    assert(p.toLowerCase.contains("sqdistlong") ||
      p.toLowerCase.contains("sq_dist_long"),
      "scoring must use the codegen'd integer distance")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not sort for the broadcast scoring join")
  }

  test("ivfSq8TopK: the scoring join is list-keyed and broadcast — " +
      "no corpus sort-merge, codegen'd integer distance, and the " +
      "coarse/range metadata stays broadcast-shaped") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val df = graft.operators.Similarity.ivfSq8TopK(e, q, k = 5)
    val p = planOf(df)
    assert(p.toLowerCase.contains("sqdistlong") ||
      p.toLowerCase.contains("sq_dist_long"),
      "scoring must use the codegen'd integer distance")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not sort for the scoring join")
    assert(p.contains("BroadcastHashJoin"),
      "probes must broadcast to the coded corpus")
  }

  test("ivfSq8TopKServed: the read-back scan carries a ccid " +
      "partition filter — unprobed lists are physically unread") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val ixDir = java.nio.file.Files
      .createTempDirectory("ivfsq8_plan").toString
    val df = graft.operators.Similarity.ivfSq8TopKServed(e, q, ixDir,
      k = 5)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("ivfsq8_plan")) => s
    }
    assert(scans.nonEmpty, "expected a scan over the persisted index")
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "ccid"))),
      s"index scan must prune on ccid: ${scans.head.metadata}")
  }

  test("fuzzyPairs: blocking is an EQUI-join (no nested-loop, no " +
      "cartesian) and the block census joins back without a " +
      "sort-merge of the corpus") {
    val docs = Tables.load(spark, dir, "documents")
    val p = planOf(graft.operators.Dedup.fuzzyPairs(docs))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("scd2History: both window passes share one user-keyed sort — " +
      "no global window, exchanges bounded") {
    val ev = Tables.load(spark, dir, "events")
    val df = Relational.scd2History(ev, Seq("user_id"), "event_type")
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty &&
      windows.forall(_.partitionSpec.nonEmpty),
      "every window must be user-partitioned")
    val exchanges = df.queryExecution.sparkPlan.collect {
      case x: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec => x
    }
    // one user-keyed shuffle for the windows + the output range sort
    assert(exchanges.length <= 2,
      s"expected <= 2 exchanges, got ${exchanges.length}")
  }

  test("rangeJoinBinned: the interval join is an equi-join — no " +
      "nested-loop, no cartesian") {
    val ev = Tables.load(spark, dir, "events")
    val spans = ev
      .filter(org.apache.spark.sql.functions.col("event_type") =!= "error")
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.min("ts").as("s"),
        org.apache.spark.sql.functions.max("ts").as("e"))
    val p = planOf(Relational.rangeJoinBinned(ev, spans,
      Seq("user_id"), "ts", "s", "e"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("bucketed staging: co-bucketed join plans with NO exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed")
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_quantity"))
    graft.operators.Export.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "k"), "b_orders",
      s"$tmp/o", "k", 8)
    graft.operators.Export.writeBucketed(
      li.withColumnRenamed("l_orderkey", "k"), "b_lineitem",
      s"$tmp/l", "k", 8)
    try {
      // disable broadcast so the join must co-locate — the bucketed
      // layout should satisfy it without any shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
      val p = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
      assert(exchanges == 0, s"expected 0 exchanges, plan had $exchanges\n$p")
      assert(p.contains("SortMergeJoin"))
      assert(j.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("heavyHitters verify pass: candidates broadcast-hash-join the " +
      "corpus (the vocabulary never shuffles), MG runs as an " +
      "object-hash aggregate") {
    import org.apache.spark.sql.functions._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(graft.operators.TextAnalysis
        .tokens(col("text"))).as("term"))
    val p = planOf(graft.operators.Sketches
      .heavyHitters(toks, "term", k = 50))
    assert(p.contains("BroadcastHashJoin"))
    // the MG summary is a TypedImperativeAggregate => object hash agg
    assert(p.contains("ObjectHashAggregate"))
    // no sort-merge join anywhere: the only key-wide exchange is the
    // post-filter candidate count, bounded by k*slack rows
    assert(!p.contains("SortMergeJoin"))
  }
}
