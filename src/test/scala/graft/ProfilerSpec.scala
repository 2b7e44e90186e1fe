package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiler

/** Profiler behavior ported from the reference's analyser tests
  * (`tests/core/test_analyser.py:192-293`): presence/missing/cardinality
  * /type-distribution/top-values semantics, and the flat→hierarchical
  * pivot table including numeric path segments.
  */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** 3 docs like the reference's sample-path test: field appears in 2 of
    * 3 docs (one null, one value, one missing→null in columnar form),
    * mixed values for top-k.
    */
  lazy val df = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("score", IntegerType),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(
        StructField("city", StringType))))))
    val rows = Seq(
      Row("A", Integer.valueOf(1), Seq("x", "y"), Row("Oslo")),
      Row("A", Integer.valueOf(3), Seq("x"), Row(null)),
      Row("B", null, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
  }

  test("profileStats: presence, missing %, cardinality") {
    val stats = Profiler.profileStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("name").getLong(1) == 3)          // n_present
    assert(stats("name").getDouble(2) == 0.0)      // missing_pct
    assert(stats("name").getLong(3) == 2)          // cardinality: A, B
    assert(stats("score").getLong(1) == 2)
    assert(stats("score").getDouble(2) == 100.0 / 3)  // 1/3 missing
    assert(stats("score").getDouble(4) == 1.0)     // num_min
    assert(stats("score").getDouble(5) == 3.0)     // num_max
    // whole-array cardinality counts distinct arrays, not elements
    // (core/analyser.py:142,188)
    assert(stats("tags").getLong(3) == 2)          // ["x","y"], ["x"]
    assert(stats("tags[]").getLong(1) == 3)        // elements: x,y,x
    assert(stats("tags[]").getLong(3) == 2)        // distinct: x,y
    assert(stats("tags[]").isNullAt(2))            // missing% undefined
    // struct recursed into, not tagged (core/analyser.py:70-71)
    assert(stats.contains("nested.city") && !stats.contains("nested"))
    assert(stats("nested.city").getLong(1) == 1)
  }

  test("typeHistogram distinguishes nulls per path") {
    val hist = Profiler.typeHistogram(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hist(("name", "str")) == 3)
    assert(hist(("score", "int32")) == 2)
    assert(hist(("score", "null")) == 1)
    assert(hist(("tags", "array<str>")) == 2)
    assert(hist(("tags", "null")) == 1)
    assert(hist(("tags[]", "str")) == 3)
  }

  test("topK: count desc then value asc; strings only") {
    val tk = Profiler.topK(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val names = tk.filter(_._1 == "name")
    assert(names.toSeq == Seq(("name", "A", 2L, 1L), ("name", "B", 1L, 2L)))
    // no numeric path in top-k (core/analyser.py:202-204)
    assert(!tk.exists(_._1 == "score"))
  }

  test("flatSchema: most-frequent tag, deterministic") {
    val fs = Profiler.flatSchema(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fs("name") == "str")
    assert(fs("score") == "int32")   // nulls excluded from the vote
    assert(fs("tags") == "array<str>")
    assert(fs("nested.city") == "str")
  }

  test("corrStats: hand-checked integer sufficient statistics with " +
      "pairwise-complete NULL handling; corrPpm matches the closed " +
      "form, +1 on a perfect line, NULL on a constant column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val t = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 2L, 7L), (2L, 4L, 7L), (3L, 6L, 7L),
      (4L, null, 7L))            // y NULL: drops from (x,y) only
      .toDF("x", "y", "k")
    val stats = Profiler.corrStats(t, Seq("k", "x", "y")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // (x, y): 3 complete rows; Σx=6 Σy=12 Σxy=28 Σx²=14 Σy²=56
    assert(stats(("x", "y")) == ((3L, 6L, 12L, 28L, 14L, 56L)))
    // (k, x): all 4 rows, k constant 7
    assert(stats(("k", "x")) == ((4L, 28L, 10L, 70L, 196L, 30L)))
    val corr = Profiler.corrPpm(
        Profiler.corrStats(t, Seq("k", "x", "y"))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(corr(("x", "y")) == Some(1.0))     // y = 2x exactly
    assert(corr(("k", "x")).isEmpty)          // zero variance → NULL
  }

  test("schemaDiff: identical snapshots are all-kept; a mutated one " +
      "reports added/removed/type_changed with both tags carried") {
    val same = Profiler.schemaDiff(df, df).collect()
    assert(same.nonEmpty && same.forall(_.getString(1) == "kept"))
    import org.apache.spark.sql.functions.{col => c, lit => l}
    val mutated = df.drop("tags")
      .withColumn("score", c("score").cast("string"))
      .withColumn("extra", l(1L))
    val got = Profiler.schemaDiff(df, mutated).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
      .toMap
    assert(got("tags") == (("removed", Some("array<str>"), None)))
    assert(got("extra") == (("added", None, Some("int64"))))
    assert(got("score") == (("type_changed", Some("int32"), Some("str"))))
    assert(got("name") == (("kept", Some("str"), Some("str"))))
  }

  // flat→hierarchical pivot cases from tests/core/test_analyser.py:258-293
  val pivotCases: Seq[(Seq[(String, String)], String)] = Seq(
    (Seq("a" -> "int32"),
      """{"a": {"type": "int32"}}"""),
    (Seq("a.b" -> "str", "a.c" -> "int64"),
      """{"a": {"b": {"type": "str"}, "c": {"type": "int64"}}}"""),
    // numeric path segments stay plain keys ("items.0.id")
    (Seq("items.0.id" -> "str"),
      """{"items": {"0": {"id": {"type": "str"}}}}"""),
    (Seq.empty, "{}"),
  )

  pivotCases.zipWithIndex.foreach { case ((flat, expected), i) =>
    test(s"hierarchicalSchema case $i") {
      assert(Profiler.hierarchicalSchema(flat) == expected)
    }
  }

  test("profileStats (fast default) ≡ built-in-aggregate plan, row for row") {
    val events = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    for (input <- Seq(df, events)) {
      val fast = Profiler.profileStats(input).collect().toSeq
      val builtin = Profiler.profileStatsBuiltin(input).collect().toSeq
      assert(fast == builtin)
    }
  }

  test("beyond exactLimit the cardinality degrades to an HLL estimate " +
      "within 5% of exact; below it, bit-equal (sf0.1 lineitem)") {
    // l_extendedprice/l_orderkey exceed 100k distincts at sf0.1 — the
    // declared profile oracles are exact only in the sf0.01 gate
    // domain; this pins the documented estimate contract beyond it
    val li = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.1", "lineitem")
    def cards(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val fast = cards(Profiler.profileStats(li))
    val exact = cards(Profiler.profileStatsBuiltin(li))
    assert(fast.keySet == exact.keySet)
    fast.foreach { case (path, est) =>
      val ex = exact(path)
      if (ex <= 100000L)
        assert(est == ex, s"$path below the cap must be exact")
      else
        assert(math.abs(est - ex) <= ex * 0.05,
          s"$path HLL estimate $est vs exact $ex out of tolerance")
    }
    assert(exact.values.exists(_ > 100000L),
      "fixture no longer exercises the HLL regime")
  }

  test("profileFull: one-pass result agrees with the multi-agg path") {
    val events = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    val full = Profiler.profileFull(events).collect()
      .map(r => r.getString(0) -> r).toMap
    val slow = Profiler.profileStatsBuiltin(events).collect()
      .map(r => r.getString(0) -> r).toMap
    slow.keys.foreach { p =>
      assert(full(p).getLong(1) == slow(p).getLong(1))          // present
      assert(full(p).getLong(3) == slow(p).getLong(3))          // card
      assert(full(p).getString(7) == slow(p).getString(6))      // ts_min
    }
    assert(!full("event_id").getBoolean(4))                     // exact
    // MG top-k is exact when distinct strings ≤ cap: event_type has 5
    val tk = Profiler.topK(events).collect()
      .filter(_.getString(0) == "event_type")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val fullTk = full("event_type").getString(10)
    tk.foreach { case (v, c) => assert(fullTk.contains(s""""$v":$c""")) }
  }

  test("array<struct>: element dict rows plus per-field sub-paths") {
    val schema = StructType(Seq(
      StructField("items", ArrayType(StructType(Seq(
        StructField("id", IntegerType),
        StructField("label", StringType)))))))
    val rows = Seq(
      Row(Seq(Row(Integer.valueOf(1), "a"), Row(Integer.valueOf(2), "b"))),
      Row(Seq(Row(Integer.valueOf(3), null))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val stats = Profiler.profileStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("items").getLong(1) == 2)        // whole arrays
    assert(stats("items[]").getLong(1) == 3)      // dict elements
    assert(stats("items[].id").getLong(1) == 3)
    assert(stats("items[].id").getDouble(4) == 1.0)   // num_min
    assert(stats("items[].id").getDouble(5) == 3.0)   // num_max
    assert(stats("items[].label").getLong(1) == 2)    // one null
    assert(stats("items[].label").isNullAt(2))        // missing% null
  }

  test("profile invariants (merge-friendly bounds)") {
    val stats = Profiler.profileStats(df).collect()
    stats.foreach { r =>
      val present = r.getLong(1)
      if (!r.isNullAt(2))
        assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 100.0)
      assert(r.getLong(3) <= present)   // cardinality ≤ presence
      if (!r.isNullAt(4) && !r.isNullAt(5))
        assert(r.getDouble(4) <= r.getDouble(5))
    }
  }

  test("histogram: equi-width binning, max lands in the last bucket, " +
      "constant columns degenerate to bucket 0") {
    import spark.implicits._
    val data = (0 until 10).map(i => (i.toDouble, 7.0))
      .toDF("spread", "flat")
    val h = graft.operators.Profiler.histogram(data, buckets = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // spread 0..9, width 1.8: buckets get 2 values each; 9.0 clamps
    // into bucket 4
    (0 until 5).foreach { b =>
      assert(h(("spread", b.toLong)) == ((2L, 0.0, 9.0)))
    }
    assert(h(("flat", 0L)) == ((10L, 7.0, 7.0)))
    assert(h.size == 6)
  }

  test("sketches: union-of-slice-sketches answers like a sketch of " +
      "the union, and is exact at gate cardinalities") {
    import spark.implicits._
    import graft.operators.Sketches
    // 600 rows, 200 distinct keys spread over 3 slices with overlap
    val rows = (0 until 600).map(i => (s"slice${i % 3}", s"k${i % 200}"))
      .toDF("slice", "key")
    val sk = Sketches.sketchTable(rows, Seq("slice"), "key")
    assert(sk.count() == 3)
    val merged = Sketches.rollup(sk, Seq.empty).head
    // sparse-mode HLL is exact at this cardinality: the merged
    // estimate equals the true distinct count, and row counts merge
    // exactly (they're sums)
    assert(merged.getLong(0) == 200L)
    assert(merged.getLong(1) == 600L)
    // per-slice rollup = estimating the original sketches
    val perSlice = Sketches.rollup(sk, Seq("slice")).collect()
    assert(perSlice.map(_.getLong(1)).sameElements(Array(200L, 200L, 200L)))
  }

  test("bin sketches: merging per-slice sketches answers quantiles " +
      "like one sketch of the union — the merge law, all integers") {
    import spark.implicits._
    import graft.operators.Sketches
    // values 0..599 spread across 3 slices; range [0, 600), 60 bins
    val rows = (0 until 600).map(i => (s"s${i % 3}", i.toDouble))
      .toDF("slice", "v")
    val sliced = Sketches.binSketch(rows, Seq("slice"), "v",
      bins = 60, lo = 0.0, hi = 600.0)
    assert(sliced.count() == 3)
    // one-table sketch of the union, rolled up globally, vs the
    // merged per-slice sketches — identical rows (exact integers)
    import org.apache.spark.sql.functions.lit
    val whole = Sketches.binSketch(rows.withColumn("g", lit("all")),
      Seq("g"), "v", bins = 60, lo = 0.0, hi = 600.0)
    val qs = Seq(0.1, 0.5, 0.9)
    val fromSlices = Sketches
      .quantileRollup(sliced.withColumn("g", lit("all")), Seq("g"), qs,
        bins = 60, lo = 0.0, hi = 600.0)
      .collect().map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    val fromWhole = Sketches
      .quantileRollup(whole, Seq("g"), qs, bins = 60, lo = 0.0,
        hi = 600.0)
      .collect().map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(fromSlices == fromWhole)
    // uniform data: rank = floor(q·599 + 0.5) is the value itself and
    // its bin is value/10 -> ranks 60/300/539 -> bins 6/30/53; median
    // est = bin-30 midpoint 305
    assert(fromSlices.map(t => (t._1, t._2)) ==
      Seq((0.1, 6L), (0.5, 30L), (0.9, 53L)))
    assert(fromSlices.find(_._1 == 0.5).get._3 == 305.0)
  }

  test("ksReport: hand-computed binned-CDF max gap, lowest-bin " +
      "tie-break, zero for identical frames") {
    import spark.implicits._
    import graft.operators.Sketches
    // a = {0, 10}, b = {0, 30}; 4 bins over [0, 40) → w = 10
    // cumA = [1,2,2,2], cumB = [1,1,1,2]; |cumA·2 − cumB·2| =
    // [0,2,2,0] → max 2 first at bin 1; ppm = 2·1e6/(2·2) = 500000
    val a = Seq(0.0, 10.0).toDF("v")
    val b = Seq(0.0, 30.0).toDF("v")
    val got = Sketches.ksReport(a, b, "v", bins = 4, lo = 0.0,
        hi = 40.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((2L, 2L, 1L, 2L, 500000L)))
    // identical frames: every gap 0, argmax tie resolves to bin 0
    val same = Sketches.ksReport(a, a, "v", bins = 4, lo = 0.0,
        hi = 40.0)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(same == Seq((0L, 0L, 0L)))
    // NULL targets are excluded from bins AND totals on both sides
    val withNull = Seq(Some(0.0), Some(10.0), None).toDF("v")
    val gotNull = Sketches.ksReport(withNull, b, "v", bins = 4,
        lo = 0.0, hi = 40.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSeq
    assert(gotNull == Seq((2L, 2L, 2L)))
  }

  test("ksReportBy: each stratum's CDF against the merged global — " +
      "hand-computed gaps; a uniform stratum scores lower than a " +
      "shifted one") {
    import spark.implicits._
    import graft.operators.Sketches
    // g1 = {0, 10}, g2 = {30, 30}; global = {0, 10, 30, 30}
    // 4 bins over [0, 40): cum_g1 = [1,2,2,2], cum_g2 = [0,0,0,2],
    // cum_all = [1,2,2,4]; n_g = 2, n_all = 4
    // g1 gaps |cum_g1·4 − cum_all·2| = [2,4,4,0] → max 4 at bin 1
    // g2 gaps |cum_g2·4 − cum_all·2| = [2,4,4,0] → max 4 at bin 1
    val rows = Seq(("g1", 0.0), ("g1", 10.0), ("g2", 30.0),
      ("g2", 30.0)).toDF("g", "v")
    val got = Sketches.ksReportBy(rows, "g", "v", bins = 4, lo = 0.0,
        hi = 40.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("g1", 2L, 4L, 1L, 4L, 500000L),
      ("g2", 2L, 4L, 1L, 4L, 500000L)))
    // a stratum matching the global CDF scores 0
    val bal = Seq(("a", 0.0), ("a", 30.0), ("b", 0.0), ("b", 30.0))
      .toDF("g", "v")
    val balGot = Sketches.ksReportBy(bal, "g", "v", bins = 4,
        lo = 0.0, hi = 40.0)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(balGot == Seq(("a", 0L, 0L), ("b", 0L, 0L)))
  }

  test("ksReportStaged: sliced sketches merge to the direct ksReport " +
      "answer; a mismatched binning contract fails loudly") {
    import spark.implicits._
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val a = Seq(("s1", 0.0), ("s1", 10.0), ("s2", 30.0), ("s2", 5.0))
      .toDF("slice", "v")
    val b = Seq(0.0, 30.0, 35.0).toDF("v")
    val direct = Sketches.ksReport(a, b, "v", bins = 4, lo = 0.0,
        hi = 40.0).collect().toSeq.map(_.toSeq)
    val staged = Sketches.binSketch(a, Seq("slice"), "v", bins = 4,
      lo = 0.0, hi = 40.0)
    val viaStage = Sketches.ksReportStaged(staged, b, "v", bins = 4,
        lo = 0.0, hi = 40.0).collect().toSeq.map(_.toSeq)
    assert(viaStage == direct && direct.nonEmpty)
    val err = intercept[Exception] {
      Sketches.ksReportStaged(staged, b, "v", bins = 4, lo = 0.0,
        hi = 400.0).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${msgs(t.getCause)}"
    assert(msgs(err).contains("bin sketch contract mismatch"))
    // no-data parity: ZERO staged slices (a stream whose windows never
    // closed) emits one n_a=0 audit row, the same shape ksReport
    // produces over an empty side A — not a silent empty frame
    val emptyStaged = staged.filter(lit(false))
    val noData = Sketches.ksReportStaged(emptyStaged, b, "v", bins = 4,
        lo = 0.0, hi = 40.0).collect()
    val emptyA = Sketches.ksReport(a.filter(lit(false)), b, "v",
        bins = 4, lo = 0.0, hi = 40.0).collect()
    assert(noData.length == 1 && noData.head.getLong(0) == 0L)
    assert(noData.map(_.toSeq).toSeq == emptyA.map(_.toSeq).toSeq)
  }

  test("quantileRollup: an all-zero group surfaces as NULL-est rows " +
      "(n_rows 0), not a silent drop; a sketch carrying a different " +
      "binning contract fails loudly") {
    import spark.implicits._
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    // group "b" contributes an all-zero bin_counts row — exactly what
    // binSketchStream emits for a window whose events all carried NULL
    // targets (batch binSketch itself drops NULL-only groups at the
    // pre-filter, so the zero row is built the streaming way)
    val rows = Seq(("a", 5.0), ("a", 15.0)).toDF("g", "v")
    val zeroRow = Seq("b").toDF("g")
      .withColumn("bin_counts",
        array_repeat(lit(0L), 4))
      .withColumn("bins", lit(4)).withColumn("lo", lit(0.0))
      .withColumn("hi", lit(40.0))
    val sk = Sketches.binSketch(rows, Seq("g"), "v",
        bins = 4, lo = 0.0, hi = 40.0)
      .unionByName(zeroRow)
    val got = Sketches.quantileRollup(sk, Seq("g"), Seq(0.5),
        bins = 4, lo = 0.0, hi = 40.0)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(4))).toSeq
    assert(got == Seq(("a", Some(1L), 2L), ("b", None, 0L)))
    // same bin COUNT, different value domain -> plausible-but-wrong
    // estimates if merged silently; the carried (lo, hi) contract
    // makes it throw instead
    val err = intercept[Exception] {
      Sketches.quantileRollup(sk, Seq("g"), Seq(0.5),
        bins = 4, lo = 0.0, hi = 400.0).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${msgs(t.getCause)}"
    assert(msgs(err).contains("bin sketch contract mismatch"))
  }
}
