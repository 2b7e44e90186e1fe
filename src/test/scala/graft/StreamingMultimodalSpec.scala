package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChatContext, Multimodal}
import graft.streaming.ProfileStream

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("windowedProfile: streaming plan over file source produces " +
      "per-window per-path stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir.toString + "/in")
    val schema = spark.read.parquet(dir.toString + "/in").schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString + "/in")
    val prof = ProfileStream.windowedProfile(stream, "ts", "1 day", "1 day")
    assert(prof.isStreaming)
    val q = prof.writeStream.outputMode("complete")
      .format("memory").queryName("profout").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("select * from profout").collect()
      assert(out.nonEmpty)
      val paths = out.map(_.getString(1)).toSet
      assert(paths.contains("event_type") && paths.contains("value"))
    } finally q.stop()
  }

  test("DriftMonitor flags new paths and new types across batches") {
    val m = new ProfileStream.DriftMonitor
    val schema1 = StructType(Seq(StructField("a", IntegerType)))
    val b1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1), Row(2))), schema1)
    val d1 = m.processBatch(b1)
    assert(d1.exists(_.startsWith("new path: a")))
    // same shape again: no drift
    assert(m.processBatch(b1).isEmpty)
    // new column appears + a becomes nullable-with-string? simulate type
    // change by a string column of the same name
    val schema2 = StructType(Seq(StructField("a", StringType),
      StructField("b", DoubleType)))
    val b2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("x", 1.5))), schema2)
    val d2 = m.processBatch(b2)
    assert(d2.exists(_ == "new type on a: str"))
    assert(d2.exists(_.startsWith("new path: b")))
    // b present in batch 2 but absent in batch 3 → vanished
    val d3 = m.processBatch(b1)
    assert(d3.contains("vanished path: b"))
  }

  test("DriftMonitor: drift log is ring-buffered at maxDrifts while " +
      "totalDrifts keeps the exact lifetime count") {
    val m = new ProfileStream.DriftMonitor(maxDrifts = 5)
    // each batch introduces one brand-new path (new path drift) and
    // vanishes the previous one (vanished drift) → 2 drifts/batch
    // after the first
    (0 until 8).foreach { i =>
      val schema = StructType(Seq(StructField(s"c$i", IntegerType)))
      val b = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(i))), schema)
      m.processBatch(b)
    }
    // lifetime: 8 new paths + 7 vanishes = 15 drifts, exact
    assert(m.totalDrifts == 15L, s"totalDrifts ${m.totalDrifts}")
    // retained history capped at 5, and it is the NEWEST 5
    val kept = m.allDrifts
    assert(kept.size == 5, s"ring size ${kept.size}")
    assert(kept.last == "vanished path: c6")
    assert(kept.contains("new path: c7 (int32)"))
    // state (the merged histogram) is NOT ring-bounded — every path
    // ever seen stays known
    assert(m.knownPaths.size == 8)
  }

  test("dedupStream keeps one row per fingerprint within the horizon") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    val in = dir.toString + "/in"
    Seq(
      (1L, "2024-01-01 10:00:00", "hello   world"),
      (2L, "2024-01-01 10:00:01", "Hello World"),   // same normalized fp
      (3L, "2024-01-01 10:00:02", "different text")
    ).toDF("id", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.dedupStream(stream, "ts")
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select id from sdedup").collect()
        .map(_.getLong(0)).sorted
      assert(rows.length == 2)
      assert(rows.contains(3L))
      assert(rows.exists(id => id == 1L || id == 2L))
    } finally q.stop()
  }

  test("sessionizeStream: flatMapGroupsWithState closes sessions by " +
      "gap and by event-time timeout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssess")
    val in = dir.toString + "/in"
    def write(mode: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .write.mode(mode).parquet(in)
    // user 1: two sessions (gap > 30 min between 10:05 and 12:00);
    // user 2: one session that only a timeout can close
    write("overwrite", Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:05:00"),
      (1L, "2024-01-01 12:00:00"), (2L, "2024-01-01 10:00:00")))
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val out = ProfileStream.sessionizeStream(stream,
      gapMinutes = 30, watermarkDur = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssess").start()
    try {
      q.processAllAvailable()
      // user 1's first session closes in-batch (12:00 is past the
      // gap); user 2's closes by timeout once the follow-up empty
      // trigger sees the advanced watermark (11:50 > 10:30)
      val b1 = spark.sql("select * from ssess").collect()
      assert(b1.map(r => (r.getLong(0), r.getLong(2))).toSet ==
        Set((1L, 2L), (2L, 1L)))
      assert(b1.filter(_.getLong(0) == 1L).head.getDouble(3) == 300.0)
      // a later event pushes the watermark past user 1's open
      // session (12:00 + 30 min ≤ 12:50) → timeout closes it too
      write("append", Seq((3L, "2024-01-01 13:00:00")))
      q.processAllAvailable()
      val b2 = spark.sql("select user_id, n_events from ssess").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(b2.count { case (u, n) => u == 1L && n == 1L } == 1, s"got ${b2.toSeq}")
    } finally q.stop()
  }

  test("TextAnalysis.qualityScore: empty/whitespace text scores 0") {
    import graft.operators.TextAnalysis
    val df = Seq("", "   ", "real words here").toDF("text")
      .select(TextAnalysis.qualityScore(org.apache.spark.sql.functions
        .col("text")).as("q"))
    val qs = df.collect().map(_.getDouble(0)).toSeq
    assert(qs(0) == 0.0 && qs(1) == 0.0)
    assert(qs(2) > 0.0 && !qs(2).isNaN)
  }

  test("listCollections: nonexistent dir yields empty catalog, no NPE") {
    val out = graft.sources.Tables.listCollections(spark, "/no/such/dir")
    assert(out.count() == 0)
  }

  test("dot_product rejects decimal arrays at analysis time") {
    val e = intercept[Exception] {
      spark.range(1).select(graft.functions.DotProduct.dotProduct(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(BigDecimal(1))),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(BigDecimal(2))))).collect()
    }
    assert(e.getMessage.contains("dot_product") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("DriftMonitor via foreachBatch on a live streaming query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift")
    val in = dir.toString + "/in"
    // batch 1: (a: int); write before the stream starts
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val m = new ProfileStream.DriftMonitor
    val q = spark.readStream.schema(schema).parquet(in)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          m.processBatch(batch.toDF()); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(m.knownPaths == Set("a", "b"))
      // drip a second file through the SAME stream
      Seq((2, "y")).toDF("a", "b").write.mode("append").parquet(in)
      q.processAllAvailable()
      assert(m.typeCounts("a")("int32") == 2)
      assert(m.allDrifts.count(_.startsWith("new path")) == 2)
    } finally q.stop()
  }

  test("multimodal: sniff branches + stub decode shape") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val meta = Multimodal.mediaMeta(docs)
    val byFormat = meta.groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFormat.keySet == Set("jpeg", "png", "wav", "unknown"))
    val r = meta.head
    assert(r.getLong(4) >= 1 && r.getLong(4) <= 1920)   // stub_width
    assert(r.getLong(5) >= 1 && r.getLong(5) <= 1080)   // stub_height
  }

  test("multimodal: frameSample cuts n evenly-spaced byte windows, " +
      "short blobs collapse to whole-payload frames") {
    // 40-byte payload, 4 frames of 16 -> offsets 1, 9, 17, 25
    val bytes = (0 until 40).map(_.toByte).toArray
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val got = Multimodal.frameSample(df, "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(1L, 9L, 17L, 25L))
    assert(d1.forall(_._4 == 16L))
    // 3-byte blob: every frame starts at 1 and is the whole payload
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(_._3).toSeq == Seq(1L, 1L, 1L, 1L))
    assert(d2.forall(_._4 == 3L))
    // distinct hashes for doc 1 (windows differ), one hash for doc 2
    val h = Multimodal.frameSample(df, "payload").collect()
      .map(r => (r.getLong(0), r.getString(4)))
    assert(h.filter(_._1 == 1L).map(_._2).distinct.length == 4)
    assert(h.filter(_._1 == 2L).map(_._2).distinct.length == 1)
  }

  test("multimodal: frameSampleAt cuts frames at injected offsets — " +
      "the demuxer drop-in point — and reduces to frameSample when " +
      "fed the stride offsets") {
    import org.apache.spark.sql.functions.{array, expr, lit}
    val bytes = (0 until 40).map(_.toByte).toArray
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    // a "keyframe index" the stride sampler never produces
    val got = Multimodal.frameSampleAt(df, "payload",
        array(lit(3L), lit(30L))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 3L, 16L), (1L, 30L, 11L)))
    // stride offsets injected by hand == the fixed-stride operator
    val stride = array(lit(1L), lit(9L), lit(17L), lit(25L))
    val viaAt = Multimodal.frameSampleAt(df, "payload", stride)
      .collect().map(_.toSeq).toSeq
    val viaFixed = Multimodal.frameSample(df, "payload")
      .collect().map(_.toSeq).toSeq
    assert(viaAt == viaFixed)
    // int-typed offsets normalize to the long contract
    val intOffs = Multimodal.frameSampleAt(df, "payload",
        expr("array(1, 9)")).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(intOffs == Seq((1L, 16L), (9L, 16L)))
  }

  test("multimodal: mapBatches feeds fixed-size batches") {
    val df = spark.range(25).toDF("id")
    val out = Multimodal.mapBatches(df.repartition(1), 10,
      StructType(Seq(StructField("batch_size", IntegerType)))) { rows =>
      Seq(Row(rows.size))
    }
    val sizes = out.collect().map(_.getInt(0)).sorted.toSeq
    assert(sizes == Seq(5, 10, 10))
  }

  test("chat context block: markers, section order, json fences") {
    val events = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    val ctx = ChatContext.collectionContext(events, "event_id")
    assert(ctx.startsWith(ChatContext.StartMarker))
    assert(ctx.endsWith(ChatContext.EndMarker))
    val iSchema = ctx.indexOf("Collection Schema:")
    val iStats = ctx.indexOf("Collection Field Statistics:")
    val iDocs = ctx.indexOf("Sample Documents:")
    assert(iSchema > 0 && iStats > iSchema && iDocs > iStats)
    assert(ctx.contains("```json"))
    assert(ctx.contains("\"event_type\": {\"type\": \"str\"}"))
  }

  test("context cache: reuse on same collection, invalidate on " +
      "switch, recompute on switch-back (tui.py:141-143 discipline)") {
    val cache = new ChatContext.ContextCache
    var computes = 0
    def fetch(name: String): String = {
      computes += 1; s"ctx-$name-$computes"
    }
    // first request computes; repeat on the SAME collection reuses
    assert(cache.get("events")(fetch("events")) == "ctx-events-1")
    assert(cache.get("events")(fetch("events")) == "ctx-events-1")
    assert(computes == 1)
    // switching collections must recompute — and switching away and
    // back recomputes AGAIN (the reference keeps no per-collection
    // map; the old result is nulled the moment the selection changes)
    assert(cache.get("orders")(fetch("orders")) == "ctx-orders-2")
    assert(cache.get("events")(fetch("events")) == "ctx-events-3")
    assert(computes == 3)
    // a bare selection change drops the cache even with no fetch yet
    cache.setActive("orders")
    assert(cache.cached.isEmpty)
    // re-selecting the already-active collection is NOT a switch
    assert(cache.get("orders")(fetch("orders")) == "ctx-orders-4")
    cache.setActive("orders")
    assert(cache.cached.contains("ctx-orders-4"))
  }

  test("cdcDedupStream: closed slices equal the batch per-window " +
      "chunk census and roll up to cdcDedupReport by addition") {
    import java.sql.Timestamp
    import graft.operators.Multimodal
    def ts(s: String) = Timestamp.valueOf(s)
    val blobA = "shared media block shared media block!".getBytes("UTF-8")
    val blobB = "completely different payload bytes here".getBytes("UTF-8")
    val rows = Seq(
      (ts("2024-03-01 01:00:00"), blobA),
      (ts("2024-03-01 05:00:00"), blobA),   // same-day duplicate
      (ts("2024-03-02 01:00:00"), blobA),   // next-day copy: own slice
      (ts("2024-03-02 02:00:00"), blobB))
      .toDF("ts", "payload")
    val slices = graft.streaming.ProfileStream
      .replayedSlices(rows, "ts")(st => graft.streaming.ProfileStream
        .cdcDedupStream(st, "ts"))
    val got = slices.collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: the same gear chunk table grouped by day + hash
    val batch = Multimodal.cdcChunkTable(rows
          .withColumn("doc_id", monotonically_increasing_id()),
        "payload",
        chunker = graft.functions.CdcChunks.gearCdcChunks)
      .join(rows.withColumn("doc_id", monotonically_increasing_id())
        .select(col("doc_id"),
          date_format(date_trunc("day", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("slice_start")), "doc_id")
      .groupBy("slice_start", "chunk_md5")
      .agg(count(lit(1)).as("n_copies"),
        min("len").cast("long").as("chunk_len"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == batch && got.nonEmpty)
    // day-1 rows carry the duplicate: every blobA chunk has 2 copies
    val day1 = got.filter(_._1 == "2024-03-01 00:00:00")
    assert(day1.nonEmpty && day1.forall(_._3 == 2L))
    // slice census rolls up to the batch dedup-report totals by
    // addition (merge-only counters)
    val nChunks = got.toSeq.map(_._3).sum
    val rep = Multimodal.cdcDedupReport(Multimodal.cdcChunkTable(
        rows.withColumn("doc_id", monotonically_increasing_id()),
        "payload",
        chunker = graft.functions.CdcChunks.gearCdcChunks))
      .head
    assert(nChunks == rep.getAs[Long]("n_chunks"))
  }
}
