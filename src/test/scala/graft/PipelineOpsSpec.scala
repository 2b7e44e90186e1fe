package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** Semantics pins for the round-6 training-pipeline operators:
  * repetition signals, PII redaction, sequence packing.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("repetitionProfile: counts, fractions, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b a b c"),        // bigrams: ab,ba,ab,bc → 4 total 3 uniq
      (2L, "x y"),              // single bigram
      (3L, "solo"),             // no bigrams
      (4L, "t t t t t t t t t t t t"),  // 11× "t t": dup frac 10/11
      (5L, ""),                 // ZERO tokens: size-1 = -1 must not
      (6L, "   ")               // reach slice's length argument
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4 && out(1L).getLong(2) == 3)
    assert(out(1L).getDouble(3) == 0.25)
    // tie at count 1 among ba,bc → a b wins at count 2; top share 0.5
    assert(out(1L).getString(4) == "a b" && out(1L).getLong(5) == 2)
    assert(out(1L).getDouble(6) == 0.5)
    assert(out(2L).getLong(1) == 1 && out(2L).getString(4) == "x y")
    assert(out(3L).getLong(1) == 0 && out(3L).isNullAt(4)
      && out(3L).getDouble(3) == 0.0)
    assert(out(4L).getDouble(3) > 0.9 && !out(4L).getBoolean(7))
    assert(!out(1L).getBoolean(7))  // 0.25 dup frac fails the 0.1 gate
    assert(out(2L).getBoolean(7) && out(3L).getBoolean(7))
    assert(out(5L).getLong(1) == 0 && out(5L).getBoolean(7))
    assert(out(6L).getLong(1) == 0 && out(6L).getBoolean(7))
  }

  test("redactPii: emails, ipv4 and phones redacted in order, " +
      "counts from raw text") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or jo@ex.co thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +1-555-010-9999 now"),
      (4L, "nothing here"),
      (5L, "mix a@b.io 1.2.3.4 +49-30-1234567 end")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 &&
      out(1L).getString(4) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L).getLong(2) == 2 &&
      out(2L).getString(4) == "server <IP> and <IP> up")
    assert(out(3L).getLong(3) == 1 &&
      out(3L).getString(4) == "call <PHONE> now")
    assert(out(4L).getString(4) == "nothing here" &&
      out(4L).getLong(1) == 0 && out(4L).getLong(2) == 0 &&
      out(4L).getLong(3) == 0)
    assert(out(5L).getString(4) == "mix <EMAIL> <IP> <PHONE> end")
  }

  test("rarityProfile: integer-weighted mean inverse df, hand-computed") {
    val docs = Seq(
      (1L, "common common rare"),   // common df=2, rare df=1
      (2L, "common only")           // only df=1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rarityProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: w = 2*round(1e6/2) + 1*round(1e6/1) = 2e6 → round(2e6/3)
    assert(out(1L) == (3L, 666667L))
    // doc 2: w = round(1e6/2) + round(1e6/1) = 1.5e6 → 1.5e6/2
    assert(out(2L) == (2L, 750000L))
    // half-up at the boundary: one 'a a b' doc alone — w = 3e6, n = 3
    val half = TextAnalysis
      .rarityProfile(Seq((1L, "a a b")).toDF("doc_id", "text"))
      .collect().head
    assert(half.getLong(2) == 1000000L)
  }

  test("keepBest: highest-score copy survives, ties break to lowest id") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "src0", "the quick brown fox"),
      (2L, "src1", "  THE QUICK BROWN FOX"),   // same fp, fewer stop hits
      (3L, "src0", "unique text here"),
      (4L, "src1", "unique text here")          // identical ⇒ tie ⇒ id 3
    ).toDF("doc_id", "source", "text")
    val out = Dedup.keepBest(docs,
        TextAnalysis.qualityScore(col("text")))
      .select("doc_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 2L))
  }

  test("sourceOverlap: distinct shared fingerprints per source pair") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "a", "one two three"),
      (2L, "b", "ONE TWO THREE"),     // shared with a (normalized)
      (3L, "b", "only in b"),
      (4L, "c", "one two three"),     // shared with a and b
      (5L, "a", "one two three"),     // duplicate within a: counts once
      (6L, "c", "only in b")          // shared with b
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "c") -> 2L))
  }

  test("compact: collapses a scattered landing zone to the target " +
      "file count with key-clustered files") {
    import graft.operators.Export
    val base = java.nio.file.Files.createTempDirectory("graft_cpt")
    val in = base.toString + "/in"
    val out = base.toString + "/out"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(32).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 32)
    Export.compact(spark, in, out, targetFileBytes = 1L << 20,
      sortCol = Some("event_id"))
    assert(parquetFiles(out) < 32)
    // row preservation + range clustering: per-file id ranges disjoint
    val withFile = spark.read.parquet(out)
      .select(col("event_id"),
        org.apache.spark.sql.functions.input_file_name().as("f"))
    assert(withFile.count() ==
      spark.read.parquet(in).count())
    val ranges = withFile.groupBy("f")
      .agg(org.apache.spark.sql.functions.min("event_id").as("lo"),
        org.apache.spark.sql.functions.max("event_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("corpusDiff: added / removed / changed / kept all detected") {
    import graft.operators.Dedup
    val prev = Seq((1L, "same text"), (2L, "old version"),
      (3L, "going away")).toDF("doc_id", "text")
    val cur = Seq((1L, "Same   TEXT"),   // fp-equal after normalization
      (2L, "new version"), (4L, "brand new")).toDF("doc_id", "text")
    val out = Dedup.corpusDiff(prev, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "kept", 2L -> "changed", 3L -> "removed",
      4L -> "added"))
  }

  test("splitAssign: deterministic, stable under corpus growth, " +
      "ratios roughly honored") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Dedup.splitAssign(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // stability: assignment over a subset matches the full corpus
    val sub = Dedup.splitAssign(docs.filter(col("doc_id") < 100))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (id, s) => full(id) == s })
    val counts = full.values.groupBy(identity).view.mapValues(_.size)
    assert(counts("train") > 400)          // ~90% of 500
    assert(counts.getOrElse("test", 0) + counts.getOrElse("val", 0)
      < 100)
  }

  test("leakSafeSplit: no near-dup pair straddles a split boundary, " +
      "and singletons split exactly as splitAssign") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.leakSafeSplit(docs, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == docs.count())
    val split = out.map(t => t._1 -> t._3).toMap
    // THE leakage guard: every near-dup pair lands in one split
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.3)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    assert(pairs.forall { case (a, b) => split(a) == split(b) })
    // per-doc hashing does NOT have the property on this corpus —
    // the guard is load-bearing, not vacuously true
    val perDoc = Dedup.splitAssign(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => perDoc(a) != perDoc(b) })
    // singletons (their own representative) match splitAssign exactly
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.filterNot(t => inPair(t._1)).foreach { case (id, rep, s) =>
      assert(rep == id && perDoc(id) == s)
    }
  }

  test("packSequences: bins are the concat-then-chunk layout per shard") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.packSequences(docs, tokenBudget = 100, nShards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // recompute the packing naively per shard and compare
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, startTok, bin) =>
        assert(startTok == cum)
        assert(bin == cum / 100)     // floor(start/budget)
        cum += n
      }
    }
    // bins are dense from 0 within each shard (docs shorter than the
    // budget cannot skip a chunk)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val bins = rows.map(_._5).distinct.sorted
      assert(bins.head == 0L)
    }
  }
}
