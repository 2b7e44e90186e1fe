package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MgSummary
import graft.operators.Sketches

/** Misra-Gries frequent-items summary + the two-pass heavy-hitters
  * operator built on it.
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("MG guarantee: every key with count > n/(cap+1) survives, " +
      "under any partition split and merge order") {
    val rnd = new Random(7)
    // Zipf-ish stream: key i drawn with weight 1/(i+1)
    val keys = (0 until 200).map(i => s"k$i")
    val weights = keys.indices.map(i => 1.0 / (i + 1))
    val total = weights.sum
    val stream = (0 until 20000).map { _ =>
      var r = rnd.nextDouble() * total
      var i = 0
      while (r > weights(i) && i < keys.size - 1) { r -= weights(i); i += 1 }
      keys(i)
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 32
    // split into 7 uneven slices, summarize each, merge pairwise in a
    // scrambled order — the distributed partial/merge path
    val slices = stream.grouped(3001).toSeq
    val partials = slices.map { sl =>
      val st = new MgSummary(cap); sl.foreach(s => st.add(u(s))); st
    }
    val merged = rnd.shuffle(partials).reduce { (a, b) => a.merge(b); a }
    assert(merged.n == stream.size)
    assert(merged.counters.size <= cap)
    val surviving = merged.counters.keySet.map(_.toString)
    val mustSurvive = exact.filter(_._2 > stream.size.toLong / (cap + 1))
    mustSurvive.foreach { case (k, c) =>
      assert(surviving.contains(k), s"$k (count $c) must survive")
    }
    // and each surviving counter is a lower bound within n/(cap+1)
    merged.counters.foreach { case (k, est) =>
      val ex = exact.getOrElse(k.toString, 0L)
      assert(est <= ex, s"$k overcounted")
      assert(ex - est <= stream.size.toLong / (cap + 1), s"$k error bound")
    }
  }

  test("heavyHitters: exact counts and ppm shares equal the full " +
      "groupBy ground truth, ties broken (cnt desc, key asc)") {
    val rnd = new Random(11)
    val rows = Seq.fill(500)("hot") ++ Seq.fill(500)("warm") ++
      Seq.fill(120)("tie_b") ++ Seq.fill(120)("tie_a") ++
      (0 until 2000).map(i => s"cold${rnd.nextInt(800)}")
    val df = rnd.shuffle(rows).toDF("key").repartition(5)
    val got = Sketches.heavyHitters(df, "key", k = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = rows.size.toLong
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.filter { case (_, c) => c * 30 >= n }
      .sortBy { case (k2, c) => (-c, k2) }
      .map { case (k2, c) => (k2, c, c * 1000000L / n) }
    assert(got.toSeq == expected)
    // the tie pair is present and ordered asc within equal counts
    assert(got.map(_._1).containsSlice(Seq("tie_a", "tie_b")))
  }

  test("freqSketchStream slices + verifyHitters ≡ batch heavyHitters " +
      "≡ ground truth, even when no single slice makes a key hot") {
    val rnd = new Random(3)
    // "spread" is hot globally (share 1/4) but evenly split across 4
    // windows — per-slice survival still holds by pigeonhole (its
    // slice share equals its global share); "burst" is hot in one
    // window only; cold keys are noise
    val rows = (0 until 4).flatMap { h =>
      Seq.fill(250)((s"2024-01-01 0$h:10:00", "spread")) ++
        (if (h == 2) Seq.fill(300)((s"2024-01-01 0$h:20:00", "burst"))
         else Nil) ++
        (0 until 150).map(i =>
          (s"2024-01-01 0$h:30:00", s"cold${rnd.nextInt(400)}"))
    }
    val df = rnd.shuffle(rows).toDF("ts", "key")
      .withColumn("ts", col("ts").cast("timestamp"))
      .repartition(5)
    val slices = graft.streaming.ProfileStream
      .replayedSlices(df, "ts")(st => graft.streaming.ProfileStream
        .freqSketchStream(st, "ts", "key", cap = 24,
          windowDur = "1 hour", watermarkDur = "10 minutes"))
    assert(slices.count() == 4)
    val streamed = Sketches.verifyHitters(df.select("key"), "key",
        k = 8, slices.select(explode(col("keys")).as("key")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = Sketches.heavyHitters(df.select("key"), "key", k = 8,
        slack = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = rows.size.toLong
    val truth = rows.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 8 >= n }
      .sortBy { case (k2, c) => (-c, k2) }
      .map { case (k2, c) => (k2, c, c * 1000000L / n) }
    assert(streamed.toSeq == truth)
    assert(batch.toSeq == truth)
    assert(truth.map(_._1).toSet == Set("spread", "burst"))
  }

  test("oovStream: closed windows carry exact per-(window, group) " +
      "token/OOV counts; additive rollup over slices ≡ batch " +
      "vocabCoverage count columns") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("2024-01-01 00:10:00", "a b oovx", "s1"),
      ("2024-01-01 00:20:00", "a oovy", "s2"),
      ("2024-01-01 01:15:00", "b b oovx oovz", "s1"),
      ("2024-01-01 01:30:00", "a a a", "s2")
    ).toDF("ts", "text", "source")
      .withColumn("ts", col("ts").cast("timestamp"))
    val vocab = Seq("a", "b").toDF("term")
    val slices = graft.streaming.ProfileStream
      .replayedSlices(docs, "ts")(st => graft.streaming.ProfileStream
        .oovStream(st, vocab, "ts", "text", "source",
          windowDur = "1 hour", watermarkDur = "10 minutes"))
    val got = slices.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00", "s1", 3L, 1L),
      ("2024-01-01 00:00:00", "s2", 2L, 1L),
      ("2024-01-01 01:00:00", "s1", 4L, 2L),
      ("2024-01-01 01:00:00", "s2", 3L, 0L)))
    val rolled = slices.groupBy("source")
      .agg(sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_oov")).as("n_oov"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = TextAnalysis.vocabCoverage(docs, vocab, "text", "source")
      .select(col("source"), col("n_tokens"), col("n_oov"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rolled == batch)
  }

  test("heavyHitters: nulls ignored, empty input yields empty output") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("key")
    val hh = Sketches.heavyHitters(withNulls, "key", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // n = 3 non-null; a:2 (2*2 >= 3 pass), b:1 (2 < 3 fail)
    assert(hh.toSeq == Seq(("a", 2L)))
    val empty = Seq.empty[String].toDF("key")
    assert(Sketches.heavyHitters(empty, "key", k = 5).count() == 0L)
  }

  test("empty-input robustness: replayedSlices over an empty table " +
      "yields zero slices, and every round-9 consumer flows through") {
    import graft.operators.TextAnalysis
    val emptyKeyed = Seq.empty[(String, String)].toDF("ts", "key")
      .withColumn("ts", col("ts").cast("timestamp"))
    val slices = graft.streaming.ProfileStream
      .replayedSlices(emptyKeyed, "ts")(st =>
        graft.streaming.ProfileStream.freqSketchStream(
          st, "ts", "key", cap = 8))
    assert(slices.count() == 0L)
    assert(Sketches.verifyHitters(emptyKeyed.select("key"), "key",
      k = 4, slices.select(explode(col("keys")).as("key")))
      .count() == 0L)
    val emptyDocs = Seq.empty[(String, String, String)]
      .toDF("ts", "text", "source")
      .withColumn("ts", col("ts").cast("timestamp"))
    val vocab = Seq("a").toDF("term")
    val oov = graft.streaming.ProfileStream
      .replayedSlices(emptyDocs, "ts")(st =>
        graft.streaming.ProfileStream.oovStream(
          st, vocab, "ts", "text", "source"))
    assert(oov.count() == 0L)
    // batch coverage over an empty corpus: zero rows, no divide
    assert(TextAnalysis.vocabCoverage(emptyDocs, vocab, "text",
      "source").count() == 0L)
  }
}
