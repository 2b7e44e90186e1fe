package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Corpus-hygiene operators added for the training-data pipeline:
  * decontamination, cross-corpus dedup, top-terms, quality gate.
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ids routed to the operator's deterministic test split (md5 prefix
  // '0'/'1') vs the training side, found by the same rule it uses
  private val testIds = (1L to 200L)
    .filter(i => "01".contains(md5hex(i.toString).charAt(0)))
  private val trainIds = (1L to 200L)
    .filterNot(i => "01".contains(md5hex(i.toString).charAt(0)))

  test("decontaminate flags the train doc sharing an 8-gram with a test doc") {
    val benchmark = "alpha bravo charlie delta echo foxtrot golf hotel"
    val clean = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (testIds.head, benchmark + " india juliett"),
      (trainIds.head, "prefix words " + benchmark),        // contaminated
      (trainIds(1), clean)
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(trainIds.head))
    assert(out.head.getLong(1) == 1L)   // exactly the one shared 8-gram
    assert(out.head.getLong(2) == 1L)   // from one test doc
  }

  test("decontaminate is empty when train and test share no n-gram") {
    val docs = Seq(
      (testIds.head, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (trainIds.head, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs).count() == 0)
  }

  test("dedupAgainst drops fresh docs whose normalized text is seen") {
    val seen = Seq((1L, "Hello   World")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "hello world"),        // same after normalize/lower → dropped
      (11L, "hello there world")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(fresh, seen).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(11L))
  }

  test("topTerms ranks by tf/df with term tie-break") {
    // "rare" appears twice in doc 1 and nowhere else: tf/df = 2/1 = 2.
    // "common" appears in both docs: tf/df = 1/2 each.
    val docs = Seq(
      (1L, "rare rare common zeta"),
      (2L, "common beta beta beta")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.topTerms(docs, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getDouble(5)))
    assert(r.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq ==
      Seq(("rare", 2.0), ("zeta", 1.0)))
    assert(r.filter(_._1 == 2L).map(_._3).toSeq == Seq("beta", "common"))
  }

  test("qualityFilter flags each rule separately") {
    val longText = ("the quick brown fox jumps over the lazy dog " * 5).trim
    val docs = Seq(
      (1L, longText),          // passes all
      (2L, "short text"),      // fails pass_len (and quality)
      (3L, "xz " * 25)         // 25 tokens, no stopwords → fails lang
    ).map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val m = TextAnalysis.qualityFilter(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(4), r.getBoolean(6), r.getBoolean(7))).toMap
    assert(m(1L) == (true, true, true))
    assert(m(2L)._1 == false)
    assert(m(2L)._3 == false)
    assert(m(3L) == (true, false, false))
  }

  test("qualityBlend: matches a driver-side CDF recomputation on " +
      "real documents") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val qn = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect()
    val qbins = qn.map(r =>
      math.min(255L, math.floor(r.getDouble(1) * 256).toLong))
    val lbins = qn.map(r => math.min(255L, r.getLong(2) / 8))
    def cdf(bins: Array[Long]): Map[Long, Long] = {
      val total = bins.length.toLong
      val counts = bins.groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      var cum = 0L
      counts.keys.toSeq.sorted.map { k =>
        cum += counts(k); k -> (1000000L * cum / total)
      }.toMap
    }
    val (qc, lc) = (cdf(qbins), cdf(lbins))
    val expected = qn.indices.map { i =>
      val (q, l) = (qc(qbins(i)), lc(lbins(i)))
      (qn(i).getLong(0), q, l, (q + l) / 2)
    }.sortBy(_._1)
    val got = TextAnalysis.qualityBlend(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("qualityBlend: a single-bin corpus lands every doc at ppm " +
      "1000000 on both axes") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityBlend(docs).collect()
    assert(got.length == 3 && got.forall(r =>
      r.getLong(1) == 1000000L && r.getLong(2) == 1000000L &&
        r.getLong(3) == 1000000L))
  }

  test("vocabCoverage: OOV counts against a frozen vocab match a " +
      "hand computation; full-vocab coverage reports zero OOV") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c oovx", "s1"),
      (2L, "a a oovy oovx", "s1"),
      (3L, "b c", "s2")
    ).toDF("doc_id", "text", "source")
    val vocab = Seq("a", "b", "c").toDF("term")
    val got = TextAnalysis.vocabCoverage(docs, vocab, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // s1: 8 tokens, 3 oov (oovx x2, oovy), 2 distinct oov terms
    assert(got == Seq(
      ("s1", 8L, 3L, 2L, 3L * 1000000L / 8L),
      ("s2", 2L, 0L, 0L, 0L)))
    // topV covering the whole vocabulary -> zero OOV everywhere
    val full = TextAnalysis.vocabCoverage(docs, topV = 100)
    assert(full.filter(col("n_oov") =!= 0L).count() == 0L)
  }

  test("tokenizer artifact: export -> reload reproduces the trained " +
      "merges exactly and the reloaded encoder encodes identically") {
    val docs = Seq((1L, "aa ab aa ab ab aa"), (2L, "aa ab ba ba"),
      (3L, "ba ba aa aa ab")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, numMerges = 5,
      minCount = 2)
    assert(learned.nonEmpty)
    val path = TextAnalysis.exportTokenizer(spark, learned)
    val reloaded = TextAnalysis.loadTokenizer(spark, path)
    assert(reloaded == learned.map(m => (m._1, m._2)))
    val enc = docs.select(
        TextAnalysis.bpeEncode(col("text"),
          learned.map(m => (m._1, m._2))).as("a"),
        TextAnalysis.bpeEncode(col("text"), reloaded).as("b"))
      .collect()
    assert(enc.forall(r => r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("tokenizer artifact: corrupt artifacts are refused, not " +
      "silently mis-loaded") {
    val learned = Seq(("a", "b", 5L), ("ab", "c", 3L))
    val path = TextAnalysis.exportTokenizer(spark, learned)
    // version drift
    val bad1 = java.nio.file.Files
      .createTempDirectory("graft_tok_bad").toString
    spark.read.parquet(path)
      .withColumn("token", when(col("kind") === "meta", lit("v999"))
        .otherwise(col("token")))
      .write.mode("overwrite").parquet(bad1)
    intercept[IllegalArgumentException] {
      TextAnalysis.loadTokenizer(spark, bad1)
    }
    // merge ids shuffled out of the contiguous rank order
    val bad2 = java.nio.file.Files
      .createTempDirectory("graft_tok_bad").toString
    spark.read.parquet(path)
      .withColumn("id", when(col("kind") === "merge",
        col("id") + 1).otherwise(col("id")))
      .write.mode("overwrite").parquet(bad2)
    intercept[IllegalArgumentException] {
      TextAnalysis.loadTokenizer(spark, bad2)
    }
    // a byte-alphabet row drifted from bytes_to_unicode
    val bad3 = java.nio.file.Files
      .createTempDirectory("graft_tok_bad").toString
    spark.read.parquet(path)
      .withColumn("token", when(col("kind") === "byte_alphabet" &&
        col("id") === 65, lit("Z")).otherwise(col("token")))
      .write.mode("overwrite").parquet(bad3)
    intercept[IllegalArgumentException] {
      TextAnalysis.loadTokenizer(spark, bad3)
    }
  }
}
