package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ByteBpe
import graft.operators.TextAnalysis

/** Byte-BPE merge semantics against the public Sennrich et al. (2016)
  * subword-NMT test vector, the leftmost-merge tie rules, and the
  * DataFrame surface.
  */
class ByteBpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // the classic subword-NMT example: merges learned from the
  // {low, lower, newest, widest} toy corpus — (e,s) then (es,t) then
  // (l,o) then (lo,w); "lowest" must come out as [low, est]
  private val sennrich = ByteBpe.rankMap(Seq(
    "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))

  test("Sennrich vector: lowest -> [low, est]") {
    assert(ByteBpe.encode("lowest", sennrich) ==
      Vector("low", "est"))
  }

  test("Sennrich vector: lower -> [low, e, r]") {
    assert(ByteBpe.encode("lower", sennrich) ==
      Vector("low", "e", "r"))
  }

  test("Sennrich vector: newest -> [n, e, w, est]") {
    // (e,s) fires on the SECOND e — rank order, not position order,
    // picks the pair; (n,e)/(e,w)/(w,e) are not in the table
    assert(ByteBpe.encode("newest", sennrich) ==
      Vector("n", "e", "w", "est"))
  }

  test("unknown word stays fully split") {
    assert(ByteBpe.encode("xyz", sennrich) ==
      Vector("x", "y", "z"))
  }

  test("leftmost non-overlapping merge: aaaa -> [aa, aa], aaa -> [aa, a]") {
    val m = ByteBpe.rankMap(Seq("a" -> "a"))
    assert(ByteBpe.encode("aaaa", m) == Vector("aa", "aa"))
    assert(ByteBpe.encode("aaa", m) == Vector("aa", "a"))
  }

  test("merge products feed later merges across ranks") {
    // (a,b) rank 1, (ab,c) rank 2: abc collapses fully
    val m = ByteBpe.rankMap(Seq("a" -> "b", "ab" -> "c"))
    assert(ByteBpe.encode("abcabc", m) == Vector("abc", "abc"))
  }

  test("fixture: hand-derived counts through the expression") {
    // "the cat": pretokens [the][ cat].
    //   the: (t,h)#1 -> [th,e]; (th,e)#31 -> [the]        = 1
    //   ␠cat: (a,t)#8 -> [␠,c,at]; (␠,c)#45 -> [␠c,at]    = 2
    // "running 100": pretokens [running][ 100].
    //   running: (i,n)#3 -> [r,u,n,n,in,g]; (in,g)#32 ->
    //     [r,u,n,n,ing]                                    = 5
    //   ␠100: (1,0)#52 -> [␠,10,0]; no (␠,1)/(10,0)        = 3
    val df = Seq((1L, "the cat"), (2L, "running 100"))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .orderBy("id")
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(3L, 8L))
  }

  test("null text -> null count; empty text -> 0") {
    val df = Seq((1L, Option("")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getLong(1) == 0L)
    assert(rows(1).isNullAt(1))
  }

  test("bpeBudgetReport: proxy and exact totals per stratum") {
    val df = Seq(
      ("src0", "the the the"),   // ws 3; bpe: [the][ the][ the]=1+2+2=5
      ("src0", "cat"),           // ws 1; bpe: (a,t)#8 -> [c,at] = 2
      ("src1", "it is")          // ws 2; bpe: [it]=1, [␠is]: (i,s)#16
                                 //   -> [␠,is]; no (␠,is) -> 2; = 3
    ).toDF("source", "text")
    // ␠the: (t,h)#1 -> [␠,th,e]; (th,e)#31 -> [␠,the]; no (␠,the) = 2
    val out = TextAnalysis.bpeBudgetReport(df).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq(("src0", 2L, 4L, 7L), ("src1", 1L, 2L, 3L)))
  }

  test("bpeBudgetReport plan: the BPE count adds NO shuffle beyond " +
      "the budget groupBy (+ the presentation sort)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exchanges = TextAnalysis.bpeBudgetReport(docs)
      .queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
    assert(exchanges.size <= 2,
      s"expected agg + sort exchanges only, got ${exchanges.size}")
  }

  test("tokenBudgetStream closed slices roll up to the batch " +
      "bpeBudgetReport exactly") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val docs = Seq(
      (ts("2024-05-01 01:00:00"), "the cat", "src0"),
      (ts("2024-05-01 02:00:00"), "running 100", "src0"),
      (ts("2024-05-02 01:00:00"), "the the the", "src1"),
      (ts("2024-05-02 02:00:00"), "it is", "src1"))
      .toDF("ts", "text", "source")
    val slices = graft.streaming.ProfileStream
      .replayedSlices(docs, "ts")(st => graft.streaming.ProfileStream
        .tokenBudgetStream(st, "ts", "text", "source"))
    val rolled = slices.groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("ws_tokens").as("ws"),
        sum("bpe_tokens").as("bpe"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val batch = graft.operators.TextAnalysis
      .bpeBudgetReport(docs.drop("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rolled.toSeq == batch.toSeq)
  }

  test("bpeTrain learns the Sennrich paper corpus in the published " +
      "order") {
    // the paper's toy corpus: low x5, lower x2, newest x6, widest x3
    // (one word per doc — multi-word docs would carry the Ġ space).
    // Pair counts round 1: (e,s)=9 ties (s,t)=9 -> lexicographic
    // (e,s); then (es,t)=9; then (l,o)=7 ties (o,w) -> (l,o); then
    // (lo,w)=7. Matches the paper's sequence modulo its </w> marker.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val learned = graft.operators.TextAnalysis
      .bpeTrain(corpus, numMerges = 4)
    assert(learned == Seq(("e", "s", 9L), ("es", "t", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("bpeTrain maxVocab caps the census to the head by " +
      "(count DESC, token ASC) and training sees only that head") {
    // census: "low" x5, "newest" x6, "widest" x3, "lower" x2 — four
    // distinct pre-tokens. maxVocab=2 keeps {newest:6, low:5}; the
    // dropped tail (widest, lower) must contribute nothing, so the
    // learned merges equal training on an explicitly truncated
    // corpus.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val capped = graft.operators.TextAnalysis
      .bpeTrain(corpus, numMerges = 4, maxVocab = 2)
    val headOnly = (Seq.fill(5)("low") ++ Seq.fill(6)("newest"))
      .toDF("text")
    val expected = graft.operators.TextAnalysis
      .bpeTrain(headOnly, numMerges = 4)
    assert(capped == expected)
    // and the cap visibly changed the outcome vs the full census
    val full = graft.operators.TextAnalysis
      .bpeTrain(corpus, numMerges = 4)
    assert(capped != full)
    // tie in frequency resolves by token ASC: "alpha" x2 vs "beta" x2
    // with maxVocab=1 -> only "alpha" survives, so every learned
    // merge is an alpha-internal pair
    val tied = (Seq.fill(2)("alpha") ++ Seq.fill(2)("beta"))
      .toDF("text")
    val one = graft.operators.TextAnalysis
      .bpeTrain(tied, numMerges = 2, maxVocab = 1)
    val alphaOnly = Seq.fill(2)("alpha").toDF("text")
    assert(one == graft.operators.TextAnalysis
      .bpeTrain(alphaOnly, numMerges = 2))
  }

  test("learned merges drive bpeTokenCount: lowest -> 2 tokens") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val learned = graft.operators.TextAnalysis
      .bpeTrain(corpus, numMerges = 4).map(m => (m._1, m._2))
    val n = Seq(Tuple1("lowest")).toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text"), learned))
      .head.getLong(0)
    assert(n == 2L)   // [low, est] — the paper's flagship segmentation
  }

  test("bpeEncode: hand-derived ID stream; size equals " +
      "bpeTokenCount on every doc") {
    // "the" -> merge (t,h) rank1 -> [th,e] -> (th,e) rank31 ->
    // ["the"] = product of 0-based merge 30 -> id 286.
    // " the" -> [' ',t,h,e] -> [' ',th,e] -> [' ',"the"]: no merge
    // pairs (' ',"th")/(' ',"the") exist (ranks 36-38 are
    // (' ','t')/(' t','h')/(' th','e') — different LHS symbols), so
    // ids [32, 286].
    val df = Seq("the", " the", "", "the the")
      .toDF("text")
      .select(col("text"),
        TextAnalysis.bpeEncode(col("text")).as("ids"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
    val byText = df.collect()
      .map(r => (r.getString(0), r.getSeq[Int](1).toList,
        r.getLong(2))).toList
    assert(byText.find(_._1 == "the").get._2 == List(286))
    assert(byText.find(_._1 == " the").get._2 == List(32, 286))
    assert(byText.find(_._1 == "").get._2 == Nil)
    assert(byText.find(_._1 == "the the").get._2 == List(286, 32, 286))
    // size(ids) == bpeTokenCount, here and on real corpus text
    byText.foreach { case (_, ids, n) => assert(ids.size.toLong == n) }
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val mism = docs.select(
        size(TextAnalysis.bpeEncode(col("text"))).cast("long")
          .as("ns"),
        TextAnalysis.bpeTokenCount(col("text")).as("nc"))
      .where(col("ns") =!= col("nc")).count()
    assert(mism == 0L)
  }

  test("fixture merges are SQL-literal-safe and render as a list") {
    val sql = ByteBpe.mergesSqlList
    assert(sql.startsWith("[") && sql.endsWith("]"))
    assert(sql.contains("'t'||chr(1)||'h'"))
  }

  test("byte-level alphabet makes the tokenizer TOTAL: every case " +
      "the raw chain excludes by contract now roundtrips exactly") {
    import graft.functions.{ByteAlphabet, ByteBpe}
    def roundtrip(s: String): Boolean =
      Seq(Tuple1(s)).toDF("text")
        .select((ByteAlphabet.unicodeToByte(ByteBpe.bpeDecode(
          ByteBpe.bpeEncode(ByteAlphabet.byteToUnicode(col("text")),
            ByteBpe.fixtureMergesMapped),
          ByteBpe.fixtureMergesMapped)) === col("text")).as("ok"))
        .head.getBoolean(0)
    // the raw chain's stated exclusions, all total now:
    for (s <- Seq(
        "Ā",                 // raw chain's id-collision band char
        "a  b",              // space runs (raw pre-tokenizer drops)
        "   ",               // pure spaces
        "tab\tand\nnewline", // control bytes
        "\u0000\u0001 x",  // NUL + the chr(1) oracle-key exclusion
        "café 日本語 😀",      // multi-byte + surrogates
        "", "x",
        "the quick brown fox"))
      assert(roundtrip(s), s"byte-level roundtrip failed: '$s'")
    // alphabet bijectivity: 256 distinct chars, kept bytes self-map,
    // non-kept land in the private-use plane (never colliding with
    // the merge-product id range [256, 256+|merges|))
    val a = ByteAlphabet.byteToChar
    assert(a.distinct.length == 256)
    assert(a('t'.toInt) == 't' && a(0xE9) == 'é')
    assert(a(' '.toInt) >= 0xE000.toChar)
    assert(a.forall(c => c.toInt < 256 || c.toInt >= 0xE000))
    // mapped merges: ASCII symbols keep identity, space prefix maps
    val mm = ByteBpe.fixtureMergesMapped
    assert(mm.head == ("t", "h"))
    assert(mm.exists { case (l, _) => l == a(' '.toInt).toString })
  }

  test("byte-level totality PROPERTY: decode inverts encode on " +
      "arbitrary generated strings (one batched Spark job)") {
    import graft.functions.{ByteAlphabet, ByteBpe}
    import org.scalacheck.{Gen, rng}
    // arbitrary unicode strings incl. controls, supplementary planes,
    // and pathological space/NUL runs — seeded, so failures reproduce
    // fragments are VALID strings by construction (whole code
    // points, never raw UTF-16 units), so no case is filtered away
    val fragGen = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(" ", "\t", "\n", "\u0000", "\u0001"),
      2 -> Gen.choose(0x20, 0x2FFF)
        .map(cp => new String(Character.toChars(cp))),
      1 -> Gen.oneOf("😀", "🎉", "日", "本", "語", "č", "é"))
    val strGen = Gen.listOf(fragGen).map(_.mkString)
    val seed = rng.Seed(20260815L)
    val cases = Iterator.iterate((strGen.pureApply(
        Gen.Parameters.default, seed), seed.next)) { case (_, s) =>
        (strGen.pureApply(Gen.Parameters.default, s), s.next)
      }.map(_._1).take(200).toVector

    val bad = cases.zipWithIndex.toDF("text", "i")
      .select(col("i"), col("text"),
        ByteAlphabet.unicodeToByte(ByteBpe.bpeDecode(
          ByteBpe.bpeEncode(ByteAlphabet.byteToUnicode(col("text")),
            ByteBpe.fixtureMergesMapped),
          ByteBpe.fixtureMergesMapped)).as("rt"))
      .where(col("rt") =!= col("text"))
      .collect()
    assert(bad.isEmpty, s"roundtrip failed on ${bad.length} of " +
      s"${cases.size} generated strings; first: " +
      bad.headOption.map(r => r.getString(1).take(40)).orNull)
    assert(cases.size == 200)
  }

  test("bpeDecode inverts bpeEncode: ASCII, multi-byte UTF-8, " +
      "surrogate pairs; collision band + space runs documented") {
    def roundtrip(s: String): (String, Boolean) = {
      val r = Seq(Tuple1(s)).toDF("text")
        .select(
          TextAnalysis.bpeDecode(
            TextAnalysis.bpeEncode(col("text"))).as("rt"),
          (TextAnalysis.bpeDecode(
            TextAnalysis.bpeEncode(col("text"))) === col("text"))
            .as("ok"))
        .head
      (r.getString(0), r.getBoolean(1))
    }
    // lossless on single-spaced text whose chars avoid the id
    // collision band [256, 256 + merges.size)
    for (s <- Seq("the cat sat", "", "a", "the the the",
        "hello, world! 42.7 (x)",
        "café naïve",          // Latin-1 multi-byte UTF-8
        "привет мир", // Cyrillic
        "日本語 テスト",  // CJK
        "😀 ok 🎉"))          // non-BMP (surrogates)
      assert(roundtrip(s) == ((s, true)), s"roundtrip failed: '$s'")
    // stated contract boundary 1: a char whose code unit falls in
    // [256, 256+54) decodes as that rank's merge PRODUCT, not the
    // char (merges(0) = (t,h) -> "th" at id 256 = U+0100)
    assert(roundtrip("Ā") == (("th", false)))
    // ...and the band ends at 256 + merges.size: U+0136 is clean
    assert(roundtrip("Ķ")._2)
    // stated contract boundary 2: the GPT-2 pre-tokenizer keeps one
    // leading space per word; extra spaces in a run are dropped
    assert(roundtrip("a  b") == (("a b", false)))
    // whole corpus roundtrips (the fixture data is single-spaced
    // ASCII): decode(encode(text)) == text on every document
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
        (TextAnalysis.bpeDecode(TextAnalysis.bpeEncode(col("text")))
          === col("text")).as("ok"))
      .where(!col("ok")).count()
    assert(bad == 0L)
  }
}
