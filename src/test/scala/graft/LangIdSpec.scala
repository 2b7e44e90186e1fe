package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LangIdCT
import graft.operators.TextAnalysis

/** Cavnar–Trenkle language ID: adversarial short/borrowed-vocabulary
  * docs the stopword argmax cannot see, unknown-fallback edges, and
  * the learned-profile path.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val fixturePms = LangIdCT.profiles.map { case (l, gs) =>
    l -> {
      val m = new java.util.HashMap[String, Integer]()
      gs.zipWithIndex.foreach { case (g, i) => m.put(g, i + 1) }
      m
    }
  }
  private def predict(s: String): String =
    LangIdCT.predict(s, fixturePms, LangIdCT.K, LangIdCT.M)

  test("function-word-free German compound: trigrams see what stopwords can't") {
    // no de stopword (der/die/und/...) appears, so the stopword argmax
    // is blind; 'sch', 'ein', 'er ' are high-rank de profile grams
    assert(predict("scheinwerfer") == "de")
    val stopword = Seq(Tuple1("scheinwerfer")).toDF("text")
      .select(TextAnalysis.langId(col("text"))).head.getString(0)
    assert(stopword == "unknown")
  }

  test("short English") {
    assert(predict("the weather is nothing") == "en")
  }

  test("short Spanish morphology (que/qu hits)") {
    assert(predict("quisiera quedarse aqui") == "es")
  }

  test("short French (les/es /le hits)") {
    assert(predict("les autres fenetres") == "fr")
  }

  test("unknown fallbacks: empty, digits-only, no profile overlap") {
    assert(predict("") == "unknown")
    assert(predict("12345 678") == "unknown")
    assert(predict("zzz qqq xxxx") == "unknown")
  }

  test("null text -> null prediction") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(TextAnalysis.langIdNgram(col("text"))).head
    assert(r.isNullAt(0))
  }

  test("normalization: case and punctuation are invisible") {
    assert(predict("ScheinWERFER!!") == predict("scheinwerfer"))
  }

  test("langProfiles ranks by count desc then gram asc") {
    val rows = TextAnalysis
      .langProfiles(Seq(("x", "aaa")).toDF("lang", "text"),
        langCol = "lang", depth = 10)
      .orderBy("pr").collect()
      .map(r => (r.getString(1), r.getInt(2)))
    // ' aaa ' has trigrams ' aa', 'aaa', 'aa ' once each -> gram order
    assert(rows.toSeq == Seq((" aa", 1), ("aa ", 2), ("aaa", 3)))
  }

  test("langProfiles plan: the rank window is lang-partitioned, " +
      "never a global single partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wins = TextAnalysis.langProfiles(docs)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("learned profiles separate disjoint vocabularies") {
    val train = Seq(
      ("aa", "alpha beta gamma delta alpha beta"),
      ("bb", "uno dos tres cuatro uno dos")).toDF("lang", "text")
    val score = Seq((1L, "beta gamma"), (2L, "dos cuatro"))
      .toDF("id", "text")
    val out = TextAnalysis
      .langIdLearned(score, train, depth = 40)
      .orderBy("id").collect().map(_.getAs[String]("lang_pred"))
    assert(out.toSeq == Seq("aa", "bb"))
  }

  // ---- adversarial depth cases (round 12, verdict stretch item):
  // the Cavnar-Trenkle paper's own motivation is that SHALLOW
  // profiles only hold a language's shared high-frequency head, so
  // closely-related languages (or dialects sharing a core
  // vocabulary) need profile DEPTH — the separating trigrams live in
  // the rank tail. Two synthetic languages sharing an identical
  // dominant vocabulary, differing only in rare morphology:

  // The tail words share NO trigram with the head (checked: head
  // grams are the 14 count-5 trigrams of " nava lora timi ", tails
  // contribute only z/k/b/u/y/o grams), so the languages' depth-10
  // profiles are IDENTICAL — exactly the shared-core-vocabulary
  // trap — while the depth-100 profiles carry the separating tail.
  private val sharedHead = Array.fill(5)("nava lora timi").mkString(" ")
  private val deepTrain = Seq(
    ("xx", s"$sharedHead zuko buko"),
    ("yy", s"$sharedHead zuky buky")).toDF("lang", "text")

  test("depth: shallow learned profiles are blind to tail morphology " +
      "(unknown), deep profiles separate it") {
    // held-out doc is PURE tail vocabulary — at depth 10 both learned
    // profiles contain only the (identical) shared-head trigrams, so
    // no doc gram hits any profile -> the unknown fallback; at depth
    // 100 the tail trigrams are in-profile and separate the languages
    // (for "zuky" the shared prefix grams ' zu'/'zuk' hit BOTH
    // profiles — only the suffix 'uky'/'ky ' decides)
    val score = Seq((1L, "zuky"), (2L, "buko")).toDF("id", "text")
    val shallow = TextAnalysis.langIdLearned(score, deepTrain,
        depth = 10).orderBy("id")
      .collect().map(_.getAs[String]("lang_pred"))
    assert(shallow.toSeq == Seq("unknown", "unknown"),
      s"shallow profiles should be blind, got ${shallow.toSeq}")
    val deep = TextAnalysis.langIdLearned(score, deepTrain,
        depth = 100).orderBy("id")
      .collect().map(_.getAs[String]("lang_pred"))
    assert(deep.toSeq == Seq("yy", "xx"))
  }

  test("depth: borrowed shared vocabulary ties shallow profiles " +
      "(lexicographic default = silent misclassification), depth " +
      "breaks the tie correctly") {
    // the adversarial case: a true-yy doc dominated by the SHARED
    // head plus one tail word. Shallow profiles score both languages
    // identically on the shared grams -> tie -> lexicographic first
    // profile (xx) wins, a WRONG but deterministic answer; deep
    // profiles see the yy-only trigrams and flip it
    val score = Seq(Tuple1("nava lora timi zuky")).toDF("text")
    def pred(depth: Int): String =
      TextAnalysis.langIdLearned(score, deepTrain, depth = depth)
        .head.getAs[String]("lang_pred")
    assert(pred(10) == "xx")   // tie-broken, wrong
    assert(pred(100) == "yy")  // tail-separated, right
  }

  test("K knob: a small doc profile keeps only the dominant head " +
      "and follows it; a large K admits the tail evidence") {
    // mixed doc: shared head repeated (dominant) + one yy tail word.
    // k=3 keeps only the top-3 doc grams (all shared head, count 5)
    // -> tie -> xx; the default K=20 fits the tail grams too -> yy
    val doc = s"$sharedHead zuky"
    val score = Seq(Tuple1(doc)).toDF("text")
    val prof = TextAnalysis.langProfiles(deepTrain, depth = 100)
      .collect().groupBy(_.getString(0)).toSeq
      .map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(2)).map(_.getString(1)).toSeq }
      .sortBy(_._1)
    def predK(k: Int): String =
      score.select(graft.functions.LangIdCT.langIdCT(col("text"),
          prof, k = k, m = 100).as("p")).head.getString(0)
    assert(predK(3) == "xx")
    assert(predK(20) == "yy")
  }

  test("fixture profiles survive borrowed vocabulary: loanwords " +
      "don't flip the matrix language") {
    // en sentence with es loanwords and vice versa — the rank-order
    // metric keeps following the function-word trigrams
    assert(predict("the fiesta and the siesta of the patio") == "en")
    assert(predict("la fiesta que pasamos en el patio de la casa") == "es")
    // de with en loanwords (no de stopword list dependency)
    assert(predict("die software und der schein von dem ding") == "de")
  }
}
