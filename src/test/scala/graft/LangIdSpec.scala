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
}
