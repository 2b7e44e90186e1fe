package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Randomized model checks (seeded — deterministic across runs): the
  * round-6 operators against naive single-threaded reference models,
  * the same style as ProfilePropertiesSpec's merge-law checks.
  */
class RandomModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rnd = new Random(20260813L)

  private def randomCorpus(n: Int, vocab: Int = 12): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = rnd.nextInt(12)   // includes zero-token docs
      (i.toLong,
        Seq.fill(len)("w" + rnd.nextInt(vocab)).mkString(" "))
    }

  test("packSequences matches the naive per-shard prefix-sum model " +
      "on random corpora") {
    for (_ <- 1 to 3) {
      val corpus = randomCorpus(rnd.nextInt(150) + 30)
      val df = corpus.toDF("doc_id", "text")
      val budget = rnd.nextInt(40) + 10
      val out = Sampling.packSequences(df, tokenBudget = budget,
          nShards = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // naive model: recompute shard (same md5 arithmetic via the
      // engine, which the oracle gate already pins), then prefix sums
      out.groupBy(_._2).foreach { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).foreach { case (_, _, n, start, bin) =>
          assert(start == cum && bin == cum / budget)
          cum += n
        }
      }
      // every doc appears exactly once
      assert(out.map(_._1).toSet == corpus.map(_._1).toSet)
    }
  }

  test("splitAssign is a partition: every doc in exactly one split, " +
      "assignment unchanged on resampled subsets") {
    val ids = (0 until 400).map(_.toLong)
    val df = ids.toDF("doc_id")
    val full = Dedup.splitAssign(df).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.keySet == ids.toSet)
    assert(full.values.toSet.subsetOf(Set("test", "val", "train")))
    for (_ <- 1 to 3) {
      val subset = ids.filter(_ => rnd.nextBoolean())
      val sub = Dedup.splitAssign(subset.toDF("doc_id"))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(sub.forall { case (id, s) => full(id) == s })
    }
  }

  test("keepBest matches the naive max-by-(score, -id) model on " +
      "random corpora with planted duplicates") {
    val base = randomCorpus(60).filter(_._2.nonEmpty)
    // plant duplicates: same normalized text, higher id
    val dups = base.filter(_._1 % 3 == 0)
      .map { case (id, t) => (id + 1000L, "  " + t.toUpperCase) }
    val all = base ++ dups
    val df = all.toDF("doc_id", "text")
    val score = length(col("text")).cast("double")   // simple score
    val out = Dedup.keepBest(df, score)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // naive model over the same (fp, score=len, id) triples
    def norm(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ")
    val expected = all.groupBy(d => norm(d._2)).values.map { grp =>
      grp.minBy { case (id, t) => (-t.length.toLong, id) }._1
    }.toSet
    assert(out == expected)
  }

  test("corpusDiff matches the naive set model on random snapshots") {
    for (_ <- 1 to 3) {
      val n = rnd.nextInt(80) + 20
      val prev = (0 until n).map(i =>
        (i.toLong, "doc " + rnd.nextInt(10)))
      val cur = prev.filter(_ => rnd.nextBoolean())
        .map { case (id, t) =>
          if (rnd.nextBoolean()) (id, t + " edited") else (id, t) } ++
        Seq((9999L, "brand new"))
      val out = Dedup.corpusDiff(
          prev.toDF("doc_id", "text"), cur.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val curM = cur.toMap
      val prevM = prev.toMap
      val expected = (prevM.keySet ++ curM.keySet).map { id =>
        id -> ((prevM.get(id), curM.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "kept"
          case _ => "changed"
        })
      }.toMap
      assert(out == expected)
    }
  }

  test("lineDedup matches the naive distinct-doc-count model on " +
      "random lined corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (_ <- 1 to 3) {
      // small line vocabulary forces heavy cross-doc repetition;
      // occasional blank lines exercise the always-keep rule
      val corpus = (0 until rnd.nextInt(60) + 20).map { i =>
        val lines = Seq.fill(rnd.nextInt(6) + 1)(
          if (rnd.nextInt(8) == 0) "" else "line " + rnd.nextInt(6))
        (i.toLong, lines.mkString("\n"))
      }
      val maxDocs = rnd.nextInt(3) + 1
      val out = Dedup.lineDedup(corpus.toDF("doc_id", "text"),
          maxDocs = maxDocs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getString(3))).toMap
      val docLines = corpus.map { case (id, t) =>
        id -> t.split(java.util.regex.Pattern.quote("\n"), -1).toSeq }
      val banned = docLines
        .flatMap { case (id, ls) =>
          ls.filter(_.trim.nonEmpty).map(l => (md5hex(l.trim), id)) }
        .distinct.groupBy(_._1).filter(_._2.size > maxDocs).keySet
      val expected = docLines.map { case (id, ls) =>
        val kept = ls.filter(l =>
          l.trim.isEmpty || !banned(md5hex(l.trim)))
        id -> ((ls.size.toLong, kept.size.toLong, kept.mkString("\n")))
      }.toMap
      assert(out == expected)
    }
  }

  test("tokenBudgetSample matches the naive per-stratum fill model " +
      "on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (_ <- 1 to 3) {
      val corpus = (0 until rnd.nextInt(120) + 40).map { i =>
        (i.toLong, "s" + rnd.nextInt(4),
          Seq.fill(rnd.nextInt(9) + 1)("t").mkString(" "))
      }
      val budgets = Map("s0" -> rnd.nextInt(60).toLong,
        "s1" -> 0L, "s2" -> rnd.nextInt(25).toLong)
      val default = rnd.nextInt(20).toLong
      val out = Sampling.tokenBudgetSample(
          corpus.toDF("doc_id", "stratum", "text"), "stratum",
          budgets = budgets, defaultBudget = default).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      val expected = corpus.groupBy(_._2).flatMap { case (s, docs) =>
        val budget = budgets.getOrElse(s, default)
        var cum = 0L
        docs.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
          .flatMap { case (id, _, text) =>
            val n = text.split("\\s+").count(_.nonEmpty).toLong
            val start = cum; cum += n
            if (start < budget) Some(id -> start) else None
          }
      }
      assert(out == expected)
    }
  }

  test("shuffleOrder emits a stable permutation on random id sets " +
      "(duplicated runs agree; subsets keep relative order)") {
    val ids = rnd.shuffle((0L until 2000L).toList).take(500)
    val df = ids.toDF("doc_id")
    val a = Sampling.shuffleOrder(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a.values.toSeq.sorted == (0L until ids.size.toLong).toList)
    val b = Sampling.shuffleOrder(df.repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
    // a subset's relative order is the full set's restriction — the
    // property that makes budget top-ups and resharding reproducible
    val sub = ids.take(120)
    val s = Sampling.shuffleOrder(sub.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fullOrder = sub.sortBy(a)
    val subOrder = sub.sortBy(s)
    assert(fullOrder == subOrder)
  }

  test("scrubPii never leaves a matchable pattern behind (idempotent)") {
    val texts = Seq(
      "a@b.co x@y.org both", "ip 1.2.3.4 and 250.0.0.1",
      "+1-202-555-0100", "plain text", "a@b.io at 9.9.9.9 +49-30-99887766")
    val once = texts.toDF("text")
      .select(TextAnalysis.scrubPii(col("text")).as("t1"))
      .select(col("t1"), TextAnalysis.scrubPii(col("t1")).as("t2"))
      .collect()
    once.foreach { r => assert(r.getString(0) == r.getString(1)) }
  }
}
