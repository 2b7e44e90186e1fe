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
