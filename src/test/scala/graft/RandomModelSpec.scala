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

  test("leakSafeSplit on random corpora: a partition of the corpus, " +
      "no near-dup pair ever straddles, singletons == splitAssign") {
    for (_ <- 1 to 2) {
      val corpus = randomCorpus(rnd.nextInt(120) + 60, vocab = 8)
      val df = corpus.toDF("doc_id", "text")
      val out = Dedup.leakSafeSplit(df, threshold = 0.3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out.map(_._1).toSet == corpus.map(_._1).toSet)
      val split = out.map(t => t._1 -> t._3).toMap
      val pairs = Dedup.minhashNearDups(df, threshold = 0.3)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.forall { case (a, b) => split(a) == split(b) })
      val perDoc = Dedup.splitAssign(df).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      out.filterNot(t => inPair(t._1)).foreach { case (id, rep, s) =>
        assert(rep == id && perDoc(id) == s)
      }
    }
  }

  test("SimHash64 / MinHashSig match their declarative twins on " +
      "random unicode corpora (multi-byte tokens, empties, repeats)") {
    val glyphs = Seq("wörd", "प्रलेख", "数据", "Ωmega", "a", "b-c", "наб")
    for (_ <- 1 to 3) {
      val corpus = (0 until rnd.nextInt(60) + 20).map { i =>
        val len = rnd.nextInt(10)   // includes < 3-token (shingle-less)
        (i.toLong, Seq.fill(len)(
          glyphs(rnd.nextInt(glyphs.size)) + rnd.nextInt(5))
          .mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      // SimHash: expression vs explode + 60-lane vote aggregate
      val fast = Dedup.simhash(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tok = df.select(col("doc_id").as("id"),
          explode(array_distinct(TextAnalysis.tokens(col("text"))))
            .as("tok"))
        .withColumn("h",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      val votes = (0 until 60).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
      val slow = tok.groupBy("id").agg(votes.head, votes.tail: _*)
        .select(col("id"), (0 until 60).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j))
            .otherwise(lit(0L))).reduce(_.bitwiseOR(_)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == slow)
      // MinHash: expression lanes vs explode + min aggregate lanes
      val sets = df.select(col("doc_id").as("id"),
        array_distinct(TextAnalysis.shingles(col("text"))).as("sh"))
      val sigFast = Dedup.signaturesFromSets(sets).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val ex = sets.select(col("id"), explode(col("sh")).as("x"))
        .select(col("id") +: (0 until 2).map(g =>
          md5(concat(lit(s"$g:"), col("x"))).as(s"h$g")): _*)
      val mins = (0 until 8).map(j =>
        min(substring(col(s"h${j / 4}"), (j % 4) * 8 + 1, 8))
          .as(s"m$j"))
      val sigSlow = ex.groupBy("id").agg(mins.head, mins.tail: _*)
        .select(col("id"), array((0 until 8).map(j =>
          col(s"m$j")): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
        .toMap
      assert(sigFast == sigSlow)
    }
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

  test("repeatedSpans matches the naive window-count model on random " +
      "corpora") {
    for (_ <- 1 to 3) {
      val corpus = randomCorpus(rnd.nextInt(80) + 40, vocab = 6)
      val n = 3
      // naive model over the same tokenization
      val model = corpus.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        toks.sliding(n).zipWithIndex.collect {
          case (w, i) if w.length == n => (w.mkString(" "), id, i)
        }
      }
      val expected = model.groupBy(_._1).collect {
        case (span, occ) if occ.map(_._2).distinct.size >= 2 =>
          val first = occ.map(o => (o._2, o._3)).min
          span -> (occ.map(_._2).distinct.size.toLong,
            occ.size.toLong, first._1, first._2.toLong)
      }.toMap
      val got = Dedup.repeatedSpans(corpus.toDF("doc_id", "text"), n = n)
        .collect()
        .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
      assert(got == expected)
    }
  }

  test("funnel matches the naive sequential-min model on random " +
      "event streams") {
    import java.sql.Timestamp
    val steps = Seq("A", "B", "C")
    for (_ <- 1 to 3) {
      val events = (0 until rnd.nextInt(300) + 100).map { i =>
        (i.toLong, rnd.nextInt(20).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
          steps(rnd.nextInt(3)), 0.0, "{}")
      }
      val df = events
        .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      // naive model: per user, strictly-after sequential first-times
      var reach = Map.empty[Int, Seq[(Long, Long)]] // step -> (user, lag_us)
      val byUser = events.groupBy(_._2)
      steps.zipWithIndex.foreach { case (st, k) =>
        val rows = byUser.toSeq.flatMap { case (u, evs) =>
          var t: Option[Long] = None
          var lag: Option[Long] = None
          var ok = true
          for (j <- 0 to k if ok) {
            val cand = evs.filter(e => e._4 == steps(j) &&
              t.forall(p => e._3.getTime * 1000L > p))
              .map(_._3.getTime * 1000L)
            if (cand.isEmpty) ok = false
            else { lag = t.map(cand.min - _); t = Some(cand.min) }
          }
          if (ok) Some((u, lag.getOrElse(0L))) else None
        }
        reach += k -> rows
      }
      val got = graft.operators.Relational.funnel(df, steps).collect()
        .map(r => r.getString(1) -> (r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
      steps.zipWithIndex.foreach { case (st, k) =>
        val exp = reach(k)
        assert(got(st)._1 == exp.size.toLong, s"step $st user count")
        if (k > 0 && exp.nonEmpty)
          assert(got(st)._2.contains(exp.map(_._2).sum), s"step $st lag")
      }
    }
  }

  test("upsertLatest matches the naive max-by-(ts, tie) model on " +
      "random change streams") {
    import java.sql.Timestamp
    for (_ <- 1 to 3) {
      val changes = (0 until rnd.nextInt(200) + 50).map { i =>
        (i.toLong, rnd.nextInt(15).toLong,
          // coarse ts grid to force (ts) ties broken by event_id
          new Timestamp(1700000000000L + rnd.nextInt(20) * 1000L),
          "t" + rnd.nextInt(2), i.toDouble, "p" + i)
      }
      val df = changes
        .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      val expected = changes.groupBy(c => (c._2, c._4)).map {
        case (k, vs) => k -> vs.maxBy(v => (v._3.getTime, v._1))._1
      }
      val got = graft.operators.Relational
        .upsertLatest(df, Seq("user_id", "event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
      assert(got == expected)
    }
  }

  test("histogram matches the naive IEEE binning model on random " +
      "columns") {
    for (_ <- 1 to 3) {
      val vals = Seq.fill(rnd.nextInt(300) + 50)(
        rnd.nextDouble() * 100 - 50)
      val buckets = rnd.nextInt(8) + 2
      val lo = vals.min
      val hi = vals.max
      val expected = vals.groupBy { v =>
        if (hi == lo) 0L
        else math.min(math.floor((v - lo) / ((hi - lo) / buckets)).toLong,
          buckets - 1L)
      }.map { case (b, vs) => b -> vs.size.toLong }
      val got = graft.operators.Profiler
        .histogram(vals.map(Tuple1(_)).toDF("x"), buckets = buckets)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == expected)
    }
  }

  test("dsirAffinity matches the naive hashed-bucket frequency-mean " +
      "model on random corpora (small vocab forces collisions)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String): Long =
      (BigInt(md5hex(g).substring(0, 15), 16) % 65536).toLong
    def grams(text: String): Seq[String] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length < 2) Nil
      else t.sliding(2).map(_.mkString(" ")).toSeq
    }
    for (_ <- 1 to 3) {
      val raw = randomCorpus(rnd.nextInt(80) + 20, vocab = 6)
      val target = randomCorpus(rnd.nextInt(40) + 10, vocab = 6)
        .map { case (id, t) => (id + 1000L, t) }
      val tg = target.flatMap(d => grams(d._2))
      val total = tg.size.toLong
      val freq = tg.groupBy(bucket).map { case (b, gs) =>
        b -> (1000000L * gs.size) / total
      }
      val expected = raw.map { case (id, text) =>
        val gs = grams(text)
        val n = gs.size.toLong
        val s = gs.map(g => freq.getOrElse(bucket(g), 0L)).sum
        val aff = if (n == 0) 0L
          else s / n + (if (2 * (s % n) >= n) 1L else 0L)
        id -> (n, aff)
      }.toMap
      val got = graft.operators.Curation
        .dsirAffinity(raw.toDF("doc_id", "text"),
          target.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == expected)
    }
  }
}
