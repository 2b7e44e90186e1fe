package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Behavior checks for the training-data-pipeline operators: dedup
  * family agreement, LSH recall against the brute-force baseline, and
  * determinism of the hash-derived primitives.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "the  quick   brown fox jumps over the lazy dog"), // exact dup of 0 mod ws
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"))    // exact dup of 0

  lazy val df = docs.toDF("doc_id", "text")

  test("exactGroups: whitespace-normalized dups collapse") {
    val g = Dedup.exactGroups(df).collect()
    val byFp = g.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byFp.exists { case (_, n, keep) => n == 3 && keep == 0L })
    assert(g.length == 3)  // {0,2,4}, {1}, {3}
  }

  test("exactDedup keeps lowest id per group") {
    val kept = Dedup.exactDedup(df).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 1L, 3L))
  }

  test("minhash: identical shingle sets give identical signatures") {
    val sigs = Dedup.minhashSignatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(0L) == sigs(2L) && sigs(0L) == sigs(4L))
    assert(sigs(0L) != sigs(3L))
  }

  test("minhashNearDups finds near-dups, skips unrelated") {
    val pairs = Dedup.minhashNearDups(df, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 1L)))   // jaccard(0,1) = 5/9 ≈ 0.56
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: dup docs identical, near-dups close, unrelated far") {
    val sims = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) == sims(2L) && sims(0L) == sims(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(0L), sims(1L)) < ham(sims(0L), sims(3L)))
  }

  test("SimHash64: the compiled row-local fold is bit-identical to " +
      "the explode + 60-lane vote-aggregate composition, and a " +
      "token-less doc drops like the explode path") {
    import graft.operators.TextAnalysis
    val withEmpty = df.select("doc_id", "text").unionByName(
      Seq((99L, "")).toDF("doc_id", "text"))
    val fast = Dedup.simhash(withEmpty).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pre-round-10 declarative twin, inlined
    val tok = withEmpty.select(col("doc_id").as("id"),
      explode(array_distinct(TextAnalysis.tokens(col("text"))))
        .as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
    val slow = tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), (0 until 60).map(j =>
        when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow && fast.nonEmpty)
    assert(!fast.contains(99L))
  }

  test("simhashNearDups: hot buckets capped to exact-simhash chains") {
    // degenerate corpus: 40 verbatim copies — every pigeonhole block
    // lands in one bucket, which the cap must route to O(m) chain
    // links instead of C(40,2)=780 pairwise rows
    val boiler = (100L until 140L)
      .map(i => (i, "identical boilerplate legal footer repeated verbatim"))
    val all = (docs ++ boiler).toDF("doc_id", "text")
    val capped = Dedup.simhashNearDups(all, maxBucket = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hot = capped.filter(p => p._1 >= 100L && p._2 >= 100L)
    assert(hot.length == 39)                       // chain, not m²
    assert(hot.forall(p => p._1 == 100L && p._3 == 0L))
    // pairs among the base docs are untouched by the cap
    val uncapped = Dedup.simhashNearDups(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = capped.filter(p => p._1 < 100L && p._2 < 100L).toSet
    assert(base == uncapped)
  }

  test("jaccardNearDups exact jaccard on candidates") {
    val pairs = Dedup.jaccardNearDups(df, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs((0L, 2L)) == 1.0)
    // docs 0/1 differ in the last token: 6 shared of 8 distinct trigrams
    assert(pairs((0L, 1L)) == 0.75)
  }

  test("shingles: n-gram window math") {
    val sh = df.filter($"doc_id" === 0)
      .select(TextAnalysis.shingles($"text").as("sh"))
      .head.getSeq[String](0)
    assert(sh.length == 7)   // 9 tokens -> 7 trigrams
    assert(sh.head == "the quick brown")
  }

  lazy val vecs = SparkTestBase.spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Clustered vectors (the workload LSH exists for): 40 clusters of 8
    * members, 16-dim, deterministic trig-based centers + small noise.
    */
  lazy val clustered = {
    val rows = for {
      cl <- 0 until 40
      m <- 0 until 8
    } yield {
      val vec = (0 until 16).map { d =>
        (math.sin(cl * 16 + d) + 0.05 * math.sin(m * 97 + d * 13)).toFloat
      }
      (cl * 8L + m, vec)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("dupSizeHistogram: cluster sizes, doc counts and removable " +
      "counts over the docs fixture") {
    // docs: {0,2,4} one cluster of 3; {1} and {3} singletons
    val got = Dedup.dupSizeHistogram(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 2L, 0L), (3L, 1L, 3L, 2L)))
  }

  test("fuzzyPairs: blocked levenshtein finds whitespace/word " +
      "variants within the threshold, misses cross-block edits by " +
      "design, and drops oversized blocks whole") {
    // docs fixture: 0/2/4 are ws-normalized equal (dist 0), 1 differs
    // by dog->cat (dist 3, outside maxDist=2), 3 is another block
    val got = Dedup.fuzzyPairs(df, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set((0L, 2L, 0L), (0L, 4L, 0L), (2L, 4L, 0L)))
    // widening the threshold admits the dog->cat substitutions
    val wide = Dedup.fuzzyPairs(df, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(wide == got.toSet ++ Set((0L, 1L, 3L), (1L, 2L, 3L),
      (1L, 4L, 3L)))
    // an edit INSIDE the blocking prefix lands in another block —
    // the documented recall loss of blocking
    val crossBlock = df.union(Seq(
      (5L, "xhe quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text"))
    val pairs5 = Dedup.fuzzyPairs(crossBlock, maxDist = 2)
      .filter($"id1" === 5L || $"id2" === 5L).count()
    assert(pairs5 == 0L)
    // hot-block guard: capping below the block size drops it whole
    assert(Dedup.fuzzyPairs(df, maxDist = 2, maxBlock = 2L)
      .count() == 0L)
  }

  test("autoPrefixLen: doubles until the heaviest block fits the " +
      "occupancy target; fuzzyPairsAuto ≡ fuzzyPairs at the derived " +
      "depth") {
    // 10 docs sharing an 8-char prefix, distinct by char 9: at
    // prefix 4 and 8 one block holds all 10; at 16 each is alone
    val docs10 = (0 until 10)
      .map(i => (i.toLong, s"samepref!doc$i body text here"))
      .toDF("doc_id", "text")
    assert(Dedup.autoPrefixLen(docs10, targetOccupancy = 3L) == 16)
    assert(Dedup.autoPrefixLen(docs10, targetOccupancy = 10L) == 4)
    // maxLen clamps even when the target is unreachable (true dups)
    val dups = (0 until 10).map(i => (i.toLong, "identical text"))
      .toDF("doc_id", "text")
    assert(Dedup.autoPrefixLen(dups, targetOccupancy = 3L) == 32)
    // empty corpus: first probe sees no blocks, stays at minLen
    assert(Dedup.autoPrefixLen(docs10.limit(0)) == 4)
    val auto = Dedup.fuzzyPairsAuto(df, targetOccupancy = 10L)
      .collect().toSeq.map(_.toSeq)
    val fixed = Dedup.fuzzyPairs(df,
        prefixLen = Dedup.autoPrefixLen(df, targetOccupancy = 10L))
      .collect().toSeq.map(_.toSeq)
    assert(auto == fixed)
  }

  test("connectedGroups: transitive min-label over the pair graph") {
    // chain 1-2-3-4 (needs several propagation rounds), plus two more
    // components — reps must be the component-wide minimum ids
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (5L, 6L), (8L, 9L),
      (7L, 8L)).toDF("id1", "id2")
    val g = Dedup.connectedGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    // the distributed pointer-jumping path (localEdgeLimit = 0 forces
    // it) must produce the identical labeling
    val gd = Dedup.connectedGroups(pairs, localEdgeLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gd == g)
  }

  test("connectedGroups: empty pair list yields empty labels, both paths") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedGroups(empty).count() == 0)
    assert(Dedup.connectedGroups(empty, localEdgeLimit = 0L).count() == 0)
  }

  test("IVF topk: probing every list reproduces brute force exactly") {
    val queries = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    val ivfAll = Similarity.ivfTopK(clustered, queries, k = 5,
        nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(ivfAll == exact)
    // partial probing is a subset of the right answers with recall > 0
    val ivf2 = Similarity.ivfTopK(clustered, queries, k = 5,
        nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    assert(ivf2.nonEmpty)
    assert((ivf2 & exactSet).nonEmpty)
  }

  test("trained IVF: probing every kmeans list reproduces brute " +
      "force exactly; partial probes keep recall on clustered data") {
    val queries = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    val all = Similarity.ivfTopKTrained(clustered, queries, k = 5,
        kClusters = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(all == exact)
    val part = Similarity.ivfTopKTrained(clustered, queries, k = 5,
        kClusters = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    assert(part.nonEmpty && (part & exactSet).nonEmpty)
  }

  test("PQ topk: a lossless codebook (every vector is a centroid) " +
      "reproduces the exact squared-L2 ranking; lossy PQ keeps " +
      "recall on clustered vectors") {
    // 16 vectors, codebookSize 16 -> the sampled codebook IS the
    // corpus, every vector encodes to itself with d2 = 0, and the ADC
    // sum equals the exact (ppm-floored) squared L2 per subspace
    val tiny = clustered.filter($"vec_id" < 16)
    val queries = tiny.filter($"vec_id" < 3)
    val rows = tiny.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2ppm(a: Array[Float], b: Array[Float], j: Int): Long = {
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var s = 0.0; var i = j * 4
        while (i < j * 4 + 4) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      math.floor((dot(a, a) + dot(b, b) - 2.0 * dot(a, b)) * 1e6 + 0.5)
        .toLong
    }
    val expected = queries.collect().map(_.getLong(0)).flatMap { q =>
      rows.keys.filter(_ != q).toSeq
        .map(n => (q, n, (0 until 4).map(j => d2ppm(rows(q), rows(n), j))
          .sum))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, n, d, i + 1L) }
    }.sortBy(t => (t._1, t._4)).toSeq
    val got = Similarity.pqTopK(tiny, queries, k = 5, m = 4,
        codebookSize = 16, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // lossy regime: 8 codebook entries over the clustered corpus must
    // still put same-cluster members in front (recall > 0)
    val q2 = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(clustered, q2, k = 5, m = 4,
        codebookSize = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.nonEmpty && (pq & exact).nonEmpty)
  }

  test("hardNegatives: only different-label neighbors rank, ordered " +
      "by cosine with id tie-break") {
    // axis-aligned vectors: cosines are exact 0/1; labels split the
    // x-axis group so same-label exclusion is observable
    val vecs = Seq(
      (0L, Seq(1f, 0f), 0),    // query, label 0
      (1L, Seq(1f, 0f), 0),    // same label — must never appear
      (2L, Seq(1f, 0f), 1),    // different label, cosine 1
      (3L, Seq(2f, 0f), 1),    // different label, cosine 1 (tie by id)
      (4L, Seq(0f, 1f), 1))    // different label, cosine 0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs,
        vecs.filter($"vec_id" === 0L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 1L, 1.0, 1L),
      (0L, 0L, 3L, 1L, 1.0, 2L),
      (0L, 0L, 4L, 1L, 0.0, 3L)))
  }

  test("centroidDrift: hand-computed integer centroids, identical " +
      "snapshots read 1e6 ppm, inner join drops one-sided labels") {
    val prev = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 0),  // centroid (.5, .5)
      (2L, Seq(1f, 1f), 1),
      (3L, Seq(1f, 0f), 2))                        // label 2 only in prev
      .toDF("vec_id", "embedding", "label")
    val cur = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0f), 0),  // centroid (1, 0)
      (2L, Seq(1f, 1f), 1),
      (4L, Seq(0f, 1f), 3))                        // label 3 only in cur
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(prev, cur)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // label 0: cos((.5,.5),(1,0)) = 1/sqrt(2) → 707107 ppm
    // label 1: identical centroid → exactly 1e6
    // labels 2/3: one-sided → dropped
    assert(got == Seq((0, 2L, 2L, 707107L), (1, 1L, 1L, 1000000L)))
  }

  test("SQ8 topk: asymmetric scoring matches a hand replay of the " +
      "integer quantization; per-dim span == levels-1 is lossless") {
    val tiny = clustered.filter($"vec_id" < 12)
    val queries = tiny.filter($"vec_id" < 3)
    val dim = 16
    val rows: Map[Long, Array[Long]] = tiny.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong)
        .toArray).toMap
    val lo = (0 until dim).map(i => rows.values.map(_(i)).min).toArray
    val span = (0 until dim)
      .map(i => math.max(rows.values.map(_(i)).max - lo(i), 1L)).toArray
    def recon(u: Array[Long]): Array[Long] = (0 until dim).map { i =>
      val code = (u(i) - lo(i)) * 255L / span(i)
      lo(i) + (code * span(i) * 2L + 255L) / 510L
    }.toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until dim).map { i => val d = a(i) - b(i); d * d }.sum
    val expected = queries.collect().map(_.getLong(0)).flatMap { q =>
      rows.keys.filter(_ != q).toSeq
        .map(n => (q, n, d2(rows(q), recon(rows(n)))))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, n, d, i + 1L) }
    }.sortBy(t => (t._1, t._4)).toSeq
    val got = Similarity.sq8TopK(tiny, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)

    // lossless regime: micro components all in [0, 255] make every
    // dim's span exactly 255 = levels-1, so code = u-lo and the
    // reconstruction is the identity — SQ8 ranking must equal the
    // exact micro squared-L2 ranking
    val exactRows = (0L until 10L).map { id =>
      (id, (0 until 4).map(i =>
        (((id * 37 + i * 13) % 251).toFloat * 1e-6f)).toSeq)
    } ++ Seq((10L, Seq(0f, 0f, 0f, 0f)),
      (11L, Seq(255e-6f, 255e-6f, 255e-6f, 255e-6f)))
    val lossless = exactRows.toDF("vec_id", "embedding")
    val um: Map[Long, Array[Long]] = exactRows.map { case (id, v) =>
      id -> v.map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray
    }.toMap
    val wantExact = um.keys.filter(_ < 2).toSeq.sorted.flatMap { q =>
      um.keys.filter(_ != q).toSeq
        .map(n => (q, n, (0 until 4).map { i =>
          val d = um(q)(i) - um(n)(i); d * d }.sum))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, n, d, i + 1L) }
    }
    val gotExact = Similarity.sq8TopK(lossless,
        lossless.filter($"vec_id" < 2), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(gotExact == wantExact)

    // lossy regime on the clustered corpus: byte codes must still
    // recover most exact neighbors
    val q2 = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.sq8TopK(clustered, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq.nonEmpty && (sq & exact).size * 2 >= exact.size)

    // empty corpus: no ranges, empty result
    assert(Similarity.sq8TopK(tiny.limit(0), queries).count() == 0L)
  }

  test("IVF-SQ8: probing every list reproduces the full-scan SQ8 " +
      "ranking exactly; partial probes keep recall; empty corpus is " +
      "empty") {
    val queries = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val full = Similarity.sq8TopK(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val ivfAll = Similarity.ivfSq8TopK(clustered, queries, k = 5,
        nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(ivfAll == full && full.nonEmpty)
    // pruned probing still recovers most full-scan answers on the
    // clustered corpus (the recall/work trade the routing buys)
    val part = Similarity.ivfSq8TopK(clustered, queries, k = 5,
        nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullSet = full.map(t => (t._1, t._2)).toSet
    assert(part.nonEmpty && (part & fullSet).nonEmpty)
    assert(Similarity.ivfSq8TopK(clustered.limit(0), queries)
      .count() == 0L)
    // the persisted ccid-partitioned index serves the SAME answer as
    // the direct plan — codes/routing/scoring are all deterministic
    // integers, so the round-trip is bit-equal
    val dir = java.nio.file.Files
      .createTempDirectory("ivfsq8_spec").toString
    val served = Similarity.ivfSq8TopKServed(clustered, queries, dir,
        k = 5, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val direct = Similarity.ivfSq8TopK(clustered, queries, k = 5,
        nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(served == direct && direct.nonEmpty)
    // and the on-disk layout really is one directory per coarse list
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ccid=")).map(_.getName).sorted
    assert(parts.nonEmpty && parts.forall(_.matches("ccid=\\d+")))
  }

  test("trained PQ: k-means with one seed per vector is a fixed point " +
      "(lossless codebook), so ADC reproduces the exact integer-micro " +
      "squared-L2 ranking; lossy trained PQ keeps recall") {
    // 16 vectors, codebookSize 16 -> every vector seeds its own
    // cluster, assigns to itself at d = 0, and the centroid update
    // leaves it in place — Lloyd's fixed point. Each vector then
    // encodes to itself per subspace and the ADC sum is the exact
    // whole-vector squared L2 in integer-micro² units.
    val tiny = clustered.filter($"vec_id" < 16)
    val queries = tiny.filter($"vec_id" < 3)
    val rows = tiny.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray
          .map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = queries.collect().map(_.getLong(0)).flatMap { q =>
      rows.keys.filter(_ != q).toSeq
        .map(n => (q, n, d2(rows(q), rows(n))))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, n, d, i + 1L) }
    }.sortBy(t => (t._1, t._4)).toSeq
    val got = Similarity.pqTopKTrained(tiny, queries, k = 5, m = 4,
        codebookSize = 16, iters = 2, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // lossy regime: 8 trained entries per subspace over the clustered
    // corpus must still put same-cluster members in front
    val q2 = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopKTrained(clustered, q2, k = 5, m = 4,
        codebookSize = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.nonEmpty && (pq & exact).nonEmpty)
  }

  test("contaminationReport: per-test exposure counts and ppm on a " +
      "hand-built overlap") {
    // 10-token texts -> 3 distinct 8-grams each; t1 shares its first
    // 8-gram with train doc 1 (and only that one)
    val base = (1 to 10).map(i => s"w$i").mkString(" ")         // w1..w10
    val shifted = ((2 to 11).map(i => s"w$i")).mkString(" ")    // w2..w11
    val train = Seq((1L, base), (2L, "a b c")).toDF("doc_id", "text")
    val test = Seq((10L, shifted), (11L, "x y z"), (12L, "short"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationReport(train, test).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // shifted has 8-grams (w2..w9, w3..w10, w4..w11); base has
    // (w1..w8, w2..w9, w3..w10) -> 2 shared, from 1 train doc;
    // exposure = round-half-up(2e6/3) = 666667
    assert(got(10L) == (3L, 2L, 1L, 666667L))
    // no overlap and zero-gram docs
    assert(got(11L) == (0L, 0L, 0L, 0L))
    assert(got(12L) == (0L, 0L, 0L, 0L))
  }

  test("IVF-PQ topk: one coarse list + lossless residual codebook " +
      "reproduces the exact residual-space L2 ranking") {
    // nlist=1 -> every vector shares ONE coarse centroid c (the
    // md5-min sample), residual = v - c; codebookSize = corpus size
    // -> every residual encodes to itself, so the ADC sum is the
    // exact ppm-floored squared L2 between residuals — replicated
    // here with the same |a|²+|b|²-2ab formula per subspace
    val tiny = clustered.filter($"vec_id" < 16)
    val queries = tiny.filter($"vec_id" < 3)
    val rows = tiny.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cId = rows.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).head
    val res: Map[Long, Array[Double]] = rows.map { case (id, v) =>
      id -> v.indices.map(i =>
        v(i).toDouble - rows(cId)(i).toDouble).toArray
    }
    def d2ppm(a: Array[Double], b: Array[Double], j: Int): Long = {
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = j * 4
        while (i < j * 4 + 4) { s += x(i) * y(i); i += 1 }
        s
      }
      math.floor((dot(a, a) + dot(b, b) - 2.0 * dot(a, b)) * 1e6 + 0.5)
        .toLong
    }
    val expected = queries.collect().map(_.getLong(0)).flatMap { q =>
      rows.keys.filter(_ != q).toSeq
        .map(n => (q, n, (0 until 4).map(j => d2ppm(res(q), res(n), j))
          .sum))
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, n, d, i + 1L) }
    }.sortBy(t => (t._1, t._4)).toSeq
    val got = Similarity.ivfPqTopK(tiny, queries, k = 5, nlist = 1,
        nprobe = 1, m = 4, codebookSize = 16, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("LSH topk recall ≥ 0.8 vs brute force on clustered vectors") {
    val queries = clustered.filter($"vec_id" % 8 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(clustered, queries, k = 5,
        tables = 8, planesPerTable = 6, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("LSH near-dups find the same-cluster pairs exact search finds") {
    val exact = Similarity.exactNearDups(clustered, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Similarity.embeddingNearDups(clustered, threshold = 0.99,
        tables = 8, planesPerTable = 6, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & viaLsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
  }

  test("hyperplanes deterministic") {
    assert(Similarity.hyperplanes(4, 8) == Similarity.hyperplanes(4, 8))
  }

  test("cosine: self-similarity is 1") {
    val one = vecs.limit(1)
    val s = Similarity.exactNearDups(
      one.union(one.withColumn("vec_id", lit(999L))), threshold = 0.99)
    assert(s.head.getDouble(2) == 1.0)
  }

  test("repeatedSpans: cross-doc trigram spans, hand-computed") {
    // docs 0,2,4 tokenize identically; doc1 differs only in the last
    // token; doc3 shares nothing. 6 leading trigrams appear in 4 docs,
    // "the lazy dog" in 3; "the lazy cat" is single-doc -> excluded.
    val spans = Dedup.repeatedSpans(df, n = 3).collect()
    assert(spans.length == 7)
    val byText = spans.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byText("the quick brown") == (4L, 4L, 0L, 0L))
    assert(byText("over the lazy") == (4L, 4L, 0L, 5L))
    assert(byText("the lazy dog") == (3L, 3L, 0L, 6L))
    assert(!byText.contains("the lazy cat"))
  }

  test("repeatedSpans: within-doc repeats counted in n_occurrences") {
    val d2 = Seq((5L, "a b c a b c"), (6L, "a b c x")).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(d2, n = 3).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // "a b c" occurs at doc5 pos 0 and 3, doc6 pos 0
    assert(out == Map("a b c" -> (2L, 3L, 5L, 0L)))
  }

  private lazy val exactSubstrDocs = Seq(
    (0L, "p q r s t u"),        // fully duplicated by doc 3
    (1L, "x p q r s y z w"),    // shares the interior "p q r s"
    (2L, "m n o"),              // clean
    (3L, "p q r s t u"))        // exact copy of doc 0
    .toDF("doc_id", "text")

  test("duplicateRegions: overlapping duplicated windows merge into " +
      "one maximal region, hand-computed") {
    val regs = Dedup.duplicateRegions(exactSubstrDocs, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc0/doc3: windows 0..3 all duplicated -> one region [0,5];
    // doc1: windows 1,2 ("p q r","q r s") -> region [1,4]; doc2: none
    assert(regs.toSeq == Seq((0L, 0L, 5L, 4L), (1L, 1L, 4L, 2L),
      (3L, 0L, 5L, 4L)))
  }

  test("duplicateRegions: a gap splits islands — two disjoint " +
      "duplicated regions in one doc") {
    val d = Seq((10L, "a b c Z d e f"), (11L, "a b c Q d e f"))
      .toDF("doc_id", "text")
    val regs = Dedup.duplicateRegions(d, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // shared "a b c" (pos 0) and "d e f" (pos 4); pos 4 > 2+1 ->
    // separate islands [0,2] and [4,6] in both docs
    assert(regs.toSeq == Seq(
      (10L, 0L, 2L, 1L), (10L, 4L, 6L, 1L),
      (11L, 0L, 2L, 1L), (11L, 4L, 6L, 1L)))
  }

  test("duplicateRegionsBytes: maximal shared char ranges of ANY " +
      "length >= minChars; the n-token operator's blind spot is the " +
      "contract boundary") {
    // 52-char shared run = 10 words of 4+1 chars + 'tail99' — only 7
    // tokens longer than 6... construct precisely: a shared phrase of
    // SEVEN tokens spanning >= 50 chars. Seven 7-char words + six
    // separators = 55 chars — dup_regions at n = 8 tokens cannot see
    // it; the byte operator must.
    val phrase = (1 to 7).map(i => s"shared$i").mkString(" ") // 55 chars
    assert(phrase.length == 55)
    val d = Seq(
      (0L, s"$phrase alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"iota kappa lambdaQ muX nuY xiZ omicron pi rho $phrase"))
      .toDF("doc_id", "text")
    // token-level ExactSubstr at n=8 is blind: the shared run is only
    // 7 tokens
    assert(Dedup.duplicateRegions(d, n = 8).count() == 0L)
    val regs = Dedup.duplicateRegionsBytes(d, minChars = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // maximal range recovery: doc0 carries the phrase at chars
    // [0, 54], doc1 at [46, 100] (46 prefix chars before it)
    assert(regs.toSeq == Seq((0L, 0L, 54L), (1L, 46L, 100L)))
    // sub-minChars shared text is below the declared contract
    val short = Seq((0L, "tiny shared bit plus aaaaaaaa"),
      (1L, "tiny shared bit plus bbbbbbbb")).toDF("doc_id", "text")
    assert(Dedup.duplicateRegionsBytes(short, minChars = 50)
      .count() == 0L)
    // ...and lowering minChars exposes it with exact char offsets
    val lower = Dedup.duplicateRegionsBytes(short, minChars = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // shared prefix "tiny shared bit plus " is 21 chars: [0, 20]
    assert(lower.toSeq == Seq((0L, 0L, 20L), (1L, 0L, 20L)))
    // docs shorter than minChars emit no windows and never crash
    val tiny = Seq((0L, "x"), (1L, "x")).toDF("doc_id", "text")
    assert(Dedup.duplicateRegionsBytes(tiny).count() == 0L)
  }

  test("duplicateRegionsRolling: the O(1)-per-char rolling-hash path " +
      "returns exactly the md5 variant's regions on the corpus " +
      "sample; incremental hashes match the closed form") {
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val md5Regs = Dedup.duplicateRegionsBytes(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val rollRegs = Dedup.duplicateRegionsRolling(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rollRegs == md5Regs && md5Regs.nonEmpty)
    // the incremental slide equals the direct polynomial evaluation
    // (the oracle's closed form), wrap-around included
    val M = graft.functions.RollingHash.M
    val s = "sliding window polynomial check with unicode: čafé日"
    val w = 7
    val got = Seq(Tuple1(s)).toDF("text")
      .select(graft.functions.RollingHash
        .rollingWindowHash(col("text"), w))
      .head.getSeq[Long](0)
    val cps = s.codePoints().toArray
    val direct = (0 to cps.length - w).map { p =>
      (0 until w).foldLeft(0L)((h, t) => h * M + cps(p + t))
    }
    assert(got == direct)
    // shorter-than-width strings yield an empty array, null stays null
    val edge = Seq(("ab", 1), (null.asInstanceOf[String], 2))
      .toDF("text", "k")
      .select(graft.functions.RollingHash
        .rollingWindowHash(col("text"), w).as("h"), col("k"))
      .collect().map(r => r.getInt(1) -> Option(r.get(0))).toMap
    assert(edge(1).exists(_.asInstanceOf[scala.collection.Seq[_]]
      .isEmpty))
    assert(edge(2).isEmpty)
  }

  test("rerankExact: refined top-k is the exact-cosine order over " +
      "exactly the shortlist members, never beyond it") {
    val e = vecs
    val q = e.filter(col("vec_id") < 5)
    val short20 = Similarity.ivfPqTopKTrained(e, q, k = 20)
    val got = Similarity.rerankExact(e, q, short20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val members = short20.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every refined row comes from the shortlist
    assert(got.forall { case (qid, nid, _) => members((qid, nid)) })
    // and per query the order is the exact cosine order over those
    // members (naive recompute)
    val raw = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      BigDecimal(d / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (qid <- got.map(_._1).distinct) {
      val expect = members.filter(_._1 == qid).toSeq
        .map { case (_, nid) => (nid, cos(raw(qid), raw(nid))) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(5).map(_._1)
      val mine = got.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(mine == expect, s"query $qid: $mine != $expect")
    }
  }

  test("cutRepeatedSpansBytes: region chars cut, survivors " +
      "re-concatenated without separators; exact-copy docs empty, " +
      "clean docs intact") {
    val d = Seq(
      (0L, "tiny shared bit plus aaaaaaaa"),  // shares 21-char prefix
      (1L, "tiny shared bit plus bbbbbbbb"),
      (2L, "zq"))                             // clean, sub-minChars
    .toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpansBytes(d, minChars = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // region [0,20] cut from both sharers: the 21-char prefix
    // including its trailing space goes, the tails survive verbatim
    assert(out.toSeq == Seq(
      (0L, 29L, 21L, "aaaaaaaa"),
      (1L, 29L, 21L, "bbbbbbbb"),
      (2L, 2L, 0L, "zq")))
    // exact duplicate docs are 100% region -> cut to empty
    val dup = Seq((0L, "exactly the same fifty characters of text " +
        "right here!"), (1L, "exactly the same fifty characters of " +
        "text right here!")).toDF("doc_id", "text")
    val cut = Dedup.cutRepeatedSpansBytes(dup, minChars = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(cut.forall { case (_, nCut, clean) =>
      nCut > 0 && clean.isEmpty })
  }

  test("cutRepeatedSpans: region tokens cut, survivors re-joined in " +
      "order; pure boilerplate comes back empty, clean docs intact") {
    val out = Dedup.cutRepeatedSpans(exactSubstrDocs, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (0L, 6L, 6L, ""),            // fully duplicated -> empty
      (1L, 8L, 4L, "x y z w"),     // interior cut, order kept
      (2L, 3L, 0L, "m n o"),       // untouched pass-through
      (3L, 6L, 6L, "")))
    // the disjoint-islands fixture keeps exactly the gap token
    val d = Seq((10L, "a b c Z d e f"), (11L, "a b c Q d e f"))
      .toDF("doc_id", "text")
    val cut = Dedup.cutRepeatedSpans(d, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(cut.toSeq == Seq((10L, 6L, "Z"), (11L, 6L, "Q")))
  }

  test("semdedup: survivors equal the naive within-cluster greedy " +
      "prune over the operator's own clusters") {
    val thr = 0.3
    val clusters = Similarity.kmeans(vecs, k = 8, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = raw.keys.toSeq.sorted
    val dropped = (for {
      i <- ids; j <- ids
      if i < j && clusters(i) == clusters(j) &&
        cos(raw(i), raw(j)) >= thr
    } yield j).toSet
    val survivors = graft.operators.Curation.semdedup(vecs).collect()
      .map(r => r.getLong(0)).toSet
    assert(survivors == (ids.toSet -- dropped))
  }

  test("centroidSimilarity: hand-computed cosines over exact integer " +
      "centroids") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f), 0),    // label 0 centroid: (1e6, 0)
      (2L, Seq(0.0f, 1.0f), 1),    // label 1 centroid: (0, 1e6)
      (3L, Seq(1.0f, 1.0f), 2)     // label 2 centroid: (1e6, 1e6)
    ).toDF("vec_id", "embedding", "label")
    val sim = Similarity.centroidSimilarity(embs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(sim((0, 1)) == 0L)        // orthogonal
    assert(sim((0, 2)) == 707107L)   // 1/sqrt(2), half-up ppm
    assert(sim((1, 2)) == 707107L)
    assert(sim.size == 3)
  }

  test("keepTopQuantile: the cut is a clean partition of the quality " +
      "ordering") {
    val docs = SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = graft.operators.Curation.keepTopQuantile(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val total = docs.count()
    assert(kept.nonEmpty && kept.size < total)
    // roughly the top quartile survives (ties can only add)
    assert(kept.size >= total / 4)
    // every kept doc is strictly better than every dropped doc (a
    // dropped doc at the threshold would contradict the >= rule)
    val all = graft.operators.Curation.keepTopQuantile(docs, q = 0.0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val droppedMax = all.filterNot(kv => kept.contains(kv._1)).values.max
    assert(kept.values.min > droppedMax)
  }

  /** Naive driver-side replay of the kmeans contract: same md5 seeds,
    * same exact integer squared distances, same half-up centroid
    * means — the operator must match it bit-for-bit.
    */
  private def naiveKmeans(data: Seq[(Long, Seq[Float])], k: Int,
                          iters: Int): Map[Long, (Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val micro = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
    }.toMap
    var cents: Seq[(Int, Array[Long])] = data
      .map { case (id, _) => (md5hex(s"kmeans:$id"), id) }
      .sortBy(identity).take(k).zipWithIndex
      .map { case ((_, id), i) => (i, micro(id)) }
    def sq(u: Array[Long], c: Array[Long]): Long =
      u.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(): Map[Long, (Long, Long)] = micro.map { case (id, u) =>
      val (d, cid) = cents.map { case (cid, c) => (sq(u, c), cid) }.min
      id -> (cid.toLong, d)
    }
    var a = assign()
    for (_ <- 1 until iters) {
      cents = a.toSeq.groupBy(_._2._1).toSeq.map { case (cid, members) =>
        val us = members.map(m => micro(m._1))
        val n = us.length
        val c = us.head.indices.map { p =>
          val s = us.map(_(p)).sum
          math.floor((2L * s + n).toDouble / (2L * n).toDouble).toLong
        }.toArray
        (cid.toInt, c)
      }.sortBy(_._1)
      a = assign()
    }
    a
  }

  test("kmeans matches the naive integer-micro replay bit-for-bit") {
    val data = vecs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val expected = naiveKmeans(data, k = 8, iters = 2)
    val got = Similarity.kmeans(vecs, k = 8, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.size == data.size)
  }

  test("kmeans is partitioning-invariant and handles k > n") {
    val base = Similarity.kmeans(vecs, k = 4, iters = 3).collect().toSeq
    val reparted = Similarity.kmeans(vecs.repartition(7), k = 4,
      iters = 3).collect().toSeq
    assert(base == reparted)
    // k larger than the corpus: every vector seeds its own cluster,
    // dist 0, and nothing falls over
    val tiny = vecs.limit(3)
    val t = Similarity.kmeans(tiny, k = 8, iters = 2).collect()
    assert(t.length == 3 && t.forall(_.getLong(2) == 0L))
  }

  test("autoPlanes: integer ⌈log2(n/occupancy)⌉ by doubling, clamped") {
    assert(Similarity.autoPlanes(0L) == 4)
    assert(Similarity.autoPlanes(512L) == 4)   // 2⁴ buckets × 32 = 512
    assert(Similarity.autoPlanes(513L) == 5)
    assert(Similarity.autoPlanes(5000L) == 8)  // 2⁷·32 < 5000 ≤ 2⁸·32
    assert(Similarity.autoPlanes(50000L) == 11)
    assert(Similarity.autoPlanes(Long.MaxValue / 64) == 24) // cap
  }

  test("embeddingNearDupsAuto ≡ embeddingNearDups at the derived " +
      "depth") {
    val planes = Similarity.autoPlanes(clustered.count())
    val auto = Similarity.embeddingNearDupsAuto(clustered,
      threshold = 0.5, dim = 16).collect().toSeq
    val fixed = Similarity.embeddingNearDups(clustered,
      threshold = 0.5, tables = 16, planesPerTable = planes,
      dim = 16).collect().toSeq
    assert(auto == fixed && auto.nonEmpty)
  }

  /** Hand-built kNN-vote fixture: query 0 points along (1,0); ids 1–4
    * fan out at increasing angles (labels 1,2,1,2), ids 5–6 sit near
    * (0,1) with label 9.
    */
  lazy val voteFixture = Seq(
    (0L, Seq(1f, 0f), 3),
    (1L, Seq(1f, 0.1f), 1),
    (2L, Seq(1f, 0.2f), 2),
    (3L, Seq(1f, 0.3f), 1),
    (4L, Seq(1f, 0.4f), 2),
    (5L, Seq(0f, 1f), 9),
    (6L, Seq(0.01f, 1f), 9)).toDF("vec_id", "embedding", "label")

  test("knnLabelVote: majority vote, (votes desc, label asc) " +
      "tiebreak, correct flag") {
    // top-4 of query 0 is ids 1–4 → labels (1,2,1,2), a 2–2 tie:
    // the LOWER label must win; its own label is 3 → correct = false
    val out = Similarity.knnLabelVote(voteFixture,
      voteFixture.filter($"vec_id" === 0L), k = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 3L &&
      r.getLong(2) == 1L && r.getLong(3) == 2L && !r.getBoolean(4))
  }

  test("knnLabelVote: leave-one-out agreement marks correct = true") {
    // query 5's single nearest neighbor is 6 (both label 9)
    val out = Similarity.knnLabelVote(voteFixture,
      voteFixture.filter($"vec_id" === 5L), k = 1).collect()
    val r = out.head
    assert(r.getLong(0) == 5L && r.getLong(1) == 9L &&
      r.getLong(2) == 9L && r.getLong(3) == 1L && r.getBoolean(4))
  }

  test("ivfPqTopKTrained: Lloyd-trained residual codebooks cut " +
      "quantization distortion vs the sampled codebook at equal " +
      "bytes; the declared top-k is deterministic") {
    val m = 4; val sub = 16; val cb = 16
    val e = spark.read.parquet(
      "/root/testdata/sf0.001/embeddings.parquet")
    // routing shared by BOTH variants (ivfPqTopK's rule): nearest of
    // the 8 md5-sampled coarse centroids by cosine, integer-micro
    // residual
    val coarse = broadcast(Similarity.ivfCentroids(e, 8))
    def microV(c: org.apache.spark.sql.Column) = transform(c,
      v => floor(v.cast("double") * 1e6 + 0.5).cast("long"))
    val aw = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cscore").desc, col("ccid").asc)
    val routed = e.select(col("vec_id").as("id"),
        col("embedding").as("_v"))
      .join(coarse.select(col("cid").as("ccid"), col("cvec")))
      .withColumn("cscore", Similarity.cosine(col("_v"), col("cvec")))
      .withColumn("crn", row_number().over(aw))
      .filter(col("crn") === 1)
      .select(col("id"), zip_with(microV(col("_v")),
        microV(col("cvec")), (x, y) => x - y).as("ru"))
    val rus = routed.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // sampled codebook: md5(id)-ordered 16 residuals (ivfPqTopK's
    // sampling rule), sliced per subspace
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val sampledIds = rus.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(cb)
    val sampledBooks = (0 until m).map { j =>
      sampledIds.zipWithIndex.map { case (id, i) =>
        (i, rus(id).slice(j * sub, (j + 1) * sub))
      }
    }
    // trained books: the shared fused Lloyd trainer on the residuals
    val trained = Similarity.trainSubspaceBooks(
      routed.select(col("id").as("vec_id"), col("ru").as("u")),
      m, sub, cb, iters = 2)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def distortion(books: Seq[Seq[(Int, Array[Long])]]): Double =
      rus.values.map { ru =>
        (0 until m).map { j =>
          val s = ru.slice(j * sub, (j + 1) * sub)
          books(j).map { case (_, c) => d2(s, c) }.min
        }.sum.toDouble
      }.sum / rus.size
    val dS = distortion(sampledBooks)
    val dT = distortion(trained.toSeq.map(_.toSeq))
    info(f"sampled distortion $dS%.3g vs trained $dT%.3g " +
      f"(${dS / dT}%.2fx)")
    assert(dT < dS,
      f"trained distortion $dT%.3g not below sampled $dS%.3g")
    // the declared query shape is deterministic: two runs bit-equal
    val q = e.filter(col("vec_id") < 20)
    val a = Similarity.ivfPqTopKTrained(e, q, k = 5).collect().toSeq
    val b = Similarity.ivfPqTopKTrained(e, q, k = 5).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("semanticDecontam: planted paraphrase leaks are all found " +
      "at cosine 1.0; output never contains train-train pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isTest = substring(md5(col("vec_id").cast("string")), 1, 1)
      .isin("0", "1")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val train = e.filter(!isTest)
    // every 10th train vector re-enters as a "paraphrase" (identical
    // meaning vector, fresh id) — an LSH-guaranteed leak: identical
    // vectors share every bucket in every table
    val plantedSrc = train.filter(col("vec_id") % 10 === 0)
    val planted = plantedSrc
      .select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val test = e.filter(isTest)
      .select(col("vec_id"), col("embedding")).unionByName(planted)
    val got = Similarity.semanticDecontam(train, test).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val trainIds = train.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val testIds = test.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    // sides are respected: train_id from train, test_id from test
    assert(got.forall(t => trainIds(t._1) && testIds(t._2)))
    // every planted leak is evidence at exactly cosine 1.0
    val plantedPairs = plantedSrc.select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + off)).toSet
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(plantedPairs.subsetOf(gotPairs), "missed a planted leak")
    assert(got.filter(t => plantedPairs((t._1, t._2)))
      .forall(_._3 == 1.0))
  }

  test("exactSemanticDecontam: the LSH gate is a strict subset of " +
      "the exact twin, and the exact twin equals brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isTest = substring(md5(col("vec_id").cast("string")), 1, 1)
      .isin("0", "1")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val train = e.filter(!isTest)
    val planted = train.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val test = e.filter(isTest)
      .select(col("vec_id"), col("embedding")).unionByName(planted)
    val exact = Similarity.exactSemanticDecontam(train, test)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gated = Similarity.semanticDecontam(train, test)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the gate can only MISS pairs, never invent them, and scores on
    // shared pairs are identical (same rounded-cosine arithmetic)
    assert(gated.toSet.subsetOf(exact.toSet),
      "LSH gate emitted a pair the exact twin does not contain")
    // the exact twin really is brute force: naive driver-side replay
    val tr = train.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val te = test.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val naive = (for {
      (ti, tv) <- tr; (si, sv) <- te
      s = cos(tv, sv) if s >= 0.5
    } yield (ti, si, s)).toSet
    assert(exact.toSet == naive,
      s"exact twin ${exact.length} pairs != naive ${naive.size}")
  }

  test("minhashBandCurve: found is monotone along the doubling " +
      "chain (refinement proof), found ⊆ eligible, and each arm " +
      "equals production minhashNearDups planted-pair recovery") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val curve = Dedup.minhashBandCurve(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(curve.size == 12)
    for (((_, _), (planted, eligible, found)) <- curve)
      assert(found <= eligible && eligible <= planted)
    // hit(b) ⇒ hit(2b): all-lanes-equal over a band implies equal
    // over both halves when bands double
    for (lv <- 0L to 2L; (b1, b2) <- Seq((1L, 2L), (2L, 4L), (4L, 8L)))
      assert(curve((b1, lv))._3 <= curve((b2, lv))._3,
        s"level $lv: found not monotone from $b1 to $b2 bands")
    // production parity: build the mirror corpus and run the REAL
    // operator at each bands knob — planted-pair recovery must equal
    // the curve's row-local lane answer
    val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val toks = filter(split(col("text"), "\\s+"), x => x =!= "")
    val src = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("orig"), toks.as("toks"))
    val mirrors = Seq((3, 4), (1, 2), (3, 10)).zipWithIndex.map {
      case ((num, den), lv) =>
        src.select((lit(off) + col("orig") * 3 + lv).as("doc_id"),
          array_join(slice(col("toks"), lit(1),
            greatest(expr(s"(size(toks) * $num) DIV $den"), lit(3))),
            " ").as("text"))
    }.reduce(_ unionByName _)
    val corpus = docs.select("doc_id", "text").unionByName(mirrors)
    for (b <- Seq(2, 4, 8)) {
      val got = Dedup.minhashNearDups(corpus, bands = b,
          threshold = 0.25, maxBucket = 1000000)
        .filter(col("id2") >= off &&
          col("id1") === expr(s"(id2 - $off) DIV 3"))
        .withColumn("lv", (col("id2") - off) % 3)
        .groupBy("lv").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      for (lv <- 0L to 2L)
        assert(got.getOrElse(lv, 0L) == curve((b.toLong, lv))._3,
          s"bands=$b level $lv: production " +
            s"${got.getOrElse(lv, 0L)} != curve ${curve((b.toLong, lv))._3}")
    }
  }

  test("semanticDecontamTablesCurve: each knob arm equals the " +
      "production gate at that table count; monotone in tables; " +
      "the max-tables arm matches semanticDecontamRecall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isTest = substring(md5(col("vec_id").cast("string")), 1, 1)
      .isin("0", "1")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val train = e.filter(!isTest)
    val curve = Similarity.semanticDecontamTablesCurve(train, off,
        plantEvery = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(curve.size == 9)
    // monotone in tables per band (prefix nesting), and the proof's
    // premise directly: found at k ⟺ min colliding table < k
    for (b <- 0L to 2L; (k1, k2) <- Seq((4L, 8L), (8L, 16L)))
      assert(curve((k1, b))._3 <= curve((k2, b))._3,
        s"band $b: found not monotone from $k1 to $k2 tables")
    // each arm IS the production gate at that table count: re-run
    // semanticDecontam(tables = k) on the same plants and count
    // planted-pair recoveries among the exact-eligible
    val plants = Similarity.semanticDecontamRecall(train, off,
      plantEvery = 5)   // forces the same fixture cadence
    for (k <- Seq(4, 8)) {
      val testDf = {
        // rebuild the plant test side exactly as the curve does
        val src = train.filter(col("vec_id") % 5 === 0)
        val alphas = Seq(0.0625, 0.125, 0.1875)
        alphas.zipWithIndex.map { case (a, b) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def sign(i: Int): Double = {
            md.reset()
            val d = md.digest(s"sdr:$b:$i".getBytes("UTF-8"))
            if ((d(0) & 0x80) == 0) 1.0 else -1.0
          }
          val delta = array((0 until 64).map(i =>
            lit(a * sign(i))): _*)
          src.select(
            (lit(off) + col("vec_id") * 3 + b).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              (x.cast("double") + element_at(delta, i.cast("int") + 1))
                .cast("float")).as("embedding"))
        }.reduce(_ unionByName _)
      }
      val gate = Similarity.semanticDecontam(train, testDf,
          tables = k)
        .filter(col("train_id") === (col("test_id") - off).divide(3)
          .cast("long"))
      val gotPerBand = gate
        .withColumn("band", (col("test_id") - off) % 3)
        .groupBy("band").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      for (b <- 0L to 2L)
        assert(gotPerBand.getOrElse(b, 0L) == curve((k.toLong, b))._3,
          s"tables=$k band $b: curve ${curve((k.toLong, b))._3} != " +
            s"production gate ${gotPerBand.getOrElse(b, 0L)}")
    }
    // the max-tables arm reproduces semanticDecontamRecall's found
    val rec = plants.collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    for (b <- 0L to 2L)
      assert(curve((16L, b))._3 == rec(b),
        s"band $b: 16-table arm ${curve((16L, b))._3} != recall row " +
          s"${rec(b)}")
  }

  test("lshOccupancyCurve: found ⊆ candidates ∩ truth per knob, " +
      "recall arithmetic consistent, every arm matches the " +
      "production embeddingNearDups candidate universe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.lshOccupancyCurve(e, threshold = 0.4,
        planesKnobs = Seq(4, 6, 8)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(4L, 6L, 8L))
    val total = Similarity.exactNearDups(e, threshold = 0.4).count()
    rows.foreach { case (p, cand, found, tot, ppm) =>
      assert(tot == total)
      assert(found <= cand, s"p=$p found $found > candidates $cand")
      assert(found <= tot, s"p=$p found $found > truth $tot")
      assert(ppm == found * 1000000L / tot)
    }
    // arm p's found pairs are EXACTLY embeddingNearDups at
    // planesPerTable = p, tables = 8 (same hyperplane universe) —
    // the curve prices the production operator, not a stand-in
    val arm6 = Similarity.embeddingNearDups(e, threshold = 0.4,
      tables = 8, planesPerTable = 6).count()
    assert(rows.find(_._1 == 6L).get._3 == arm6,
      s"curve found ${rows.find(_._1 == 6L).get._3} != operator $arm6")
    info(rows.map(r => s"p=${r._1}: cand ${r._2} found ${r._3} " +
      s"recall_ppm ${r._5}").mkString("; "))
  }

  test("semanticDecontamRecall: per-band invariants — found ≤ " +
      "eligible ≤ planted, recall consistent, high band near-perfect") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isTest = substring(md5(col("vec_id").cast("string")), 1, 1)
      .isin("0", "1")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    // plantEvery=5 on the tiny sf: ~8 plants per band
    val rows = Similarity.semanticDecontamRecall(e.filter(!isTest),
        off, plantEvery = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_._2).toSeq == Seq(62500L, 125000L, 187500L))
    rows.foreach { case (band, _, planted, eligible, found, ppm, mc) =>
      assert(found <= eligible && eligible <= planted,
        s"band $band: found $found / eligible $eligible / $planted")
      if (eligible > 0)
        assert(ppm == found * 1000000L / eligible)
      // mean plant cosine sits in the predicted band center ±0.1:
      // unit-norm corpus ⇒ cos ≈ 1/sqrt(1+64α²)
      val a = Seq(0.0625, 0.125, 0.1875)(band.toInt)
      val pred = 1.0 / math.sqrt(1 + 64 * a * a)
      assert(math.abs(mc / 1e6 - pred) < 0.1,
        s"band $band mean cos ${mc / 1e6} vs predicted $pred")
    }
    // the α=1/16 band sits near cosine 0.9 — 16×6 LSH recall there
    // must be high (the gate's advertised operating region); the
    // near-threshold band is REPORTED, not asserted (that's the
    // measurement this row exists to publish)
    val hi = rows.head
    assert(hi._4 > 0 && hi._5 * 1000000L / hi._4 >= 900000L,
      s"high band recall ${hi._5}/${hi._4} below 0.9")
    info(rows.map(r =>
      s"band ${r._1}: recall_ppm ${r._6} (mean cos ${r._7 / 1e6})")
      .mkString("; "))
  }
}
