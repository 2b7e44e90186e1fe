package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AudioHash64
import graft.operators.Multimodal

/** Audio perceptual fingerprint (1-D energy-delta hash): the
  * exact-integer invariants the fixture relies on, codegen parity,
  * banded pair generation, and a randomized model check.
  */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** s16le bytes from sample values. */
  private def pcm(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  // a textured test signal (same mixer class as the fixture): odd
  // values in [-8191, 8191], never zero
  private def sig(t: Int): Int = {
    val k = t.toLong
    val h0 = (k * 2654435761L) % 4294967296L
    val h1 = h0 ^ (h0 >> 13)
    val h2 = (h1 * 1597334677L) % 4294967296L
    (((h2 ^ (h2 >> 16)) % 8192) * 2 - 8191).toInt
  }

  test("degenerate inputs are null: empty, odd byte length, " +
      "all-silence, fewer than 65 samples after trim") {
    assert(AudioHash64.evalPcm(Array.emptyByteArray) == null)
    assert(AudioHash64.evalPcm(Array[Byte](1, 2, 3)) == null)
    assert(AudioHash64.evalPcm(pcm(Array.fill(200)(0))) == null)
    assert(AudioHash64.evalPcm(pcm(Array.tabulate(64)(sig))) == null)
    // 64 real samples wrapped in silence still trim below 65
    assert(AudioHash64.evalPcm(pcm(
      Array.fill(10)(0) ++ Array.tabulate(64)(sig)
        ++ Array.fill(10)(0))) == null)
    assert(AudioHash64.evalPcm(pcm(Array.tabulate(65)(sig))) != null)
  }

  test("exact amplitude scaling leaves the hash unchanged") {
    val base = Array.tabulate(650)(sig)
    val h = AudioHash64.evalPcm(pcm(base))
    assert(h == AudioHash64.evalPcm(pcm(base.map(_ * 2))))
    assert(h == AudioHash64.evalPcm(pcm(base.map(_ * 3))))
  }

  test("leading/trailing silence leaves the hash unchanged (trim)") {
    val base = Array.tabulate(650)(sig)
    val h = AudioHash64.evalPcm(pcm(base))
    assert(h == AudioHash64.evalPcm(pcm(
      Array.fill(37)(0) ++ base ++ Array.fill(23)(0))))
    assert(h == AudioHash64.evalPcm(pcm(Array.fill(1)(0) ++ base)))
    assert(h == AudioHash64.evalPcm(pcm(base ++ Array.fill(400)(0))))
  }

  test("a one-sample glitch flips at most 2 bits (its window feeds " +
      "exactly 2 adjacent comparisons)") {
    val base = Array.tabulate(650)(sig)
    val h = AudioHash64.evalPcm(pcm(base)).longValue()
    for (g <- Seq(0, 9, 325, 500, 649)) {
      val ed = base.clone(); ed(g) += 4096   // odd + even = odd ≠ 0
      val hg = AudioHash64.evalPcm(pcm(ed)).longValue()
      assert(java.lang.Long.bitCount(h ^ hg) <= 2, s"glitch at $g")
    }
  }

  test("hand-computed 65-sample case: one sample per window, bit " +
      "per adjacent energy comparison") {
    // energies strictly ascend -> all 64 bits set
    assert(AudioHash64.evalPcm(pcm(Array.tabulate(65)(i => i + 1)))
      == -1L)
    // strictly descend -> no bit set
    assert(AudioHash64.evalPcm(pcm(Array.tabulate(65)(i => 66 - i)))
      == 0L)
    // negative samples count by |value|: alternating sign, same |s|
    // ladder -> identical hash
    assert(AudioHash64.evalPcm(pcm(Array.tabulate(65)(i =>
      if (i % 2 == 0) i + 1 else -(i + 1)))) == -1L)
  }

  test("expression evaluates identically under codegen (projection) " +
      "and carries null through") {
    import spark.implicits._
    val base = Array.tabulate(650)(sig)
    val df = Seq(
      (1L, pcm(base)),
      (2L, pcm(base.map(_ * 2))),
      (3L, Array[Byte](1, 2, 3))   // odd length → null
    ).toDF("id", "pcm")
    val out = df.select($"id",
        AudioHash64.audioHash64($"pcm").as("sig"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == out(1).getLong(1))
    assert(out(0).getLong(1) ==
      AudioHash64.evalPcm(pcm(base)).longValue())
    assert(out(2).isNullAt(1))
  }

  test("audio pipeline plan: banded join, no cartesian product; " +
      "variant groups recovered despite zero shared bytes") {
    import spark.implicits._
    val docs = (0L until 30L).map(d => (d, s"doc$d"))
      .toDF("doc_id", "text")
    val df = Multimodal.audioNearDups(Multimodal.synthPcm(docs))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- 0L until 30L; i <- 0 until 4; j <- i + 1 until 4)
      assert(pairs.contains((d * 4 + i, d * 4 + j)),
        s"missing variant pair d=$d ($i,$j)")
  }

  test("audioDupStream closed slices equal the batch per-window " +
      "block census, including the newest window") {
    import spark.implicits._
    val docs = (0L until 20L).map(d => (d, s"doc$d"))
      .toDF("doc_id", "text")
    val pcms = Multimodal.synthPcm(docs)
    val ts = pcms.select(
      expr("timestampadd(HOUR, CAST((id DIV 4) % 240 AS INT), " +
        "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
      col("id"), col("pcm"))
    val slices = graft.streaming.ProfileStream
      .replayedSlices(ts, "ts")(st => graft.streaming.ProfileStream
        .audioDupStream(st, "ts"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val sig = AudioHash64.audioHash64(col("pcm"))
    val batch = ts.select(
        date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("slice_start"),
        col("id"), sig.as("s"))
      .select(col("slice_start"), col("id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("block_idx"),
            shiftright(col("s"), b * 16).bitwiseAND(65535L)
              .as("block_val"))): _*)).as("b"))
      .groupBy(col("slice_start"), col("b.block_idx"),
        col("b.block_val"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("keep_id"))
      .filter(col("n_members") >= 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(slices == batch && slices.nonEmpty)
    // variant groups (hamming <= 2 within a doc) share at least one
    // 16-bit block by pigeonhole, so their bucket rows surface
    assert(slices.exists(_._4 >= 2L))
  }

  test("randomized model check (seeded): on random signals of " +
      "arbitrary length, scaling flips 0 bits, padding flips 0 bits, " +
      "any one-sample edit flips <= 2 bits, and evalPcm matches a " +
      "naive model") {
    val rnd = new scala.util.Random(20260815L)
    def naive(s: Array[Int]): Long = {
      val m = s.length
      val en = Array.tabulate(65) { w =>
        val i0 = (m.toLong * w / 65).toInt
        val i1 = (m.toLong * (w + 1) / 65).toInt
        (i0 until i1).map(i => math.abs(s(i).toLong)).sum
      }
      (0 until 64).filter(w => en(w) < en(w + 1))
        .map(1L << _).foldLeft(0L)(_ | _)
    }
    for (_ <- 1 to 25) {
      // odd nonzero samples; lengths NOT multiples of 65, so the
      // uneven floor-boundary window path is exercised (the oracle
      // fixture uses the even-tiling 650)
      val m = 65 + rnd.nextInt(1500)
      val s = Array.fill(m)(rnd.nextInt(8192) * 2 - 8191)
      val base = AudioHash64.evalPcm(pcm(s)).longValue()
      assert(base == naive(s), s"model mismatch at m=$m")
      assert(base == AudioHash64.evalPcm(pcm(s.map(_ * 2)))
        .longValue(), "scaling")
      val (lp, rp) = (rnd.nextInt(50), rnd.nextInt(50))
      assert(base == AudioHash64.evalPcm(pcm(
        Array.fill(lp)(0) ++ s ++ Array.fill(rp)(0))).longValue(),
        "padding")
      val g = rnd.nextInt(m)
      val ed = s.clone(); ed(g) += 4096   // stays odd ≠ 0
      val hg = AudioHash64.evalPcm(pcm(ed)).longValue()
      assert(java.lang.Long.bitCount(base ^ hg) <= 2,
        s"glitch at $g of $m flipped >2 bits")
    }
  }
}
