package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DHash64
import graft.operators.{Dedup, Multimodal}

/** Perceptual (difference) hash: the exact-integer invariants the
  * fixture relies on, the banded pair generation, and the plan shape.
  */
class DHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  // a textured test image (same mixer class as the fixture)
  private def tex(x: Int, y: Int): Int = {
    val k = (y * 18 + x).toLong
    val h0 = (k * 2654435761L) % 4294967296L
    val h1 = h0 ^ (h0 >> 13)
    val h2 = (h1 * 1597334677L) % 4294967296L
    ((h2 ^ (h2 >> 16)) % 208).toInt
  }

  test("dims must match the byte length; tiny bitmaps are null") {
    assert(DHash64.evalBitmap(gray(18, 16)(tex), 18, 15) == null)
    assert(DHash64.evalBitmap(gray(8, 8)((_, _) => 7), 8, 8) == null)
    assert(DHash64.evalBitmap(gray(9, 8)(tex), 9, 8) != null)
  }

  test("uniform brightness shift leaves the hash unchanged") {
    val base = DHash64.evalBitmap(gray(18, 16)(tex), 18, 16)
    val brighter = DHash64.evalBitmap(
      gray(18, 16)((x, y) => tex(x, y) + 16), 18, 16)
    assert(base == brighter)
  }

  test("2x pixel-doubled upscale leaves the hash unchanged " +
      "(dims multiples of 9 and 8)") {
    val base = DHash64.evalBitmap(gray(18, 16)(tex), 18, 16)
    val up = DHash64.evalBitmap(
      gray(36, 32)((x, y) => tex(x / 2, y / 2)), 36, 32)
    assert(base == up)
  }

  test("a one-pixel speckle flips at most 2 bits (its cell feeds " +
      "exactly 2 adjacent comparisons)") {
    val base = DHash64.evalBitmap(gray(18, 16)(tex), 18, 16)
    for (sx <- Seq(0, 5, 17); sy <- Seq(0, 7, 15)) {
      val sp = DHash64.evalBitmap(gray(18, 16)((x, y) =>
        tex(x, y) + (if (x == sx && y == sy) 48 else 0)), 18, 16)
      assert(java.lang.Long.bitCount(base ^ sp) <= 2,
        s"speckle at ($sx,$sy)")
    }
  }

  test("hand-computed 9x8 case: one cell per pixel, bit per " +
      "left<right comparison") {
    // pixel (x, y) = x: every row ascends, so all 64 bits set
    val asc = DHash64.evalBitmap(gray(9, 8)((x, _) => x * 10), 9, 8)
    assert(asc == -1L) // 64 ones
    val desc = DHash64.evalBitmap(gray(9, 8)((x, _) => 200 - x * 10), 9, 8)
    assert(desc == 0L)
  }

  test("expression evaluates identically under codegen (projection) " +
      "and carries null through") {
    import spark.implicits._
    val df = Seq(
      (1L, gray(18, 16)(tex), 18, 16),
      (2L, gray(18, 16)((x, y) => tex(x, y) + 16), 18, 16),
      (3L, Array[Byte](1, 2, 3), 18, 16) // wrong length → null
    ).toDF("id", "bmp", "w", "h")
    val out = df.select($"id",
        DHash64.dHash64($"bmp", $"w", $"h").as("sig"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == out(1).getLong(1))
    assert(out(0).getLong(1) ==
      DHash64.evalBitmap(gray(18, 16)(tex), 18, 16))
    assert(out(2).isNullAt(1))
  }

  test("hamming64NearDups finds exactly the brute-force pairs " +
      "(pigeonhole recall is total at maxDist=3)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigs = (0L until 64L).map(i => (i, rnd.nextLong())) ++
      Seq((100L, 5L), (101L, 5L ^ 3L), (102L, 5L ^ (1L << 63)))
    val df = sigs.toDF("id", "sig")
    val got = Dedup.hamming64NearDups(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      hd = java.lang.Long.bitCount(sa ^ sb) if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    assert(got == exp)
    assert(exp.contains((100L, 101L, 2L)))
    assert(exp.contains((100L, 102L, 1L)))
  }

  test("phash pipeline plan: banded join, no cartesian product") {
    import spark.implicits._
    val docs = (0L until 40L).map(d => (d, s"doc$d"))
      .toDF("doc_id", "text")
    val df = Multimodal.phashNearDups(Multimodal.synthBitmaps(docs))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // and the fixture's variant groups are recovered despite zero
    // shared bytes: every doc links its 4 variants (6 pairs)
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- 0L until 40L; i <- 0 until 4; j <- i + 1 until 4)
      assert(pairs.contains((d * 4 + i, d * 4 + j)),
        s"missing variant pair d=$d ($i,$j)")
  }

  test("phashDupStream closed slices equal the batch per-window " +
      "block census, including the newest window") {
    import spark.implicits._
    val docs = (0L until 20L).map(d => (d, s"doc$d"))
      .toDF("doc_id", "text")
    val bmps = Multimodal.synthBitmaps(docs)
    val ts = bmps.select(
      expr("timestampadd(HOUR, CAST((id DIV 4) % 240 AS INT), " +
        "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
      col("id"), col("w"), col("h"), col("bmp"))
    val slices = graft.streaming.ProfileStream
      .replayedSlices(ts, "ts")(st => graft.streaming.ProfileStream
        .phashDupStream(st, "ts"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch twin: same dHash, same pigeonhole blocks, same windows
    val sig = graft.functions.DHash64
      .dHash64(col("bmp"), col("w"), col("h"))
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

  test("randomized model check (seeded): on random bitmaps, brightness " +
      "shift flips 0 bits, pixel-doubling flips 0 bits, any one-pixel " +
      "edit flips <= 2 bits, and evalBitmap matches a naive model") {
    val rnd = new scala.util.Random(20260815L)
    def naive(px: Array[Int], w: Int, h: Int): Long = {
      val avg = Array.tabulate(8, 9) { (r, c) =>
        val (y0, y1) = (r * h / 8, (r + 1) * h / 8)
        val (x0, x1) = (c * w / 9, (c + 1) * w / 9)
        val cells = for (y <- y0 until y1; x <- x0 until x1)
          yield px(y * w + x).toLong
        cells.sum / cells.size
      }
      (for (r <- 0 until 8; c <- 0 until 8
            if avg(r)(c) < avg(r)(c + 1))
        yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)
    }
    for (_ <- 1 to 25) {
      // dims multiples of 9/8 (the upscale-invariance precondition),
      // pixel values leave headroom for the +16 / +48 edits
      val w = 9 * (rnd.nextInt(3) + 1)
      val h = 8 * (rnd.nextInt(3) + 1)
      val px = Array.fill(w * h)(rnd.nextInt(208))
      def bytes(p: Array[Int]) = p.map(_.toByte)
      val base = DHash64.evalBitmap(bytes(px), w, h)
      assert(base == naive(px, w, h), s"model mismatch at ${w}x$h")
      assert(base == DHash64.evalBitmap(
        bytes(px.map(_ + 16)), w, h), "brightness")
      val up = Array.tabulate(2 * w * 2 * h)(i =>
        px((i / (2 * w) / 2) * w + (i % (2 * w)) / 2))
      assert(base == DHash64.evalBitmap(bytes(up), 2 * w, 2 * h),
        "upscale")
      val (sx, sy) = (rnd.nextInt(w), rnd.nextInt(h))
      val sp = px.clone(); sp(sy * w + sx) += 48
      val d = java.lang.Long.bitCount(
        base ^ DHash64.evalBitmap(bytes(sp), w, h))
      assert(d <= 2, s"speckle at ($sx,$sy) flipped $d bits")
    }
  }
}
