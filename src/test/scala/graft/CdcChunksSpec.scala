package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CdcChunks
import graft.operators.Multimodal

/** Content-defined chunking: reconstruction, short-blob edges, and the
  * boundary-realignment property that makes chunk-hash dedup survive
  * byte-offset shifts (the whole point of CDC over fixed-size blocks).
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def chunksOf(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    val arr = CdcChunks.evalBytes(bytes)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  private val payload =
    ("the quick brown fox jumps over the lazy dog " * 6).getBytes("UTF-8")

  test("chunks tile the blob exactly: contiguous offsets, lens sum") {
    val cs = chunksOf(payload)
    assert(cs.head._1 == 0)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(cs.map(_._2).sum == payload.length)
    assert(cs.forall(_._2 > 0))
  }

  test("short blobs (< window) come back as one whole chunk") {
    val cs = chunksOf("abc".getBytes("UTF-8"))
    assert(cs.map(c => (c._1, c._2)) == Seq((0, 3)))
    assert(chunksOf(Array.emptyByteArray).isEmpty)
  }

  test("boundary realignment: a byte-offset shift preserves the " +
      "chunk-hash suffix (fixed-size blocking would lose every block)") {
    val shifted = "PREFIX-".getBytes("UTF-8") ++ payload
    val base = chunksOf(payload).map(_._3)
    val shift = chunksOf(shifted).map(_._3)
    // after the first content-defined cut whose window sits fully
    // inside the shared suffix, boundaries coincide — all later
    // chunks hash identically despite the 7-byte offset shift
    val common = base.reverse.zip(shift.reverse)
      .takeWhile { case (a, b) => a == b }.size
    assert(common >= base.size - 4,
      s"only $common of ${base.size} suffix chunks realigned")
    assert(common > 0)
  }

  private def gearChunksOf(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    val arr = CdcChunks.evalBytesGear(bytes)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  test("gear chunks tile the blob; cuts match an independent " +
      "windowed-sum replay of the state") {
    val cs = gearChunksOf(payload)
    assert(cs.head._1 == 0)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(cs.map(_._2).sum == payload.length)
    // independent derivation (the oracle's closed form): h_i =
    // Σ_{k=0..min(63,i-1)} GEAR[b_{i-k}]·2^k mod 2^64 — must produce
    // the same cut positions as the expression's shift recursion
    val gear = (0 until 256).map { b =>
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(1, md.digest(b.toString.getBytes("UTF-8"))
        .take(8)) >> 4
    }
    val m64 = BigInt(1) << 64
    val cuts = (1 to payload.length).filter { i =>
      val h = (0 to math.min(63, i - 1)).map { k =>
        (gear(payload(i - 1 - k) & 0xff) << k) mod m64
      }.sum mod m64
      (h >> 60) == 0
    }
    val expected = (cuts ++ Seq(payload.length)).distinct.sorted
    assert(cs.map(c => c._1 + c._2) == expected)
    assert(gearChunksOf(Array.emptyByteArray).isEmpty)
  }

  test("gear boundary realignment under a byte-offset shift") {
    val shifted = "PREFIX-".getBytes("UTF-8") ++ payload
    val base = gearChunksOf(payload).map(_._3)
    val shift = gearChunksOf(shifted).map(_._3)
    // gear state ages bytes out after 64 positions, so boundaries
    // realign once 64 shared bytes have streamed past
    val common = base.reverse.zip(shift.reverse)
      .takeWhile { case (a, b) => a == b }.size
    assert(common > 0 && common >= base.size - 6,
      s"only $common of ${base.size} suffix chunks realigned")
  }

  test("gear is measurably cheaper per byte than the md5-window " +
      "predicate on a large blob") {
    // the scale argument for the variant: O(1) shift-add per byte vs
    // an md5 of the W-byte window per byte. Warm once, then time.
    val big = ("large-blob content block " * 40000).getBytes("UTF-8")
    CdcChunks.evalBytes(big); CdcChunks.evalBytesGear(big)
    def time(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    val tMd5 = time(CdcChunks.evalBytes(big))
    val tGear = time(CdcChunks.evalBytesGear(big))
    info(f"md5-window ${tMd5 / 1e6}%.1f ms vs gear ${tGear / 1e6}%.1f ms " +
      f"on ${big.length} bytes (${tMd5.toDouble / tGear}%.1fx)")
    assert(tGear < tMd5,
      s"gear $tGear ns not faster than md5-window $tMd5 ns")
  }

  private def fastChunksOf(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    val arr = CdcChunks.evalBytesFastCdc(bytes)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  test("fastcdc: chunks tile, min/max bounds hold (only the final " +
      "chunk may undershoot min), forced cuts cap at max") {
    // long enough for many chunks; repeated content exercises both
    // mask regimes and the forced-cut path
    val big = ("normalized chunking bounds the size distribution " * 200)
      .getBytes("UTF-8")
    val cs = fastChunksOf(big)
    assert(cs.head._1 == 0)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(cs.map(_._2).sum == big.length)
    // every chunk obeys the hard bounds; the tail may be short
    cs.init.foreach { case (_, l, _) =>
      assert(l >= CdcChunks.FC_MIN && l <= CdcChunks.FC_MAX,
        s"chunk len $l outside [${CdcChunks.FC_MIN}, ${CdcChunks.FC_MAX}]")
    }
    assert(cs.last._2 <= CdcChunks.FC_MAX)
    assert(fastChunksOf(Array.emptyByteArray).isEmpty)
    // degenerate content that never clears a mask (all zero bytes
    // have a fixed gear constant; if it never hits, every cut is the
    // forced one at exactly FC_MAX)
    val zeros = fastChunksOf(Array.fill[Byte](400)(0))
    assert(zeros.init.forall(_._2 <= CdcChunks.FC_MAX))
  }

  test("fastcdc: measured chunk-size variance shrinks vs plain gear " +
      "at a comparable mean (the normalization property)") {
    val big = (("media payload seg " * 9) + "|")
      .*(3000).getBytes("UTF-8")
    def stats(ls: Seq[Int]): (Double, Double) = {
      val m = ls.sum.toDouble / ls.size
      val v = ls.map(l => (l - m) * (l - m)).sum / ls.size
      (m, math.sqrt(v) / m) // (mean, coefficient of variation)
    }
    val (mG, cvG) = stats(gearChunksOf(big).map(_._2))
    val (mF, cvF) = stats(fastChunksOf(big).map(_._2))
    info(f"gear mean=$mG%.1f cv=$cvG%.2f vs fastcdc mean=$mF%.1f cv=$cvF%.2f")
    // same target probability class; normalization must cut relative
    // spread decisively (paper: normalized chunking halves variance)
    assert(cvF < cvG * 0.8,
      f"fastcdc cv $cvF%.2f not < 0.8x gear cv $cvG%.2f")
  }

  test("fastcdc: boundary resync under a byte-offset shift — bounded " +
      "divergence, then identical chunk hashes (the normalization " +
      "trade vs plain gear's instant realignment)") {
    val big = ("resync property content block for normalized cdc " * 60)
      .getBytes("UTF-8")
    val shifted = "PRE-".getBytes("UTF-8") ++ big
    val base = fastChunksOf(big).map(_._3)
    val shift = fastChunksOf(shifted).map(_._3)
    // min/max bounds make boundary decisions start-dependent, so the
    // first chunks may differ — but once both walks cross a shared
    // mask-cut, they lock step: the common HASH SUFFIX must cover all
    // but a bounded head (resync within a few target-size chunks)
    val common = base.reverse.zip(shift.reverse)
      .takeWhile { case (a, b) => a == b }.size
    assert(common > 0 && common >= base.size - 8,
      s"only $common of ${base.size} suffix chunks realigned")
    // and the divergent head is SHORT in bytes, not just chunks:
    // everything after the first ~2 max-sizes of the shifted blob
    // dedups against the unshifted chunk store
    val resyncBytes = fastChunksOf(shifted)
      .take(shift.size - common).map(_._2).sum
    assert(resyncBytes <= 4 * CdcChunks.FC_MAX,
      s"resync took $resyncBytes bytes (> 4x max chunk)")
  }

  test("fastcdc: hand replay of the bounded walk over the closed-form " +
      "gear state matches the expression") {
    val cs = fastChunksOf(payload)
    val gear = (0 until 256).map { b =>
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(1, md.digest(b.toString.getBytes("UTF-8"))
        .take(8)) >> 4
    }
    val m64 = BigInt(1) << 64
    def stateAt(i: Int): BigInt = // i is 1-based byte count
      (0 to math.min(63, i - 1)).map { k =>
        (gear(payload(i - 1 - k) & 0xff) << k) mod m64
      }.sum mod m64
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var s = 0
    while (s < payload.length) {
      val cands = ((s + CdcChunks.FC_MIN) to
          math.min(s + CdcChunks.FC_MAX - 1, payload.length)).filter {
        i =>
          val h = stateAt(i)
          if (i - s < CdcChunks.FC_TARGET)
            (h >> (64 - CdcChunks.FC_BITS_STRICT)) == 0
          else (h >> (64 - CdcChunks.FC_BITS_LOOSE)) == 0
      }
      val e = cands.headOption.getOrElse(
        math.min(s + CdcChunks.FC_MAX, payload.length))
      bounds += e
      s = e
    }
    val bs = bounds.toList
    val expected = bs.zip(bs.tail).map { case (a, b) => (a, b - a) }
    assert(cs.map(c => (c._1, c._2)) == expected)
  }

  test("cdcChunkTable + cdcDedupReport: repeated blobs dedup to one " +
      "copy of each distinct chunk") {
    val df = Seq((1L, payload), (2L, payload),
      (3L, "completely different content here".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val chunks = Multimodal.cdcChunkTable(df, "payload")
    val rep = Multimodal.cdcDedupReport(chunks).collect()(0)
    val n = rep.getAs[Long]("n_chunks")
    val d = rep.getAs[Long]("distinct_chunks")
    val tb = rep.getAs[Long]("total_bytes")
    val db = rep.getAs[Long]("distinct_bytes")
    // doc 2 is a byte-identical copy of doc 1: every one of its
    // chunks dedups away
    val doc1 = chunks.filter("doc_id = 1").count()
    assert(n - d >= doc1)
    assert(tb - db >= payload.length)
    assert(rep.getAs[Long]("dedup_ppm") ==
      1000000L * (tb - db) / tb)
  }
}
