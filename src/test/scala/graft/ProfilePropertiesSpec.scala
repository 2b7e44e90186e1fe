package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Hll, LongSet, PathStats}

/** Property-style tests for the profile buffer algebra (SURVEY §5.2):
  * the merge law profile(a ∪ b) = merge(profile(a), profile(b)) the
  * reference never tests, plus structural invariants. Seeded-random
  * cases over the pure buffer level — no Spark session, hundreds of
  * cases in milliseconds.
  */
class ProfilePropertiesSpec extends AnyFunSuite {

  private def stats(values: Seq[Option[Double]], limit: Int = 1000)
      : PathStats = {
    val st = new PathStats(limit)
    values.foreach { v =>
      st.seen += 1
      v match {
        case Some(d) =>
          st.present += 1
          st.addDistinct(UTF8String.fromString(d.toString))
          if (st.numMin.isNaN || d < st.numMin) st.numMin = d
          if (st.numMax.isNaN || d > st.numMax) st.numMax = d
        case None => ()
      }
    }
    st
  }

  private def randomValues(r: Random): List[Option[Double]] =
    List.fill(r.nextInt(60))(
      if (r.nextInt(5) == 0) None
      // small value domain → plenty of duplicates for distinct-counting
      else Some((r.nextInt(40) - 20).toDouble / 2))

  test("merge law: stats(a ++ b) == merge(stats(a), stats(b))") {
    val r = new Random(42)
    (1 to 300).foreach { _ =>
      val (a, b) = (randomValues(r), randomValues(r))
      val merged = stats(a)
      merged.mergeFrom(stats(b))
      val direct = stats(a ++ b)
      assert(merged.seen == direct.seen)
      assert(merged.present == direct.present)
      assert(merged.cardinality == direct.cardinality)
      assert(merged.numMin.isNaN == direct.numMin.isNaN)
      if (!direct.numMin.isNaN) {
        assert(merged.numMin == direct.numMin)
        assert(merged.numMax == direct.numMax)
      }
    }
  }

  test("merge law across the exact→HLL boundary") {
    val r = new Random(7)
    (1 to 50).foreach { _ =>
      val a = List.fill(150)(Some(r.nextInt(10000).toDouble))
      val b = List.fill(150)(Some(r.nextInt(10000).toDouble))
      val merged = stats(a, limit = 100)   // a alone degrades
      merged.mergeFrom(stats(b, limit = 100))
      val direct = stats(a ++ b, limit = 100)
      assert(merged.seen == direct.seen)
      // both sides are HLL by now and HLL merge is exact on registers:
      assert(merged.approx && direct.approx)
      assert(merged.cardinality == direct.cardinality)
    }
  }

  test("invariants: cardinality ≤ present ≤ seen; min ≤ max") {
    val r = new Random(11)
    (1 to 300).foreach { _ =>
      val st = stats(randomValues(r))
      assert(st.cardinality <= st.present)
      assert(st.present <= st.seen)
      if (!st.numMin.isNaN) assert(st.numMin <= st.numMax)
    }
  }

  test("exact→HLL degradation stays within HLL error and keeps merging") {
    val big = (1 to 5000).map(i => Some(i.toDouble))
    val st = stats(big, limit = 100)
    assert(st.approx)
    assert(math.abs(st.cardinality - 5000.0) / 5000 < 0.1)
    val more = stats((5001 to 6000).map(i => Some(i.toDouble)), limit = 2000)
    st.mergeFrom(more)
    assert(math.abs(st.cardinality - 6000.0) / 6000 < 0.1)
  }

  test("LongSet matches a reference HashSet (modulo the 0 remap)") {
    val r = new Random(99)
    (1 to 100).foreach { _ =>
      val xs = List.fill(r.nextInt(3000))(r.nextLong(1000) - 500)
      val ls = new LongSet()
      xs.foreach(ls.add)
      val expect = xs.map(x => if (x == 0L) 0x5ca1ab1eL else x).toSet.size
      assert(ls.size == expect)
    }
  }

  test("Hll estimates within ~5% at 12-bit registers") {
    Seq(100, 1000, 20000).foreach { n =>
      val h = new Hll()
      (1 to n).foreach(i =>
        h.addHash(Hll.hash(UTF8String.fromString(s"value-$i"))))
      val err = math.abs(h.estimate - n.toDouble) / n
      assert(err < 0.05, s"n=$n est=${h.estimate} err=$err")
    }
  }
}
