package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two equivalences the r18 hex-path optimization rests on:
  * the table-driven [[graft.sources.Bson.hexString]] renders exactly
  * what the old per-byte `f"$b%02x"` chain rendered, and sorting MD5
  * digests by `java.util.Arrays.compareUnsigned` orders exactly like
  * sorting their lowercase-hex strings (the `$sample` order the
  * oracle replays as `ORDER BY md5(...)`). Either equivalence
  * breaking would silently change which documents a `$sample` serves.
  */
class HexOrderSpec extends AnyFunSuite {

  private def slowHex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  test("hexString matches the formatter render byte-for-byte") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(33)
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      assert(graft.sources.Bson.hexString(bytes) === slowHex(bytes))
    }
    // every byte value, positioned first and last
    (0 until 256).foreach { v =>
      val b = Array(v.toByte, 0x5a.toByte)
      assert(graft.sources.Bson.hexString(b) === slowHex(b))
      assert(graft.sources.Bson.hexByte(v.toByte) ===
        f"${v.toByte}%02x")
    }
  }

  test("unsigned digest order == lowercase-hex string order") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = (0 until 5000).map { i =>
      md.reset(); md.digest(s"coll:$i".getBytes("UTF-8"))
    }
    val byHex = digests.sortBy(slowHex)
    val byBytes = digests.sorted(new Ordering[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)
    })
    assert(byHex.map(slowHex) === byBytes.map(slowHex))
  }
}
