package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bson
import graft.sources.Bson._

/** Byte-equivalence of the direct BVal→Variant encoder against the
  * JSON-round-trip path it replaced: for every BSON wire type the
  * codec implements (and nested compositions), the (value, metadata)
  * byte arrays from `Bson.variantVal` (direct `VariantBuilder`
  * appends) must equal `Bson.variantValViaJson`
  * (`VariantBuilder.parseJson(relaxedJson(v))`) — so the r18 hot-path
  * change is proven a pure re-encoding with zero observable delta,
  * including parseJson's decimal-first numeric quirk.
  */
class VariantDirectSpec extends AnyFunSuite {

  private def assertSame(v: BVal): Unit = {
    val direct = Bson.variantVal(v)
    val viaJson = Bson.variantValViaJson(v)
    assert(java.util.Arrays.equals(direct.getValue, viaJson.getValue),
      s"value bytes differ for $v")
    assert(
      java.util.Arrays.equals(direct.getMetadata, viaJson.getMetadata),
      s"metadata bytes differ for $v")
  }

  test("scalars: null, bool, int32, int64, string") {
    Seq[BVal](
      BNull, BBool(true), BBool(false),
      BInt32(0), BInt32(-1), BInt32(Int.MaxValue), BInt32(Int.MinValue),
      BInt64(0L), BInt64(Long.MaxValue), BInt64(Long.MinValue),
      BString(""), BString("héllo ✓ \n\"q\\"), BString("plain")
    ).foreach(assertSame)
  }

  test("doubles: plain renders take parseJson's decimal path, " +
      "exponent renders stay doubles, non-finite become " +
      "$numberDouble objects") {
    Seq[BVal](
      BDouble(5.05), BDouble(-0.125), BDouble(0.0), BDouble(-0.0),
      BDouble(123456.789), BDouble(0.001),        // no-exponent renders
      BDouble(1.0e10), BDouble(-1.5e-7),          // exponent renders
      BDouble(4.9e-324), BDouble(Double.MaxValue),
      BDouble(Double.NaN), BDouble(Double.PositiveInfinity),
      BDouble(Double.NegativeInfinity)
    ).foreach(assertSame)
  }

  test("$-wrapped types: decimal128, datetime, ObjectId, binary") {
    Seq[BVal](
      BDecimal128(new java.math.BigDecimal("12345.6789")),
      BDecimal128(new java.math.BigDecimal("-0.00001")),
      BDecimal128(java.math.BigDecimal.ZERO),
      BDateTime(0L), BDateTime(1700000000123L), BDateTime(-62135596800000L),
      BObjectId((0 until 12).map(_.toByte).toArray),
      BObjectId(Array.fill[Byte](12)(-1)),
      BBinary(0, Array[Byte](1, 2, 3)),
      BBinary(4, Array.emptyByteArray),
      BBinary(0x80.toByte, (0 until 63).map(_.toByte).toArray)
    ).foreach(assertSame)
  }

  test("arrays, documents, deep nesting, dictionary key reuse") {
    val flatArr = BArr(Seq(BInt32(1), BString("two"), BNull,
      BBool(true), BDouble(3.5)))
    val flatDoc = BDoc(Seq("a" -> BInt64(7), "b" -> BString("x"),
      "c" -> BNull))
    val nested = BDoc(Seq(
      "arr" -> BArr(Seq(flatDoc, flatArr, BArr(Seq(BArr(Nil))))),
      "doc" -> BDoc(Seq("inner" -> flatDoc, "ts" -> BDateTime(42L))),
      // same key names recur → metadata dictionary must dedup the
      // same way parseJson's incremental addKey calls do
      "a" -> BInt32(1), "again" -> BDoc(Seq("a" -> BInt32(2))),
      "id" -> BObjectId(Array.fill[Byte](12)(7)),
      "dec" -> BDecimal128(new java.math.BigDecimal("9.99")),
      "bin" -> BBinary(0, Array[Byte](9)),
      "empty" -> BDoc(Nil), "earr" -> BArr(Nil)))
    Seq[BVal](flatArr, flatDoc, nested, BDoc(Nil), BArr(Nil))
      .foreach(assertSame)
  }

  test("a wide document exercising every type at once") {
    val all = BDoc(Seq(
      "f01" -> BDouble(1.25), "f02" -> BString("s"),
      "f03" -> BDoc(Seq("k" -> BInt32(1))),
      "f04" -> BArr(Seq(BInt64(2L))),
      "f05" -> BBinary(0, Array[Byte](3)),
      "f07" -> BObjectId(Array.fill[Byte](12)(1)),
      "f08" -> BBool(false), "f09" -> BDateTime(1234L),
      "f0a" -> BNull, "f10" -> BInt32(-5), "f12" -> BInt64(6L),
      "f13" -> BDecimal128(new java.math.BigDecimal("7.125"))))
    assertSame(all)
    // and the same doc decoded back from its wire bytes (the real
    // hot-path input shape)
    assertSame(Bson.decode(Bson.encode(all)))
  }
}
