package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bson, InProcessMongod, MongoWire}
import graft.sources.Bson._

/** BSON codec pinned against the specification's own published
  * byte vectors, OP_MSG cursor reads end to end over real sockets,
  * and the distributed ranged-partition scan.
  */
class MongoWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  test("BSON encode matches the spec's published vectors byte for " +
      "byte (bsonspec.org examples) and decode round-trips them") {
    // {"hello": "world"}
    val v1 = BDoc(Seq("hello" -> BString("world")))
    assert(hex(Bson.encode(v1)) ==
      "160000000268656c6c6f0006000000776f726c640000")
    assert(Bson.decode(Bson.encode(v1)) == v1)
    // {"BSON": ["awesome", 5.05, 1986]} — the spec renders 1986 as
    // int32 and 5.05 as double
    val v2 = BDoc(Seq("BSON" -> BArr(Seq(
      BString("awesome"), BDouble(5.05), BInt32(1986)))))
    assert(hex(Bson.encode(v2)) ==
      "310000000442534f4e002600000002300008000000617765736f6d6500" +
      "0131003333333333331440103200c20700000000")
    assert(Bson.decode(Bson.encode(v2)) == v2)
  }

  test("BSON round-trips every supported type including nesting, " +
      "and rejects unknown element types loudly") {
    val doc = BDoc(Seq(
      "d" -> BDouble(-0.125), "s" -> BString("héllo ✓"),
      "sub" -> BDoc(Seq("x" -> BInt32(7))),
      "arr" -> BArr(Seq(BInt64(1L), BNull, BBool(true))),
      "bin" -> BBinary(4, Array[Byte](1, 2, 3)),
      "oid" -> BObjectId(Array.tabulate(12)(_.toByte)),
      "b" -> BBool(false), "dt" -> BDateTime(1704067200123L),
      "n" -> BNull, "i" -> BInt32(Int.MinValue),
      "l" -> BInt64(Long.MaxValue)))
    val back = Bson.decode(Bson.encode(doc))
    // BBinary/BObjectId carry arrays — compare field by field
    assert(back.v.map(_._1) == doc.v.map(_._1))
    back.v.zip(doc.v).foreach {
      case ((_, BBinary(st1, b1)), (_, BBinary(st2, b2))) =>
        assert(st1 == st2 && b1.toSeq == b2.toSeq)
      case ((_, BObjectId(b1)), (_, BObjectId(b2))) =>
        assert(b1.toSeq == b2.toSeq)
      case ((_, a), (_, b)) => assert(a == b)
    }
    // decimal128 (0x13) is not implemented: loud error, no skip
    val bad = Bson.encode(BDoc(Seq("x" -> BInt32(1))))
    bad(4) = 0x13.toByte
    intercept[Exception](Bson.decode(bad))
  }

  test("schema bridges: wire numeric widenings (int32→long, " +
      "int32/int64→double) and null carry-through") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType)))
    // a BSON writer picked int32 for a small long and int64 for a
    // whole double — the reader must widen, the live-server reality
    val doc = BDoc(Seq("a" -> BInt32(7), "b" -> BInt64(3),
      "c" -> BNull))
    val r = Bson.docToRow(doc, schema)
    assert(r.getLong(0) == 7L && r.getDouble(1) == 3.0 && r.isNullAt(2))
    // missing field ⇒ null
    val r2 = Bson.docToRow(BDoc(Seq("a" -> BInt64(1))), schema)
    assert(r2.isNullAt(1) && r2.isNullAt(2))
  }

  test("decimal128 (IEEE 754-2008 BID): the canonical '1' encoding " +
      "byte-for-byte, exact round-trips across the exponent range, " +
      "second-form zeros, loud NaN/Infinity/35-digit errors, and " +
      "the DecimalType/ObjectId row bridges") {
    import java.math.{BigDecimal => JBD}
    // NumberDecimal("1"): biased exponent 6176 << 49 = 0x3040…,
    // coefficient 1 — the widely documented canonical encoding
    val b = Bson.encode(BDoc(Seq("d" -> BDecimal128(new JBD("1")))))
    assert(hex(b) ==
      "18000000" + "13" + "6400" +
        "0100000000000000" + "0000000000004030" + "00")
    // exact round-trips: sign, fractional scale, the full 34-digit
    // coefficient, both exponent extremes
    Seq("0", "1", "-0.25", "123.450",
        "9999999999999999999999999999999999",      // 34 nines
        "-9999999999999999999999999999999999",
        "1E-6176", "1E+6111", "-7.2E-3000").foreach { s =>
      val v = new JBD(s)
      val (hi, lo) = Bson.Decimal128.encode(v)
      assert(Bson.Decimal128.decode(hi, lo) == v, s)
      val back = Bson.decode(Bson.encode(BDoc(Seq(
        "x" -> BDecimal128(v)))))
      assert(back == BDoc(Seq("x" -> BDecimal128(v))), s)
    }
    // 35 significant digits / out-of-range exponents refuse to encode
    intercept[Exception](Bson.Decimal128.encode(
      new JBD("99999999999999999999999999999999999")))
    intercept[Exception](Bson.Decimal128.encode(new JBD("1E+6112")))
    intercept[Exception](Bson.Decimal128.encode(new JBD("1E-6177")))
    // NaN (combination 11111) and Infinity (11110) are loud errors —
    // a Spark DecimalType column cannot carry them
    intercept[Exception](Bson.Decimal128.decode(0x7C00000000000000L, 0L))
    intercept[Exception](Bson.Decimal128.decode(0x7800000000000000L, 0L))
    // second coefficient form (prefix 11, not NaN/Inf): coefficient
    // exceeds the 34-digit canonical range, which the standard reads
    // as an exact zero at the declared exponent
    assert(Bson.Decimal128.decode(0x6000000000000000L, 0L) ==
      JBD.valueOf(0L, 6176))
    // row bridges: exact rescale to the column scale, loud otherwise
    val schema = StructType(Seq(
      StructField("p", DecimalType(12, 2)),
      StructField("oid", StringType)))
    val doc = BDoc(Seq("p" -> BDecimal128(new JBD("3.5")),
      "oid" -> BObjectId(Array.tabulate(12)(_.toByte))))
    val r = Bson.docToRow(doc, schema)
    assert(r.getDecimal(0) == new JBD("3.50"))
    assert(r.getString(1) == "000102030405060708090a0b")
    intercept[Exception](Bson.docToRow(BDoc(Seq(
      "p" -> BDecimal128(new JBD("3.555")), "oid" -> BNull)), schema))
    // rowToDoc carries decimals back as decimal128
    val rt = Bson.rowToDoc(Row(new JBD("3.50"), "x"),
      StructType(Seq(StructField("p", DecimalType(12, 2)),
        StructField("s", StringType))))
    assert(rt.v.head == ("p" -> BDecimal128(new JBD("3.50"))))
  }

  test("end-to-end cursor scan over real sockets: multi-partition " +
      "ranged read equals the served table, getMore paging " +
      "exercised, empty ranges are fine") {
    import spark.implicits._
    val n = 1000
    val df = (0L until n.toLong).map(i =>
        (i, s"name$i", (i % 25).toInt, i * 1.5 + 0.25))
      .toDF("k", "name", "grp", "bal")
    val srv = InProcessMongod.serve(df, "k", "testdb", "things")
    try {
      // batchSize 64 << 1000/4 partitions ⇒ every partition pages
      // through several getMore rounds
      val got = MongoWire.read(spark, "127.0.0.1", srv.port,
        "testdb", "things", df.schema, "k", 0L, n.toLong,
        numPartitions = 4, batchSize = 64)
      assert(got.rdd.getNumPartitions == 4)
      val a = got.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3))).sortBy(_._1)
      val b = df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getDouble(3))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
      // a window wider than the data and a window with no rows
      assert(MongoWire.read(spark, "127.0.0.1", srv.port, "testdb",
        "things", df.schema, "k", -500L, 5000L, 8).count() == n)
      assert(MongoWire.read(spark, "127.0.0.1", srv.port, "testdb",
        "things", df.schema, "k", 5000L, 6000L, 3).count() == 0)
    } finally srv.close()
  }

  test("the distributed scan is genuinely per-partition: each range " +
      "sees only its keys and the union is a disjoint partition of " +
      "the table") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v$i"))
      .toDF("k", "name")
    val srv = InProcessMongod.serve(df, "k", "db", "c")
    try {
      val schema = df.schema
      val perPart = MongoWire.read(spark, "127.0.0.1", srv.port,
          "db", "c", schema, "k", 0L, 100L, numPartitions = 5,
          batchSize = 7)
        .rdd.mapPartitionsWithIndex { (p, it) =>
          Iterator((p, it.map(_.getLong(0)).toVector))
        }.collect().toMap
      assert(perPart.size == 5)
      // contiguous disjoint ranges, 20 keys each
      perPart.foreach { case (p, ks) =>
        assert(ks.size == 20 && ks.min == p * 20L &&
          ks.max == p * 20L + 19L, s"partition $p got $ks")
      }
    } finally srv.close()
  }
}
