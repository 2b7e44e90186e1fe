package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal BSON codec — the document format of the MongoDB wire
  * protocol, implemented from the PUBLIC specification
  * (bsonspec.org, spec version 1.1): a document is
  * `int32 totalLen (LE) | elements | 0x00`, an element is
  * `type byte | cstring name | value`. Implemented element types are
  * the ones the engine's tables need (double 0x01, string 0x02,
  * embedded document 0x03, array 0x04, binary 0x05, ObjectId 0x07,
  * bool 0x08, UTC datetime 0x09, null 0x0A, int32 0x10, int64 0x12);
  * anything else is an explicit decode error, never a silent skip.
  * Spec-vector interop is pinned in MongoWireSpec against the
  * canonical examples published WITH the spec (`{"hello":"world"}`
  * and `{"BSON": ["awesome", 5.05, 1986]}` byte-for-byte), so the
  * codec is checked against the format's own ground truth, not
  * against itself.
  *
  * The value model is a tiny ADT ([[BVal]]) with schema-directed
  * bridges to Spark rows ([[rowToDoc]] / [[docToRow]]) — the reader
  * decodes on executors, one compiled loop per document, no
  * reflection.
  */
object Bson {

  /** Lowercase hex render via a lookup table. The obvious
    * `bytes.map(b => f"$b%02x").mkString` allocates a
    * `java.util.Formatter` per BYTE (~10 µs each) — measured at ~4 s
    * for one 20k-key `$sample` sort in the double; this is the same
    * string in ~10 ns/byte. Used for every ObjectId/UUID render on
    * the decode hot path.
    */
  private[graft] val HexChars = "0123456789abcdef".toCharArray
  private[graft] def hexString(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }
  private[graft] def hexByte(b: Byte): String = {
    val x = b & 0xff
    new String(Array(HexChars(x >>> 4), HexChars(x & 0xf)))
  }

  sealed trait BVal
  final case class BDouble(v: Double) extends BVal
  final case class BString(v: String) extends BVal
  final case class BDoc(v: Seq[(String, BVal)]) extends BVal
  final case class BArr(v: Seq[BVal]) extends BVal
  final case class BBinary(subtype: Byte, v: Array[Byte]) extends BVal
  final case class BObjectId(v: Array[Byte]) extends BVal
  final case class BBool(v: Boolean) extends BVal
  /** UTC datetime: millis since epoch. */
  final case class BDateTime(ms: Long) extends BVal
  case object BNull extends BVal
  final case class BInt32(v: Int) extends BVal
  final case class BInt64(v: Long) extends BVal
  /** decimal128 (0x13), decoded to exact unscaled×10^exp form. */
  final case class BDecimal128(v: java.math.BigDecimal) extends BVal
  /** MinKey (0xFF) / MaxKey (0x7F) — the open range endpoints
    * `config.chunks` uses for a sharded collection's first/last
    * chunk bounds; valueless sentinels below/above every BSON value.
    */
  case object BMinKey extends BVal
  case object BMaxKey extends BVal

  /** Marker metadata for VARIANT columns: a wire field whose sampled
    * BSON types are irreconcilable (or nested documents) infers as a
    * StringType column carrying this marker, and every value decodes
    * to its RELAXED EXTENDED JSON v2 render (the public
    * mongoexport/analyser interchange format) — lossless, and
    * directly consumable by the per-value `type_tag` profile path.
    * The reference's core use case (per-field type histograms,
    * `core/analyser.py:286`) needs exactly this: keep the values,
    * type them per-document downstream.
    */
  val VariantKey = "graft_variant"

  /** A field is variant when it carries the marker metadata (both
    * renders) OR is declared as Spark 4's native `VariantType`
    * directly (an explicit user schema) — either way, pushdowns must
    * refuse it and the decode goes per-value.
    */
  def isVariantField(f: org.apache.spark.sql.types.StructField)
      : Boolean = f.metadata.contains(VariantKey) ||
    f.dataType == org.apache.spark.sql.types.VariantType

  def variantField(name: String)
      : org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(name,
      org.apache.spark.sql.types.StringType, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putBoolean(VariantKey, true).build())

  /** The native Spark-4 render of a mixed-type field: a real
    * `VariantType` column (shredded storage, variant-aware
    * expressions — `variant_get`, `schema_of_variant`, `to_json`),
    * the idiomatic Spark-4 answer where the StringType render is the
    * profiling bridge.
    */
  def variantTypedField(name: String)
      : org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(name,
      org.apache.spark.sql.types.VariantType, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putBoolean(VariantKey, true).build())

  /** One wire value → a Spark `VariantVal`, by a DIRECT walk of the
    * decoded value tree through `VariantBuilder`'s public append API
    * — the binary layout stays Spark's to define (this code never
    * hand-rolls it), but the decode hot path no longer renders a
    * JSON string and re-parses it per value. Byte-equivalence with
    * the `VariantBuilder.parseJson(relaxedJson(v))` path is pinned
    * in VariantDirectSpec over the full BSON type vocabulary,
    * including parseJson's numeric quirk replicated below: a finite
    * double whose canonical render has no exponent parses as a
    * variant DECIMAL (Spark's `parseJson` tries decimal first for
    * any plain `-?[0-9.]+` literal), while exponent-form renders
    * stay variant doubles.
    */
  def variantVal(v: BVal): org.apache.spark.unsafe.types.VariantVal = {
    val b = new org.apache.spark.types.variant.VariantBuilder(false)
    appendVariant(b, v)
    val variant = b.result()
    new org.apache.spark.unsafe.types.VariantVal(
      variant.getValue, variant.getMetadata)
  }

  /** The parseJson-equivalent variant render of the retained
    * Extended-JSON wrappers: dates/oids/binary/decimal stay
    * `$`-wrapped OBJECTS in the variant (exactly what parsing the
    * relaxed render produced in every prior release), so downstream
    * `variant_get`/`to_json` consumers see an unchanged shape.
    */
  private def appendVariant(
      b: org.apache.spark.types.variant.VariantBuilder,
      v: BVal): Unit = v match {
    case BNull => b.appendNull()
    case BBool(x) => b.appendBoolean(x)
    case BInt32(x) => b.appendLong(x.toLong)
    case BInt64(x) => b.appendLong(x)
    case BString(x) => b.appendString(x)
    case BDouble(x) =>
      if (!java.lang.Double.isFinite(x))
        appendVariant(b,
          BDoc(Seq("$numberDouble" -> BString(x.toString))))
      else {
        val repr = x.toString
        if (repr.indexOf('E') < 0)
          b.appendDecimal(new java.math.BigDecimal(repr))
        else b.appendDouble(x)
      }
    case BDecimal128(x) =>
      appendVariant(b,
        BDoc(Seq("$numberDecimal" -> BString(x.toPlainString))))
    case BMinKey =>
      appendVariant(b, BDoc(Seq("$minKey" -> BInt32(1))))
    case BMaxKey =>
      appendVariant(b, BDoc(Seq("$maxKey" -> BInt32(1))))
    case BDateTime(ms) =>
      appendVariant(b, BDoc(Seq(
        "$date" -> BDoc(Seq("$numberLong" -> BString(ms.toString))))))
    case BObjectId(x) =>
      appendVariant(b, BDoc(Seq(
        "$oid" -> BString(hexString(x)))))
    case BBinary(sub, x) =>
      appendVariant(b, BDoc(Seq("$binary" -> BDoc(Seq(
        "base64" -> BString(
          java.util.Base64.getEncoder.encodeToString(x)),
        "subType" -> BString(hexByte(sub)))))))
    case BArr(xs) =>
      val start = b.getWritePos
      val offsets = new java.util.ArrayList[Integer](xs.size)
      xs.foreach { x =>
        offsets.add(Int.box(b.getWritePos - start))
        appendVariant(b, x)
      }
      b.finishWritingArray(start, offsets)
    case BDoc(kvs) =>
      val start = b.getWritePos
      val fields = new java.util.ArrayList[
        org.apache.spark.types.variant.VariantBuilder.FieldEntry](
        kvs.size)
      kvs.foreach { case (k, x) =>
        val id = b.addKey(k)
        fields.add(
          new org.apache.spark.types.variant.VariantBuilder.FieldEntry(
            k, id, b.getWritePos - start))
        appendVariant(b, x)
      }
      b.finishWritingObject(start, fields)
  }

  /** The JSON-round-trip variant encode (pre-r18 behavior) — kept
    * ONLY as the equivalence baseline for VariantDirectSpec.
    */
  def variantValViaJson(v: BVal)
      : org.apache.spark.unsafe.types.VariantVal = {
    val variant = org.apache.spark.types.variant.VariantBuilder
      .parseJson(relaxedJson(v), false)
    new org.apache.spark.unsafe.types.VariantVal(
      variant.getValue, variant.getMetadata)
  }

  /** Relaxed Extended JSON v2 render of one wire value (numbers and
    * strings plain; dates canonical `$numberLong` millis for
    * determinism; binary/oid/decimal in their `$`-wrapped forms).
    */
  def relaxedJson(v: BVal): String = v match {
    case BNull => "null"
    case BBool(x) => if (x) "true" else "false"
    case BInt32(x) => x.toString
    case BInt64(x) => x.toString
    case BDouble(x) =>
      if (java.lang.Double.isFinite(x)) x.toString
      else "{\"$numberDouble\":\"" + x + "\"}"
    case BString(x) => jsonQuote(x)
    case BDecimal128(x) =>
      "{\"$numberDecimal\":\"" + x.toPlainString + "\"}"
    case BDateTime(ms) =>
      "{\"$date\":{\"$numberLong\":\"" + ms + "\"}}"
    case BObjectId(x) =>
      "{\"$oid\":\"" + hexString(x) + "\"}"
    case BBinary(sub, x) =>
      "{\"$binary\":{\"base64\":\"" +
        java.util.Base64.getEncoder.encodeToString(x) +
        "\",\"subType\":\"" + hexByte(sub) + "\"}}"
    case BArr(xs) => xs.map(relaxedJson).mkString("[", ",", "]")
    case BDoc(kvs) => kvs.map { case (k, x) =>
      jsonQuote(k) + ":" + relaxedJson(x)
    }.mkString("{", ",", "}")
    case BMinKey => "{\"$minKey\":1}"
    case BMaxKey => "{\"$maxKey\":1}"
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** The wire type's documented name — for error messages. */
  def typeName(v: BVal): String = v match {
    case _: BDouble => "double"
    case _: BString => "string"
    case _: BDoc => "document"
    case _: BArr => "array"
    case _: BBinary => "binData"
    case _: BObjectId => "objectId"
    case _: BBool => "bool"
    case _: BDateTime => "date"
    case BNull => "null"
    case _: BInt32 => "int"
    case _: BInt64 => "long"
    case _: BDecimal128 => "decimal"
    case BMinKey => "minKey"
    case BMaxKey => "maxKey"
  }

  // — encode —

  def encode(doc: BDoc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream,
                       doc: BDoc): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    doc.v.foreach { case (name, v) => writeElement(body, name, v) }
    val total = 4 + body.size() + 1
    out.write(le32(total))
    body.writeTo(out)
    out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream,
                           name: String, v: BVal): Unit = {
    def cstring(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(!b.contains(0.toByte), s"cstring with NUL: $s")
      out.write(b); out.write(0)
    }
    v match {
      case BDouble(d) =>
        out.write(0x01); cstring(name)
        out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case BString(s) =>
        out.write(0x02); cstring(name)
        val b = s.getBytes(StandardCharsets.UTF_8)
        out.write(le32(b.length + 1)); out.write(b); out.write(0)
      case d: BDoc =>
        out.write(0x03); cstring(name); writeDoc(out, d)
      case BArr(xs) =>
        out.write(0x04); cstring(name)
        writeDoc(out, BDoc(xs.zipWithIndex.map { case (x, i) =>
          (i.toString, x)
        }))
      case BBinary(st, b) =>
        out.write(0x05); cstring(name)
        out.write(le32(b.length)); out.write(st.toInt); out.write(b)
      case BObjectId(b) =>
        require(b.length == 12, "ObjectId must be 12 bytes")
        out.write(0x07); cstring(name); out.write(b)
      case BBool(x) =>
        out.write(0x08); cstring(name); out.write(if (x) 1 else 0)
      case BDateTime(ms) =>
        out.write(0x09); cstring(name); out.write(le64(ms))
      case BNull =>
        out.write(0x0A); cstring(name)
      case BInt32(i) =>
        out.write(0x10); cstring(name); out.write(le32(i))
      case BInt64(l) =>
        out.write(0x12); cstring(name); out.write(le64(l))
      case BDecimal128(bd) =>
        out.write(0x13); cstring(name)
        val (hi, lo) = Decimal128.encode(bd)
        out.write(le64(lo)); out.write(le64(hi))
      case BMinKey =>
        out.write(0xFF); cstring(name)
      case BMaxKey =>
        out.write(0x7F); cstring(name)
    }
  }

  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i)
      .array()
  private def le64(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l)
      .array()

  // — decode —

  def decode(bytes: Array[Byte]): BDoc = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    readDoc(buf)
  }

  /** Reads one document starting at the buffer position. */
  def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val total = buf.getInt
    val fields = Seq.newBuilder[(String, BVal)]
    while (buf.position() < start + total - 1)
      fields += readElement(buf)
    val term = buf.get
    require(term == 0, s"document not NUL-terminated (got $term)")
    BDoc(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get
    while (b != 0) { sb.write(b.toInt); b = buf.get }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  private def readElement(buf: ByteBuffer): (String, BVal) = {
    val t = buf.get
    val name = readCString(buf)
    val v: BVal = t match {
      case 0x01 => BDouble(java.lang.Double.longBitsToDouble(buf.getLong))
      case 0x02 =>
        val len = buf.getInt
        val b = new Array[Byte](len - 1); buf.get(b)
        require(buf.get == 0, "string not NUL-terminated")
        BString(new String(b, StandardCharsets.UTF_8))
      case 0x03 => readDoc(buf)
      case 0x04 => BArr(readDoc(buf).v.map(_._2))
      case 0x05 =>
        val len = buf.getInt; val st = buf.get
        val b = new Array[Byte](len); buf.get(b)
        BBinary(st, b)
      case 0x07 =>
        val b = new Array[Byte](12); buf.get(b); BObjectId(b)
      case 0x08 => BBool(buf.get != 0)
      case 0x09 => BDateTime(buf.getLong)
      case 0x0A => BNull
      case 0x10 => BInt32(buf.getInt)
      case 0x12 => BInt64(buf.getLong)
      case 0x13 =>
        val lo = buf.getLong; val hi = buf.getLong
        BDecimal128(Decimal128.decode(hi, lo))
      // MinKey is 0xFF on the wire = -1 as a signed byte
      case -1 => BMinKey
      case 0x7F => BMaxKey
      case other => throw new IllegalArgumentException(
        f"unsupported BSON element type 0x$other%02x at field '$name'")
    }
    (name, v)
  }

  /** decimal128 in the Binary Integer Decimal (BID) encoding —
    * IEEE 754-2008's interchange format, implemented from the PUBLIC
    * standard's layout (1 sign bit; if the two bits after the sign
    * are not `11`, a 14-bit biased exponent (bias 6176) then a
    * 113-bit coefficient; the `11` prefix marks either the second
    * coefficient form, NaN (`11111`), or infinity (`11110`)). The
    * value is `(-1)^sign × coefficient × 10^(exponent−6176)` —
    * exactly a `java.math.BigDecimal(unscaled, scale=−exp)`.
    *
    * Scope contract, loud on violation: NaN/±Infinity cannot land in
    * a Spark `DecimalType` column, so decode REJECTS them rather
    * than smuggling a sentinel; second-form coefficients are > 10⁴⁸
    * and therefore always exceed the 34-digit canonical range, which
    * the standard treats as value 0 — decoded as exact zero at the
    * declared exponent. Encode requires ≤ 34 significant digits and
    * exponent within [−6176, 6111] (everything a Spark
    * `DecimalType(38,s)` value can hold after its own bounds).
    */
  object Decimal128 {
    private val Bias = 6176
    private val CoeffMask = (1L << 49) - 1      // high 49 of 113 bits
    private val MaxCoeff = new java.math.BigInteger("9" * 34)

    /** (hi, lo) 64-bit words of the 128-bit BID encoding. */
    def encode(bd: java.math.BigDecimal): (Long, Long) = {
      val unscaled = bd.unscaledValue()
      val sign = if (unscaled.signum() < 0) 1L else 0L
      val coeff = unscaled.abs()
      require(coeff.compareTo(MaxCoeff) <= 0,
        s"decimal128 carries at most 34 significant digits: $bd")
      val exp = -bd.scale()
      require(exp >= -Bias && exp <= 6111,
        s"decimal128 exponent out of range [-6176, 6111]: $bd")
      val biased = (exp + Bias).toLong
      val lo = coeff.longValue()                 // low 64 bits
      val hiCoeff = coeff.shiftRight(64).longValue() & CoeffMask
      val hi = (sign << 63) | (biased << 49) | hiCoeff
      (hi, lo)
    }

    def decode(hi: Long, lo: Long): java.math.BigDecimal = {
      val sign = (hi >>> 63) & 1L
      if (((hi >>> 61) & 3L) == 3L) {
        val top5 = (hi >>> 58) & 0x1FL
        require(top5 != 0x1FL && top5 != 0x1EL,
          "decimal128 NaN/Infinity cannot be read into a Spark " +
            "DecimalType column")
        // second coefficient form: implied '100' prefix puts the
        // coefficient above 10^34 — non-canonical, value is zero
        val exp = ((hi >>> 47) & 0x3FFFL).toInt - Bias
        val z = java.math.BigDecimal.valueOf(0L, -exp)
        return if (sign == 1L) z.negate() else z
      }
      val exp = ((hi >>> 49) & 0x3FFFL).toInt - Bias
      val coeff = java.math.BigInteger.valueOf(hi & CoeffMask)
        .shiftLeft(64)
        .or(new java.math.BigInteger(1, {
          val b = new Array[Byte](8)
          ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN).putLong(lo)
          b
        }))
      val unscaled = if (sign == 1L) coeff.negate() else coeff
      new java.math.BigDecimal(unscaled, -exp)
    }
  }

  // — byte-level element access (no full decode) —
  //
  // BSON is self-describing: every element's length is computable
  // from its type byte (directly or via an embedded int32), so a
  // server can project or probe single fields by SPLICING bytes —
  // exactly how a real server's projection stage avoids
  // materializing unrequested fields. These power InProcessMongod's
  // `projection` handling and per-field filter evaluation while
  // preserving its "never re-encode stored documents" contract:
  // served bytes are byte-ranges of the stored frame, not codec
  // output.

  /** Length in bytes of one element VALUE whose type byte is `t`,
    * with the buffer positioned at the value start (position is
    * restored). Loud error on unimplemented types — never a skip.
    */
  private def valueLength(t: Byte, buf: ByteBuffer): Int = t match {
    case 0x01 | 0x09 | 0x12 => 8
    case 0x02 => 4 + buf.getInt(buf.position())
    case 0x03 | 0x04 => buf.getInt(buf.position())
    case 0x05 => 4 + 1 + buf.getInt(buf.position())
    case 0x07 => 12
    case 0x08 => 1
    case 0x0A => 0
    case 0x10 => 4
    case 0x13 => 16
    case other => throw new IllegalArgumentException(
      f"unsupported BSON element type 0x$other%02x")
  }

  /** Walks a document's top-level elements without decoding values,
    * invoking `f(name, elemStart, elemEnd)` per element (offsets
    * into `bytes`, element = type byte + name + value).
    */
  private def walkElements(bytes: Array[Byte])
                          (f: (String, Int, Int) => Unit): Unit = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val total = buf.getInt
    while (buf.position() < total - 1) {
      val start = buf.position()
      val t = buf.get
      val name = readCString(buf)
      val vlen = valueLength(t, buf)
      val end = buf.position() + vlen
      f(name, start, end)
      buf.position(end)
    }
    require(bytes(total - 1) == 0, "document not NUL-terminated")
  }

  /** Projects a document to the `keep` fields by byte splice —
    * selected elements are copied verbatim (order preserved) into a
    * fresh document frame; values are never decoded.
    */
  def projectRaw(bytes: Array[Byte],
                 keep: scala.collection.Set[String]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    walkElements(bytes) { (name, s, e) =>
      if (keep.contains(name)) body.write(bytes, s, e - s)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(le32(4 + body.size() + 1))
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  /** Decodes exactly one named top-level field (None if absent);
    * every other element is length-skipped, not decoded.
    */
  def extractRaw(bytes: Array[Byte], field: String): Option[BVal] = {
    var hit: Option[BVal] = None
    walkElements(bytes) { (name, s, e) =>
      if (hit.isEmpty && name == field) {
        val buf = ByteBuffer.wrap(bytes, s, e - s)
          .order(ByteOrder.LITTLE_ENDIAN)
        hit = Some(readElement(buf)._2)
      }
    }
    hit
  }

  // — schema-directed Spark bridges —

  /** Row → BSON document under a schema (field order = schema order;
    * nulls encode as BSON null so the wire carries the full shape).
    */
  def rowToDoc(row: Row, schema: StructType): BDoc =
    BDoc(schema.fields.zipWithIndex.map { case (f, i) =>
      val v: BVal =
        if (row.isNullAt(i)) BNull
        else f.dataType match {
          case LongType => BInt64(row.getLong(i))
          case IntegerType => BInt32(row.getInt(i))
          case DoubleType => BDouble(row.getDouble(i))
          case FloatType => BDouble(row.getFloat(i).toDouble)
          case StringType => BString(row.getString(i))
          case BooleanType => BBool(row.getBoolean(i))
          case BinaryType => BBinary(0, row.getAs[Array[Byte]](i))
          case _: DecimalType =>
            BDecimal128(row.getDecimal(i))
          case TimestampType =>
            BDateTime(row.getTimestamp(i).getTime)
          case ArrayType(FloatType, _) =>
            BArr(row.getSeq[Float](i).map(x => BDouble(x.toDouble)))
          case ArrayType(DoubleType, _) =>
            BArr(row.getSeq[Double](i).map(BDouble))
          case ArrayType(LongType, _) =>
            BArr(row.getSeq[Long](i).map(BInt64))
          case ArrayType(StringType, _) =>
            BArr(row.getSeq[String](i).map(BString))
          case dt => throw new IllegalArgumentException(
            s"rowToDoc: unsupported type $dt for field ${f.name}")
        }
      (f.name, v)
    }.toSeq)

  /** BSON document → Row under a schema: fields looked up by name
    * (wire order need not match), missing ⇒ null, with the numeric
    * widenings a live MongoDB routinely needs (int32 read as long,
    * int64/int32 read as double — BSON writers pick the narrowest
    * type per VALUE, so a column's wire type varies row to row).
    */
  def docToRow(doc: BDoc, schema: StructType): Row = {
    val m = doc.v.toMap
    Row.fromSeq(schema.fields.toSeq.map { f =>
      m.get(f.name) match {
        case None | Some(BNull) => null
        // the render path; native VariantType rides the DSv2
        // (InternalRow) decode, not this external-Row one
        case Some(v) if isVariantField(f) &&
            f.dataType == org.apache.spark.sql.types.StringType =>
          relaxedJson(v)
        case Some(v) => (f.dataType, v) match {
          case (LongType, BInt64(x)) => x
          case (LongType, BInt32(x)) => x.toLong
          case (IntegerType, BInt32(x)) => x
          case (DoubleType, BDouble(x)) => x
          case (DoubleType, BInt64(x)) => x.toDouble
          case (DoubleType, BInt32(x)) => x.toDouble
          case (FloatType, BDouble(x)) => x.toFloat
          case (StringType, BString(x)) => x
          case (BooleanType, BBool(x)) => x
          case (BinaryType, BBinary(_, x)) => x
          // exact rescale to the column's declared scale: a value
          // that cannot be represented is a loud error, not a round
          case (dt: DecimalType, BDecimal128(x)) =>
            x.setScale(dt.scale)
          // the reference renders ObjectId as its 24-char hex string
          case (StringType, BObjectId(x)) =>
            hexString(x)
          case (TimestampType, BDateTime(ms)) =>
            new java.sql.Timestamp(ms)
          case (ArrayType(FloatType, _), BArr(xs)) =>
            xs.map { case BDouble(d) => d.toFloat
                     case other => throw new IllegalArgumentException(
                       s"array elem $other for ${f.name}") }
          case (ArrayType(DoubleType, _), BArr(xs)) =>
            xs.map { case BDouble(d) => d
                     case other => throw new IllegalArgumentException(
                       s"array elem $other for ${f.name}") }
          case (dt, bv) => throw new IllegalArgumentException(
            s"docToRow: cannot read $bv as $dt for field ${f.name}")
        }
      }
    })
  }
}
