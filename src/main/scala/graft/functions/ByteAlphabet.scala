package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-to-unicode alphabet (Radford et al. 2019,
  * `bytes_to_unicode`): every RAW BYTE of a string's UTF-8 encoding
  * maps to one printable character, so byte-level BPE operates on a
  * clean 256-symbol alphabet with no control characters and no
  * whitespace — the published trick that makes byte-level tokenization
  * total (any input, exact roundtrip) without a byte-fallback escape
  * hatch.
  *
  * Mapping rule (same keep-set as the paper): printable bytes
  * 33–126, 161–172, 174–255 map to their own code point; the other 68
  * bytes (controls, space, DEL, 127–160, 173) map — in ascending byte
  * order — to consecutive code points from a shifted plane. The paper
  * uses 256+n; HERE the plane is U+E000+n (Unicode private use area):
  * [[BpeEncode]]'s id scheme gives single-character symbols their code
  * point, and 256+n would collide with its merge-product id range
  * `[256, 256+|merges|)` — E000+n keeps every base-symbol id disjoint
  * from every product id for any merges size, so
  * `unmap(decode(encode(map(s)))) == s` holds for EVERY string `s`
  * (spec-pinned on ASCII, multi-byte UTF-8, emoji, control bytes, and
  * multi-space runs — the mapped text contains no raw spaces, so the
  * GPT-2 pre-tokenizer's space-run drop disappears too; stated
  * difference from the paper's table, same structure).
  *
  * Scale shape: both directions are row-local compiled byte loops
  * (real `doGenCode`, static call — the table is a compile-time
  * constant), no shuffle, one output allocation.
  */
case class ByteToUnicode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"byte_to_unicode needs string, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteAlphabet.mapBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteAlphabet.mapBytes($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : ByteToUnicode = copy(child = newChild)
}

/** Inverse of [[ByteToUnicode]] — alphabet characters back to raw
  * bytes. Defined on alphabet images (exactly what decode emits);
  * a character outside the alphabet maps to `?` (0x3F) rather than
  * throwing, the lenient-sink convention.
  */
case class UnicodeToByte(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_to_byte needs string, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteAlphabet.unmapChars(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteAlphabet.unmapChars($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeToByte = copy(child = newChild)
}

object ByteAlphabet {

  /** Paper keep-set: bytes that map to their own code point. */
  private def kept(b: Int): Boolean =
    (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
      (b >= 174 && b <= 255)

  /** byte → alphabet char (non-kept bytes take U+E000+n in ascending
    * byte order — `57344 + (ROW_NUMBER() OVER (PARTITION BY kept
    * ORDER BY b) - 1)` derives the identical table on the oracle
    * side).
    */
  private[graft] val byteToChar: Array[Char] = {
    var n = 0
    Array.tabulate(256) { b =>
      if (kept(b)) b.toChar
      else { val c = (0xE000 + n).toChar; n += 1; c }
    }
  }

  private[graft] val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The whole per-row map loop (shared by interpreted eval and the
    * generated projection; static call — the table is constant).
    */
  def mapBytes(input: UTF8String): UTF8String = {
    val bytes = input.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The inverse per-row loop. */
  def unmapChars(input: UTF8String): UTF8String = {
    val s = input.toString
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = charToByte.getOrElse(s.charAt(i), '?'.toByte)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column entry points. */
  def byteToUnicode(text: Column): Column =
    Shims.column(ByteToUnicode(Shims.expression(text)))
  def unicodeToByte(text: Column): Column =
    Shims.column(UnicodeToByte(Shims.expression(text)))

  /** A string with every char mapped — the merges-table transport
    * ([[graft.functions.ByteBpe.fixtureMergesMapped]]).
    */
  private[graft] def mapString(s: String): String =
    s.getBytes("UTF-8").map(b => byteToChar(b & 0xff)).mkString
}
