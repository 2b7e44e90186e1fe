package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BSON identifier renderings (SURVEY §2.6 F3): ObjectId and the
  * UUID binary subtypes, as pure built-in expression compositions over
  * the hex string of the 16/12 raw bytes — codegen-friendly, no UDFs.
  *
  * UUID byte-order semantics follow the public BSON binary-subtype
  * conventions (reference behavior at `core/extractor.py:131-170`):
  * subtype 4 (standard) and Python-legacy subtype 3 store RFC 4122
  * bytes as-is; Java-legacy subtype 3 stores each 8-byte half reversed;
  * C#-legacy stores the first three fields little-endian.
  */
object BsonIds {

  /** ObjectId: 12 bytes → 24 lowercase hex chars
    * (`core/extractor.py:172-177`).
    */
  def objectIdHex(bin: Column): Column = lower(hex(bin))

  private def dashes(h32: Column): Column =
    concat_ws("-",
      substring(h32, 1, 8), substring(h32, 9, 4), substring(h32, 13, 4),
      substring(h32, 17, 4), substring(h32, 21, 12))

  /** Standard (subtype 4) and Python-legacy (subtype 3) UUID: bytes in
    * RFC 4122 order → canonical 36-char form.
    */
  def uuidStandard(bin: Column): Column = lower(dashes(hex(bin)))

  /** Reverse a byte span of the 32-char hex string (1-based hex
    * positions, whole bytes).
    */
  private def revBytes(h: Column, startHex: Int, nBytes: Int): Column =
    concat((nBytes - 1 to 0 by -1).map(i =>
      substring(h, startHex + i * 2, 2)): _*)

  /** Java-legacy (subtype 3 written by the Java driver): both 8-byte
    * halves are byte-reversed relative to RFC 4122.
    */
  def uuidJavaLegacy(bin: Column): Column = {
    val h = hex(bin)
    lower(dashes(concat(revBytes(h, 1, 8), revBytes(h, 17, 8))))
  }

  /** C#-legacy: first three fields little-endian, rest as-is. */
  def uuidCsharpLegacy(bin: Column): Column = {
    val h = hex(bin)
    lower(dashes(concat(
      revBytes(h, 1, 4), revBytes(h, 9, 2), revBytes(h, 13, 2),
      substring(h, 17, 16))))
  }

  /** Subtype-directed decode: 4 → standard; 3 → the representation
    * `legacyMode` says this collection's writers used ("python",
    * "java", "csharp") — the reference resolves the same ambiguity with
    * a fallback chain (`core/extractor.py:138-159`).
    */
  def uuidFromSubtype(bin: Column, subtype: Column,
                      legacyMode: String = "python"): Column = {
    val legacy = legacyMode match {
      case "java"   => uuidJavaLegacy(bin)
      case "csharp" => uuidCsharpLegacy(bin)
      case _        => uuidStandard(bin)   // python-legacy: raw order
    }
    when(subtype === 4, uuidStandard(bin))
      .when(subtype === 3, legacy)
      .otherwise(lower(hex(bin)))          // other subtypes: plain hex
  }
}
