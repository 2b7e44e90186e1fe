package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-position polynomial rolling hash of every `width`-code-point
  * window of a string — the O(1)-per-character primitive that replaces
  * an O(width)-per-position digest in sliding-window machinery
  * (Karp–Rabin 1987; the same rate argument as
  * [[GearCdcChunks]] vs [[CdcChunks]]'s md5-window rule). Position
  * `pos` (0-based) carries
  *
  *   h(pos) = Σ_{t=0..width−1} cp(pos+t) · M^(width−1−t)  (mod 2^64)
  *
  * over Unicode CODE POINTS (matching the oracle's `unicode(substr(…))`
  * and `length()` arithmetic), computed incrementally: Horner for the
  * first window, then one subtract-shift-add per slide — 64-bit Long
  * wrap-around IS the mod. Returns `array<bigint>` of length
  * `len − width + 1` (empty when the string is shorter than `width`);
  * NULL input stays NULL.
  *
  * The multiplier M is derived by both engines independently (the
  * [[SimHash64]] digest-prefix convention): the first 15 hex chars of
  * md5("graft-roll") forced odd — an odd multiplier is invertible mod
  * 2^64, so no window information collapses. 64-bit equality over
  * millions of windows has birthday-collision odds ~1e-7 per million
  * pairs — the census this feeds treats hash equality as span
  * equality, the same contract the md5 teaching rule already makes
  * (md5 truncation there, 64-bit polynomial here; a production
  * deployment that cannot tolerate 1e-7 verifies survivors with one
  * exact pass, exactly like the Bloom verify join).
  *
  * Scale shape: row-local compiled loop (real `doGenCode`, object
  * reference so `width`/`mult` ride as expression state), no shuffle,
  * no substring materialization — the array is the only allocation.
  */
case class RollingWindowHash(child: Expression, width: Int,
    mult: Long) extends UnaryExpression {

  require(width >= 1, s"width must be >= 1, got $width")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_window_hash needs string, got ${other.sql}")
    }

  // M^(width-1) mod 2^64 — the aged-out term's weight
  @transient private lazy val multTop: Long = {
    var p = 1L
    var i = 1
    while (i < width) { p *= mult; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[UTF8String])

  /** Shared per-row loop (interpreted eval + generated projection via
    * object reference — see [[BpeTokenCount.count]]).
    */
  def hashes(input: UTF8String): ArrayData = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n < width)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - width + 1)
    var h = 0L
    var i = 0
    while (i < width) { h = h * mult + cps(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - width) {
      h = (h - cps(p - 1) * multTop) * mult + cps(p + width - 1)
      out(p) = h
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollHash", this,
      classOf[RollingWindowHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RollingWindowHash = copy(child = newChild)
}

object RollingHash {

  /** The default multiplier: first 15 hex chars of md5("graft-roll")
    * as a 60-bit value, forced odd — `CAST('0x' ||
    * substr(md5('graft-roll'), 1, 15) AS BIGINT) | 1` on the oracle
    * side derives the identical constant.
    */
  val M: Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("graft-roll".getBytes("UTF-8"))
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h >>> 4) | 1L
  }

  /** Column entry point: `rolling_window_hash(text, width)`. */
  def rollingWindowHash(text: Column, width: Int,
      mult: Long = M): Column =
    Shims.column(RollingWindowHash(Shims.expression(text), width, mult))
}
