package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Row-local 64-bit perceptual fingerprint of a PCM audio payload —
  * the [[DHash64]] recipe transposed to 1-D: trim silence, split the
  * signal into 65 equal windows, sum each window's absolute sample
  * values (an exact-integer "energy"), then one bit per adjacent
  * window pair (`energy(w) < energy(w+1)`). The energy-DELTA shape is
  * the same idea as published audio fingerprints (Haitsma & Kalker's
  * 2002 "robust audio hash" thresholds band-energy differences across
  * frames); HERE the spectral filterbank is replaced by plain
  * time-domain window energies so every step is EXACT integer
  * arithmetic that a SQL oracle replays bit-for-bit — same stated
  * deviation (and for the same reason) as choosing integer dHash over
  * DCT pHash on the image side.
  *
  * Invariances that survive the integer form (each the audio twin of
  * a dHash property, proven by the randomized model check in
  * AudioHashSpec):
  *
  *  - exact amplitude scaling (s → k·s, k > 0 integer) leaves every
  *    bit unchanged: energies scale together, strict comparisons and
  *    ties are both preserved;
  *  - leading/trailing silence (zero samples) leaves every bit
  *    unchanged: the trim step removes it before windowing — the
  *    padding a re-encode or container change typically adds;
  *  - a localized k-sample edit inside one window flips at most 2
  *    bits (the window feeds exactly the comparisons with its two
  *    neighbors).
  *
  * Exact chunk-level dedup misses all three edit classes — the same
  * gap [[DHash64]] closes for images, closed here for the `wav`
  * branch of the multimodal matrix.
  *
  * Input: raw signed 16-bit little-endian mono samples (the
  * post-decode shape — codec-FREE, starts after decode, like
  * [[DHash64]] starts after the image decoder). NULL when the byte
  * length is odd or zero, the payload is all-silence, or fewer than
  * 65 samples remain after trimming. Codegen: the generated
  * projection calls the static [[AudioHash64.evalPcm]] — one compiled
  * byte loop per row, O(samples), no shuffle: the signature pass is a
  * pure scan at any corpus size.
  */
case class AudioHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_hash64 needs binary, got ${other.sql}")
    }

  override protected def nullSafeEval(bin: Any): Any =
    AudioHash64.evalPcm(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val tmp = ctx.freshName("ahash")
      s"""
         |java.lang.Long $tmp = graft.functions.AudioHash64.evalPcm($b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : AudioHash64 = copy(child = newChild)
}

object AudioHash64 {

  /** Column entry point: `audioHash64(pcmBytes)`. */
  def audioHash64(bin: Column): Column =
    Shims.column(AudioHash64(Shims.expression(bin)))

  /** 65 windows → 64 adjacent-pair comparisons, one per hash bit. */
  final val Windows = 65

  @inline private def sampleAt(bytes: Array[Byte], i: Int): Int =
    ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt

  /** The whole per-row loop, shared by interpreted eval and the
    * generated code. Window w of the trimmed span [a, b] covers
    * sample indices [a + m·w/65, a + m·(w+1)/65) (floor boundaries —
    * windows tile the span exactly); bit w is set iff
    * energy(w) < energy(w+1), where energy is the exact |sample| sum
    * (≤ 2¹⁵·m — no overflow at any real payload size).
    */
  def evalPcm(bytes: Array[Byte]): java.lang.Long = {
    if (bytes.length == 0 || bytes.length % 2 != 0) return null
    val n = bytes.length / 2
    var a = 0
    while (a < n && sampleAt(bytes, a) == 0) a += 1
    if (a == n) return null   // all-silence
    var b = n - 1
    while (sampleAt(bytes, b) == 0) b -= 1
    val m = b - a + 1
    if (m < Windows) return null
    val en = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val i0 = a + (m.toLong * w / Windows).toInt
      val i1 = a + (m.toLong * (w + 1) / Windows).toInt
      var s = 0L
      var i = i0
      while (i < i1) {
        val v = sampleAt(bytes, i)
        s += (if (v < 0) -v.toLong else v.toLong)
        i += 1
      }
      en(w) = s
      w += 1
    }
    var hash = 0L
    w = 0
    while (w < 64) {
      if (en(w) < en(w + 1)) hash |= 1L << w
      w += 1
    }
    java.lang.Long.valueOf(hash)
  }
}
