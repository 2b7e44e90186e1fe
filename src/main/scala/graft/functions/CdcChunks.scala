package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a binary column — the storage-dedup
  * primitive (LBFS / Muthitacharoen et al. 2001; restic/borg-style
  * CDC): a chunk boundary falls AFTER byte i whenever the hash of the
  * trailing [[CdcChunks.W]]-byte window clears a threshold, so
  * boundaries realign on content, and a shared substring between two
  * blobs chunks identically no matter how its byte OFFSET shifts —
  * the property fixed-size blocking lacks and the reason chunk-hash
  * dedup works on append/prefix-mutated media payloads.
  *
  * Window hash: md5 of the window's UPPERCASE-hex rendering, boundary
  * iff the first digest byte < 0x10 (p = 1/16 ⇒ ~16-byte average
  * chunks on random content — sized for the fixture payloads; real
  * deployments raise the mask for 64 KB chunks). md5-of-hex is chosen
  * because BOTH engines derive it independently (`md5(substr(hex(b),
  * …))` in DuckDB) — production swaps a gear/Rabin rolling hash
  * behind the same expression contract (boundary decisions per
  * position are independent of chunk starts, so only this predicate
  * changes).
  *
  * Returns `array<struct<offset int, len int, chunk_md5 string>>`
  * (md5 of the chunk's uppercase hex); empty blob ⇒ empty array.
  * Row-local compiled loop (real `doGenCode`, static call on the
  * unboxed bytes) — chunking adds no shuffle to whatever dedup
  * aggregation sits above it.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks needs binary, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cdc")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.CdcChunks.evalBytes($c);
         |${ev.value} = $tmp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunks = copy(child = newChild)
}

/** Content-defined chunking under a GEAR rolling hash — the
  * production-rate variant of [[CdcChunks]] (Xia et al. 2016,
  * "FastCDC"; the gear function g(h, b) = (h << 1) + GEAR[b] is the
  * published Ddelta/FastCDC primitive): O(1) work per byte position
  * versus the teaching predicate's O(W) window rehash, which is the
  * difference between linear and quadratic-ish waste at production
  * 64 KB chunks.
  *
  * Boundary rule: after byte i whenever the top 4 bits of the rolling
  * 64-bit state are zero (`h >>> 60 == 0`, p = 1/16 ⇒ ~16-byte
  * average chunks, sized like [[CdcChunks]] for the fixture; real
  * deployments widen the mask — FastCDC spreads it across high bits,
  * which this rule's top-bits check mirrors in miniature). The shift
  * ages bytes out after 64 positions, so the boundary decision is a
  * pure function of the trailing ≤64 bytes — chunk realignment on
  * shared content holds exactly as in the md5-window rule, and the
  * oracle replays each position's state as a closed-form windowed
  * sum: h_i = Σ_{k=0..63} GEAR[b_{i−k}]·2^k (mod 2^64).
  *
  * GEAR table: 256 deterministic 60-bit constants, entry b = the
  * first 15 hex chars of md5 of b's decimal string — independently
  * derivable by both engines (same digest-prefix convention as
  * [[SimHash64]]).
  *
  * Same output schema and chunk-hash rule as [[CdcChunks]].
  */
case class GearCdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CdcChunks(child).dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gear_cdc_chunks needs binary, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.evalBytesGear(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("gearCdc")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.CdcChunks.evalBytesGear($c);
         |${ev.value} = $tmp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : GearCdcChunks = copy(child = newChild)
}

/** FastCDC-normalized chunking over the same gear rolling hash as
  * [[GearCdcChunks]] — the full published recipe (Xia et al. 2016,
  * "FastCDC: a Fast and Efficient Content-Defined Chunking Approach
  * for Data Deduplication", §3.3 "normalized chunking"): hard
  * min/max chunk bounds plus TWO boundary masks — stricter than the
  * target probability below the target size, looser above it — which
  * squeezes the chunk-size distribution toward the target (plain
  * gear/Rabin CDC has exponential size spread: many tiny chunks,
  * occasional huge ones) — the property that keeps dedup ratios and
  * per-chunk overheads stable on real media. A spec pins the bounds
  * and a measured variance reduction vs [[GearCdcChunks]].
  *
  * Differences from the paper, stated: the gear state is NOT reset at
  * chunk starts — it keeps rolling position-locally (a pure function
  * of the trailing ≤64 bytes, exactly [[GearCdcChunks]]'s state), so
  * the DuckDB oracle replays every position's state with the same
  * HUGEINT closed-form windowed sum and then walks the boundary
  * recursion over it. Boundary DECISIONS still depend on the current
  * chunk's start (mask choice and bounds are functions of bytes-into-
  * chunk) — inherent to normalization, as in the paper, so chunk
  * realignment after an insertion resynchronizes within O(target)
  * bytes rather than instantly (the documented normalization trade;
  * plain gear remains the instant-realignment variant). Fixture-scale
  * parameters (min 8 / target 16 / max 64 bytes, masks p=1/32 and
  * 1/8 via top-bit checks); production uses the same shape at 2/8/64
  * KB.
  *
  * Same output schema and chunk-hash rule as [[CdcChunks]]; row-local
  * compiled loop, no shuffle.
  */
case class FastCdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CdcChunks(child).dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fastcdc_chunks needs binary, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.evalBytesFastCdc(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("fastCdc")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.CdcChunks.evalBytesFastCdc($c);
         |${ev.value} = $tmp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : FastCdcChunks = copy(child = newChild)
}

object CdcChunks {

  /** Rolling-window width in bytes. */
  val W = 8

  private val HEX = "0123456789ABCDEF".toCharArray

  private def hexUpper(b: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var i = from
    while (i < until) {
      sb.append(HEX((b(i) >> 4) & 0xf)).append(HEX(b(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** (offset, len, chunk_md5) row for bytes[start, end). */
  private def chunkRow(bytes: Array[Byte], start: Int, end: Int,
      md: java.security.MessageDigest): InternalRow = {
    md.reset()
    val d = md.digest(hexUpper(bytes, start, end).getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var k = 0
    while (k < 16) {
      sb.append(HEX((d(k) >> 4) & 0xf).toLower)
        .append(HEX(d(k) & 0xf).toLower)
      k += 1
    }
    InternalRow(start, end - start, UTF8String.fromString(sb.toString))
  }

  /** The per-row loop, shared by interpreted eval and generated code. */
  def evalBytes(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    val md = SimHash64.md5.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    def emit(end: Int): Unit = if (end > start) {
      chunks += chunkRow(bytes, start, end, md)
      start = end
    }
    var i = W - 1
    while (i < n) {
      md.reset()
      val d = md.digest(
        hexUpper(bytes, i - W + 1, i + 1).getBytes("UTF-8"))
      if ((d(0) & 0xff) < 0x10) emit(i + 1)
      i += 1
    }
    emit(n)
    new GenericArrayData(chunks.toArray)
  }

  /** 256 deterministic 60-bit gear constants: entry b = big-endian
    * u64 of the first 8 digest bytes of md5(b.toString) >>> 4 — i.e.
    * the first 15 hex chars, the [[SimHash64]] digest-prefix
    * convention, so the oracle derives the identical table as
    * `CAST('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 15) AS ...)`.
    */
  private[graft] val GEAR: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      md.reset()
      val d = md.digest(b.toString.getBytes("UTF-8"))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h >>> 4
    }
  }

  /** The gear-hash per-row loop ([[GearCdcChunks]]): one shift-add
    * per byte, boundary when the top 4 state bits clear.
    */
  def evalBytesGear(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    val md = SimHash64.md5.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xff) // Long wrap == mod 2^64
      if ((h >>> 60) == 0L && i + 1 > start) {
        chunks += chunkRow(bytes, start, i + 1, md)
        start = i + 1
      }
      i += 1
    }
    if (n > start) chunks += chunkRow(bytes, start, n, md)
    new GenericArrayData(chunks.toArray)
  }

  /** FastCDC fixture-scale parameters ([[FastCdcChunks]]): hard
    * bounds and the two normalization masks. Exposed for the spec
    * and the oracle replay (which inlines the same constants).
    */
  val FC_MIN = 8
  val FC_TARGET = 16
  val FC_MAX = 64
  val FC_BITS_STRICT = 5 // p = 1/32 below target
  val FC_BITS_LOOSE = 3  // p = 1/8 at/above target

  /** The FastCDC-normalized per-row loop ([[FastCdcChunks]]): gear
    * state rolls continuously; the boundary test after byte i with L
    * bytes in the open chunk is
    *   L < FC_MIN            → never
    *   L < FC_TARGET         → top FC_BITS_STRICT state bits clear
    *   FC_TARGET ≤ L < FC_MAX → top FC_BITS_LOOSE state bits clear
    *   L == FC_MAX           → always (forced cut)
    */
  def evalBytesFastCdc(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    val md = SimHash64.md5.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xff) // Long wrap == mod 2^64
      val len = i + 1 - start
      val cut =
        if (len < FC_MIN) false
        else if (len < FC_TARGET) (h >>> (64 - FC_BITS_STRICT)) == 0L
        else if (len < FC_MAX) (h >>> (64 - FC_BITS_LOOSE)) == 0L
        else true
      if (cut) {
        chunks += chunkRow(bytes, start, i + 1, md)
        start = i + 1
      }
      i += 1
    }
    if (n > start) chunks += chunkRow(bytes, start, n, md)
    new GenericArrayData(chunks.toArray)
  }

  /** Column entry point: `cdc_chunks(blob)`. */
  def cdcChunks(bin: Column): Column =
    Shims.column(CdcChunks(Shims.expression(bin)))

  /** Column entry point: `gear_cdc_chunks(blob)`. */
  def gearCdcChunks(bin: Column): Column =
    Shims.column(GearCdcChunks(Shims.expression(bin)))

  /** Column entry point: `fastcdc_chunks(blob)`. */
  def fastCdcChunks(bin: Column): Column =
    Shims.column(FastCdcChunks(Shims.expression(bin)))
}
