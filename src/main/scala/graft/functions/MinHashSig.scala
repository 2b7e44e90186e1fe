package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local MinHash signature + hashed shingle set in ONE compiled
  * pass over a (distinct) shingle array — the projection form of the
  * explode → groupBy(id) signature build: per shingle, `numHashes/4`
  * md5 digests (group-prefixed, `md5(g || ':' || shingle)`) update
  * four 32-bit min lanes each, and the shingle's `xxhash64` (seed 42,
  * Spark's default) lands in the verify set. Returns
  * `struct(sig array<string>, hs array<long>)`, NULL when the shingle
  * array is empty — mirroring the explode path, where a short doc
  * produced no signature row (and keeping the all-shorts-collide LSH
  * hotspot out of the band space).
  *
  * Lane values are bit-identical to the aggregate composition: an
  * 8-hex-char lowercase slice of the digest compares lexicographically
  * exactly as its uint32 value, so the mins run as integer compares
  * and format back with `%08x`. The DuckDB oracle replays unchanged.
  *
  * Codegen: a real `doGenCode` (round 11) — the generated projection
  * calls [[evalArray]] through a reference object on the child's
  * unboxed `ArrayData`, keeping the surrounding whole-stage span
  * fused instead of splitting it around a CodegenFallback row-boxed
  * eval; A/B measured in SCALE.md round 11.
  */
case class MinHashSig(child: Expression, numHashes: Int,
                      withHs: Boolean = true)
    extends UnaryExpression {

  require(numHashes % 4 == 0 && numHashes > 0,
    "numHashes must be a positive multiple of 4")

  private val nMd5 = numHashes / 4

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(StringType, containsNull = false)),
    StructField("hs", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_hash_sig needs array<string>, got ${other.sql}")
    }

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until nMd5).map(g => s"$g:".getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this,
      classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("mhs")
      s"""
         |InternalRow $tmp = $ref.evalArray($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  /** The whole per-row pass, shared by the interpreted eval and the
    * generated code. Public for codegen's reference-object call.
    */
  def evalArray(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(0xFFFFFFFFL + 1)   // > any uint32
    // sig-only callers skip the verify-set lane entirely: no xxhash64
    // per shingle, no per-row long-array allocation
    val hs = if (withHs) new Array[Long](n) else null
    val md = SimHash64.md5.get()
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (withHs) hs(m) = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val bytes = s.getBytes
        var g = 0
        while (g < nMd5) {
          md.reset()
          md.update(prefixes(g))
          val d = md.digest(bytes)
          var k = 0
          while (k < 4) {
            val v = ((d(4 * k) & 0xffL) << 24) |
              ((d(4 * k + 1) & 0xffL) << 16) |
              ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
            val j = 4 * g + k
            if (v < mins(j)) mins(j) = v
            k += 1
          }
          g += 1
        }
        m += 1
      }
      i += 1
    }
    if (m == 0) null
    else {
      val sig = new Array[Any](numHashes)
      var j = 0
      while (j < numHashes) {
        sig(j) = UTF8String.fromString(f"${mins(j)}%08x")
        j += 1
      }
      InternalRow(new GenericArrayData(sig),
        new GenericArrayData(
          if (!withHs) Array.emptyLongArray
          else if (m == n) hs
          else java.util.Arrays.copyOf(hs, m)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point: `min_hash_sig(distinctShingles, k)`. */
  def minHashSig(shingles: Column, numHashes: Int = 8,
                 withHs: Boolean = true): Column =
    Shims.column(
      MinHashSig(Shims.expression(shingles), numHashes, withHs))
}
