package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Row-local 60-bit SimHash of a (distinct) token array — the whole
  * signature (per-token md5 → 60-bit prefix → per-bit ±1 votes →
  * majority bits) folds in ONE compiled per-row loop.
  *
  * Replaces the explode + 60-lane groupBy composition: same bits
  * (`conv(substring(md5(tok), 1, 15), 16, 10)` == the big-endian u64
  * of the digest's first 8 bytes >>> 4, so the DuckDB oracle replays
  * unchanged), but a pure PROJECTION — no token explode, no per-doc
  * shuffle, and no interpreted higher-order functions (an
  * `aggregate`/`zip_with` port of this measured ~10× slower at sf1:
  * HOF lambdas never enter codegen and pay per-ELEMENT eval dispatch,
  * where the compiled loop pays one call per ROW).
  *
  * Codegen: a real `doGenCode` (round 11) — the generated projection
  * calls the static [[SimHash64.evalArray]] on the child's unboxed
  * `ArrayData`, so the surrounding whole-stage codegen span stays
  * fused. The earlier CodegenFallback form forced the row object into
  * the generated code (`references[i].eval(row)`), splitting the
  * projection's codegen span around the hash; A/B measured in
  * SCALE.md round 11.
  *
  * Empty token array ⇒ NULL — mirroring the explode path, where a
  * token-less document simply produced no row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sim_hash64 needs array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhash")
      s"""
         |java.lang.Long $tmp = graft.functions.SimHash64.evalArray($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point: `sim_hash64(distinctTokens)`. */
  def simHash64(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  /** The whole per-row loop, shared by the interpreted eval and the
    * generated code (which calls it statically on the child's
    * `ArrayData` — no row boxing). Returns null for an all-null/empty
    * array.
    */
  def evalArray(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var seen = false
    val votes = new Array[Int](60)
    val md = SimHash64.md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars of the digest == big-endian u64 of the
        // first 8 bytes, top nibble-aligned (drop the 16th hex digit)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = h >>> 4
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null
    else {
      var sim = 0L
      var j = 0
      while (j < 60) { if (votes(j) > 0) sim |= 1L << j; j += 1 }
      java.lang.Long.valueOf(sim)
    }
  }

  /** Per-thread MD5 instance shared by the hash expressions: a
    * `getInstance` per ROW is a provider lookup + allocation on the
    * hot path, and one shared instance would race across concurrently
    * evaluating tasks (MessageDigest is stateful).
    */
  private[functions] val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
}
