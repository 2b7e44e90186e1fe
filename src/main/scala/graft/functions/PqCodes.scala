package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** All `m` PQ subspace codes of one micro-ized vector in ONE compact
  * compiled loop — replaces the
  * `array_min(array(struct(sqDistTo(slice(u,…),c), cid)…))` argmin
  * composition over m × codebookSize [[SqDistLong]] nodes, whose
  * whole-stage-codegen output for 4×16 books is a single ~31 KB
  * bytecode method: past HotSpot's 8 KB DontCompileHugeMethods limit,
  * so every trained-PQ encode projection (the corpus-side hot path of
  * every `ann_*_trained` / ivfpq row) ran INTERPRETED forever — the
  * [[LshTables]] pathology on the ANN family.
  *
  * Semantics are bit-identical to the old composition (pinned by
  * PqCodesEquivalenceSpec):
  *
  *   - subspace j reads u[j·sub … (j+1)·sub), the old
  *     `slice(u, j·sub+1, sub)`;
  *   - distance to codebook entry c is Σₖ (uₖ − cₖ)² in LONG
  *     arithmetic, left-to-right, 64-bit wrap-around and all
  *     ([[SqDistLong]] verbatim);
  *   - code = argmin with ties to the SMALLEST cid (the struct
  *     (d, cid) lexicographic array_min);
  *   - a null vector, a vector too short for the subspace's slice, or
  *     a null element inside the slice made every distance null, and
  *     the (null, cid) structs sort null-FIRST then cid — so the old
  *     argmin returned cid 0: degenerate subspaces encode as 0
  *     (probe-verified on the composition before replacement).
  *
  * Output: `array<int>` of length m, never null.
  */
case class PqCodes(child: Expression,
                   books: Seq[Seq[(Int, Seq[Long])]], sub: Int)
    extends UnaryExpression {

  private val m: Int = books.size

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs a bigint array, got ${other.simpleString}")
  }

  /** books flattened (subspace-major, then entry, then component);
    * entries keep their caller-side cids and PER-SUBSPACE counts (a
    * Lloyd round can empty a cluster independently per subspace, so
    * books may be sparse AND ragged — the old argmin compared the
    * REAL cid in its (d, cid) struct and so does this).
    */
  @transient private lazy val entryStart: Array[Int] = {
    val out = new Array[Int](m + 1)
    var j = 0
    while (j < m) { out(j + 1) = out(j) + books(j).size; j += 1 }
    out
  }
  @transient private lazy val flat: Array[Long] = {
    val out = new Array[Long](entryStart(m) * sub)
    var j = 0
    while (j < m) {
      require(books(j).nonEmpty, s"subspace $j has no entries")
      var c = 0
      while (c < books(j).size) {
        val b = books(j)(c)._2
        require(b.size == sub, s"book ($j,$c) has ${b.size} != $sub")
        var i = 0
        while (i < sub) {
          out((entryStart(j) + c) * sub + i) = b(i); i += 1
        }
        c += 1
      }
      j += 1
    }
    out
  }
  @transient private lazy val cids: Array[Int] = {
    val out = new Array[Int](entryStart(m))
    var j = 0
    while (j < m) {
      var c = 0
      var prev = -1
      while (c < books(j).size) {
        val cid = books(j)(c)._1
        require(cid > prev, s"book $j cids not ascending at $c")
        prev = cid
        out(entryStart(j) + c) = cid
        c += 1
      }
      j += 1
    }
    out
  }

  def compute(u: ArrayData): ArrayData = {
    val codes = new Array[Any](m)
    val bl = flat
    val ci = cids
    val es = entryStart
    var j = 0
    while (j < m) {
      val off = j * sub
      val e0 = es(j)
      val k = es(j + 1) - e0
      // degenerate slice (old semantics: every distance null, argmin
      // lands on the null-first struct with the smallest cid): code 0
      var bad = u == null || u.numElements() < off + sub
      if (!bad) {
        var i = off
        while (i < off + sub && !bad) {
          if (u.isNullAt(i)) bad = true
          i += 1
        }
      }
      // degenerate: every (null, cid) struct sorted null-first, so
      // the old array_min returned the SMALLEST cid present
      if (bad) codes(j) = ci(e0)
      else {
        var best = 0
        var bestD = 0L
        var first = true
        var c = 0
        while (c < k) {
          var d = 0L
          val base = (e0 + c) * sub
          var i = 0
          while (i < sub) {
            val x = u.getLong(off + i) - bl(base + i)
            d += x * x
            i += 1
          }
          // strict <: ties keep the earlier entry = smaller cid
          // (cids ascend)
          if (first || d < bestD) { best = c; bestD = d; first = false }
          c += 1
        }
        codes(j) = ci(e0 + best)
      }
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqCodes", this,
      classOf[PqCodes].getName)
    val c = child.genCode(ctx)
    val uVal = ctx.freshName("u")
    ev.copy(
      code = code"""
        |${c.code}
        |ArrayData $uVal = ${c.isNull} ? null : ${c.value};
        |ArrayData ${ev.value} = $self.compute($uVal);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodes = copy(child = newChild)
}

object PqCodes {
  /** Column entry point; `books` as the callers hold them
    * ((cid, components) pairs per subspace, cid-ascending, possibly
    * sparse after a Lloyd round empties a cluster).
    */
  def pqCodes(u: Column, books: Array[Array[(Int, Array[Long])]],
              sub: Int): Column =
    Shims.column(PqCodes(Shims.expression(u),
      books.toSeq.map(_.toSeq.map { case (cid, c) => (cid, c.toSeq) }),
      sub))
}
