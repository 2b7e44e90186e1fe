package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** All `tables` LSH bucket codes of one vector in ONE compact compiled
  * loop — replaces the `array(struct(t, when(dot ≥ 0, 1<<j)…))`
  * composition over `tables × planesPerTable` [[DotProduct]] nodes,
  * which whole-stage codegen inlines into a single generated method of
  * ~28 KB bytecode for 16×6 planes: beyond HotSpot's 8 KB
  * DontCompileHugeMethods limit, so the hottest projection of every
  * LSH operator ran INTERPRETED forever (measured ~7 µs per dot vs
  * ~0.1 µs compiled — the whole semantic/near-dup family's dominant
  * cost at any scale; Catalyst's method splitter refuses to split this
  * shape at any `methodSplitThreshold`).
  *
  * Semantics are bit-identical to the old composition
  * ([[graft.operators.Similarity.lshTables]]'s former body, pinned by
  * LshTablesEquivalenceSpec):
  *
  *   - plane j of table t is GLOBAL md5 plane `t·p + j`
  *     ([[graft.operators.Similarity.hyperplanes]] indexing — sign
  *     +1 iff top bit of md5("g:i") is 0);
  *   - bit j of bucket t is set iff Σᵢ vecᵢ·signᵢ ≥ 0, the sum taken
  *     left-to-right in double precision (NaN ⇒ bit SET: Spark SQL's
  *     nan-safe ordering ranks NaN greatest, so the old
  *     `when(dot ≥ 0)` fired on NaN dots);
  *   - a null vector, a length ≠ `dim`, or any null element made every
  *     per-plane dot null ⇒ every bit clear: all buckets 0, never a
  *     null row (the old `when(null ≥ 0).otherwise(0)` collapse).
  *
  * Output: `array<struct<tbl:int, bucket:bigint>>`, length `tables`,
  * non-null — exactly the old composition's type, so every consumer
  * (explode, zip_with min-table filters, oracle replays) is untouched.
  */
case class LshTables(child: Expression, tables: Int, planesPerTable: Int,
                     dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tbl", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ShortType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_tables needs a numeric array, got ${other.simpleString}")
  }

  /** Global planes [0, tables·planesPerTable) flattened to
    * (plane-major, dim-minor) — the same md5 signs
    * [[graft.operators.Similarity.hyperplanes]] derives.
    */
  @transient private lazy val planes: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](tables * planesPerTable * dim)
    var g = 0
    while (g < tables * planesPerTable) {
      var i = 0
      while (i < dim) {
        val d = md.digest(s"$g:$i".getBytes("UTF-8"))
        out(g * dim + i) = if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
        i += 1
      }
      g += 1
    }
    out
  }

  @transient private lazy val getter: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case DoubleType  => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
      case other => throw new IllegalStateException(s"unsupported $other")
    }

  /** Shared eval/codegen body: one normal JVM method, so HotSpot JITs
    * it like any other hot loop (the whole point of this expression).
    */
  def compute(vec: ArrayData): ArrayData = {
    val p = planesPerTable
    val rows = new Array[Any](tables)
    // abnormal input (old semantics: every per-plane dot was null):
    // all buckets 0
    var bad = vec == null || vec.numElements() != dim
    if (!bad) {
      var i = 0
      while (i < dim && !bad) {
        if (vec.isNullAt(i)) bad = true
        i += 1
      }
    }
    if (bad) {
      var t = 0
      while (t < tables) {
        rows(t) = new GenericInternalRow(Array[Any](t, 0L))
        t += 1
      }
      return new GenericArrayData(rows)
    }
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = getter(vec, i); i += 1 }
    val pl = planes
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < p) {
        var s = 0.0
        val base = (t * p + j) * dim
        var k = 0
        while (k < dim) { s += v(k) * pl(base + k); k += 1 }
        // !(s < 0): Spark SQL's GreaterThanOrEqual uses nan-safe
        // ordering with NaN GREATEST, so a NaN dot sets the bit in the
        // old composition — Java's s >= 0.0 would clear it
        if (!(s < 0.0)) bucket |= (1L << j)
        j += 1
      }
      rows(t) = new GenericInternalRow(Array[Any](t, bucket))
      t += 1
    }
    new GenericArrayData(rows)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // never null, and null input still yields the zero-bucket array —
    // evaluate the child with its own nullability and pass null through
    val self = ctx.addReferenceObj("lshTables", this,
      classOf[LshTables].getName)
    val c = child.genCode(ctx)
    val vecVal = ctx.freshName("vec")
    ev.copy(
      code = code"""
        |${c.code}
        |ArrayData $vecVal = ${c.isNull} ? null : ${c.value};
        |ArrayData ${ev.value} = $self.compute($vecVal);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshTables = copy(child = newChild)
}

object LshTables {
  /** Column-level entry point: all `tables` (tbl, bucket) structs. */
  def lshTables(vec: Column, tables: Int, planesPerTable: Int,
                dim: Int): Column =
    Shims.column(LshTables(Shims.expression(vec), tables,
      planesPerTable, dim))
}
