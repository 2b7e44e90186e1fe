package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as ONE tight eval per document, replacing the
  * `transform(sequence(...), i -> concat_ws(" ", slice(tokens, i, n)))`
  * expression tree: the interpreted higher-order-function path
  * re-evaluates a lambda body (sequence + slice + concat allocations)
  * per shingle, which dominated the dedup operators' runtime. Here one
  * byte scan finds the token spans and each shingle is a single
  * arraycopy — no intermediate token array, no per-shingle expression
  * dispatch.
  *
  * Semantics are identical to the declarative form (the dedup oracle
  * SQL mirrors it): tokens are maximal runs of non-whitespace (Java
  * regex `\s` = space, \t, \n, \x0B, \f, \r — ASCII bytes, so the
  * byte-level scan is UTF-8 safe), shingles are n consecutive tokens
  * joined by a single space, fewer than n tokens yields an empty
  * array, null text yields null.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WordShingles needs a string input, got ${child.dataType.sql}")

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 9 && b <= 13)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val m = bytes.length
    var starts = new Array[Int](32)
    var ends = new Array[Int](32)
    var count = 0
    var i = 0
    while (i < m) {
      while (i < m && isWs(bytes(i))) i += 1
      if (i < m) {
        val s0 = i
        while (i < m && !isWs(bytes(i))) i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = s0
        ends(count) = i
        count += 1
      }
    }
    if (count < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count - n + 1)
      var k = 0
      while (k <= count - n) {
        var len = n - 1
        var j = 0
        while (j < n) { len += ends(k + j) - starts(k + j); j += 1 }
        val buf = new Array[Byte](len)
        var pos = 0
        j = 0
        while (j < n) {
          if (j > 0) { buf(pos) = ' '; pos += 1 }
          val l = ends(k + j) - starts(k + j)
          System.arraycopy(bytes, starts(k + j), buf, pos, l)
          pos += l
          j += 1
        }
        out(k) = UTF8String.fromBytes(buf)
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
}

object WordShingles {
  /** SQL-registry builder: `word_shingles(text[, n])` — the shingle
    * size must be a foldable integer literal (it shapes the generated
    * loop, so it cannot vary per row).
    */
  def fromExprs(es: Seq[Expression]): WordShingles = es match {
    case Seq(c) => WordShingles(c, 3)
    case Seq(c, nExpr) if nExpr.foldable =>
      nExpr.eval() match {
        case i: Int => WordShingles(c, i)
        case l: Long => WordShingles(c, l.toInt)
        case other => throw new IllegalArgumentException(
          s"word_shingles: n must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      "word_shingles(text[, n literal]) takes 1 or 2 arguments")
  }
}
