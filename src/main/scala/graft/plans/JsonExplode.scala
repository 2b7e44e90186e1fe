package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator: recursively explodes a JSON document column into
  * `(path, vstr, vnum, vtag)` leaf rows with **per-value** type tags —
  * the semi-structured half of the profiling engine.
  *
  * This is the mixed-type case the reference exists for (a field that is
  * `int32` in one document and `str` in the next,
  * `core/analyser.py:162-183`): a static Spark schema cannot carry it,
  * so the tag must be derived from each value at runtime. Following
  * SURVEY §2.8, the arbitrary-depth document walk is a custom
  * `Generator` (one row → many leaf rows), the Catalyst analogue of the
  * reference's recursive `extract_schema_and_stats`
  * (`core/analyser.py:32-79`).
  *
  * Tag vocabulary matches the reference: integral numbers → `int32` if
  * they fit, else `int64` (plain Python int → int32,
  * `core/analyser.py:174-175`; Int64 → int64); JSON semantics for the
  * rest (`double`, `str`, `bool`, `null`). Objects are recursed into
  * with dotted paths, not tagged; arrays emit a whole-array row (tag
  * `array<T>` / `array<mixed>` / `array<empty>` from element tags,
  * unified over ALL elements like the extractor's null-aware
  * unification, `core/extractor.py:59-81`) plus per-element `path[]`
  * rows.
  */
/** @param emitRoot also emit one `(path="", vtag="doc")` marker row per
  *                  input document (including null/malformed ones) —
  *                  lets an aggregation over the flattened rows derive
  *                  the document total from the SAME scan instead of a
  *                  second `df.count()` pass over the source.
  */
case class JsonExplode(child: Expression, emitRoot: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("vstr", StringType),
    StructField("vnum", DoubleType),
    StructField("vtag", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"json_explode needs a string column, got " +
            other.simpleString)
    }

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null)
      return if (emitRoot) Seq(row("", null, null, "doc")) else Nil
    val out = ArrayBuffer.empty[InternalRow]
    if (emitRoot) out += row("", null, null, "doc")
    try {
      val root = mapper.readTree(raw.toString)
      walk("", root, out)
    } catch {
      case _: Exception =>
        out += row("$", raw.toString, null, "unknown<malformed>")
    }
    out
  }

  private def row(path: String, vstr: String, vnum: java.lang.Double,
                  vtag: String): InternalRow =
    InternalRow(UTF8String.fromString(path),
      if (vstr == null) null else UTF8String.fromString(vstr),
      if (vnum == null) null else vnum.doubleValue(),
      UTF8String.fromString(vtag))

  private def scalarTag(n: com.fasterxml.jackson.databind.JsonNode): String =
    if (n.isNull) "null"
    else if (n.isBoolean) "bool"
    else if (n.isIntegralNumber) {
      if (n.canConvertToInt) "int32" else "int64"
    } else if (n.isFloatingPointNumber) "double"
    else if (n.isTextual) "str"
    else "unknown<" + n.getNodeType.toString.toLowerCase + ">"

  private def arrayTag(n: com.fasterxml.jackson.databind.JsonNode): String = {
    val it = n.elements()
    val tags = scala.collection.mutable.LinkedHashSet.empty[String]
    while (it.hasNext) {
      val e = it.next()
      tags += (if (e.isObject) "dict"
               else if (e.isArray) arrayTag(e)
               else scalarTag(e))
    }
    // null-aware unification over all elements (core/extractor.py:59-81)
    val nonNull = tags - "null"
    if (tags.isEmpty) "array<empty>"
    else if (nonNull.isEmpty) "array<null>"
    else if (nonNull.size == 1) s"array<${nonNull.head}>"
    else "array<mixed>"
  }

  private def walk(prefix: String,
                   n: com.fasterxml.jackson.databind.JsonNode,
                   out: ArrayBuffer[InternalRow]): Unit = {
    if (n.isObject) {
      // dict: recurse, don't tag (core/analyser.py:70-71)
      val fields = n.fields()
      while (fields.hasNext) {
        val e = fields.next()
        val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        walk(p, e.getValue, out)
      }
    } else if (n.isArray) {
      val p = if (prefix.isEmpty) "$" else prefix
      out += row(p, n.toString, null, arrayTag(n))
      val it = n.elements()
      while (it.hasNext) {
        val e = it.next()
        if (e.isObject || e.isArray) walk(s"$p[]", e, out)
        else out += scalarRow(s"$p[]", e)
      }
    } else {
      out += scalarRow(if (prefix.isEmpty) "$" else prefix, n)
    }
  }

  private def scalarRow(path: String,
                        n: com.fasterxml.jackson.databind.JsonNode)
      : InternalRow = {
    val tag = scalarTag(n)
    val vstr = if (n.isNull) null
               else if (n.isTextual) n.textValue()
               else n.asText()
    val vnum: java.lang.Double =
      if (n.isNumber) java.lang.Double.valueOf(n.doubleValue()) else null
    row(path, vstr, vnum, tag)
  }

  override protected def withNewChildInternal(c: Expression): JsonExplode =
    copy(child = c)
}

object JsonExplode {
  /** `json_explode(jsonCol)` as a generator Column for `select`. */
  def jsonExplode(c: Column, emitRoot: Boolean = false): Column =
    Shims.column(JsonExplode(Shims.expression(c), emitRoot))
}
