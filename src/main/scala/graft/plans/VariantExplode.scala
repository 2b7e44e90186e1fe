package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.UTF8String

/** The NATIVE-VariantType twin of [[JsonExplode]]: recursively
  * explodes a Spark 4 `VariantType` column into the same
  * `(path, vstr, vnum, vtag)` leaf rows, walking the variant BINARY
  * through the public `org.apache.spark.types.variant.Variant`
  * accessors — no JSON render, no re-parse. This makes a
  * `varianttype=true` wire read a first-class profiling input: the
  * §2 type histogram (`core/analyser.py:286`) runs on the variant
  * values directly instead of requiring a second read through the
  * StringType bridge.
  *
  * Tag vocabulary matches [[JsonExplode]] (and therefore the
  * reference, `core/analyser.py:162-183`): integral values tag
  * `int32` when they fit, else `int64` — the per-VALUE fit rule, so
  * a variant LONG of 7 and a bridge-rendered JSON 7 agree; objects
  * recurse with dotted paths, untagged; arrays emit a whole-array
  * row with null-aware element unification plus `path[]` element
  * rows. Variant DECIMAL tags `double`: within this engine it arises
  * only from a non-exponent double render (the parseJson-equivalent
  * encode, [[graft.sources.Bson.variantVal]]) — true BSON decimal128
  * values travel as `$numberDecimal`-wrapped objects, exactly as in
  * the string render. FLOAT tags `double`; the remaining variant
  * scalars (date/timestamp/binary/uuid) keep their own lowercase
  * names — they cannot arise from the wire decode but a user-built
  * variant column may carry them.
  *
  * A SQL NULL input tags `null` at the column's own path — the same
  * row the bridge's `coalesce(col, 'null')` render produces — so
  * missing and BSON-null documents profile identically on both
  * paths.
  *
  * @param pathPrefix the path root for emitted rows (the source
  *                   column's name when profiling a document of
  *                   variant columns; empty for a bare value).
  */
case class VariantExplode(child: Expression, pathPrefix: String)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("vstr", StringType),
    StructField("vnum", DoubleType),
    StructField("vtag", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case VariantType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("variant_explode needs a variant " +
            s"column, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    val root = if (pathPrefix.isEmpty) "$" else pathPrefix
    if (raw == null)
      return Seq(row(root, null, null, "null"))
    val vv = raw.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
    val out = ArrayBuffer.empty[InternalRow]
    walk(root, new Variant(vv.getValue, vv.getMetadata), out)
    out
  }

  private def row(path: String, vstr: String, vnum: java.lang.Double,
                  vtag: String): InternalRow =
    InternalRow(UTF8String.fromString(path),
      if (vstr == null) null else UTF8String.fromString(vstr),
      if (vnum == null) null else vnum.doubleValue(),
      UTF8String.fromString(vtag))

  private def scalarTag(v: Variant): String = v.getType match {
    case VariantUtil.Type.NULL => "null"
    case VariantUtil.Type.BOOLEAN => "bool"
    case VariantUtil.Type.LONG =>
      val x = v.getLong
      if (x >= Int.MinValue && x <= Int.MaxValue) "int32" else "int64"
    // DECIMAL = a non-exponent double render within this engine;
    // FLOAT is a narrower double — both are `double` to the profile
    case VariantUtil.Type.DOUBLE | VariantUtil.Type.DECIMAL |
         VariantUtil.Type.FLOAT => "double"
    case VariantUtil.Type.STRING => "str"
    case VariantUtil.Type.DATE => "date"
    case VariantUtil.Type.TIMESTAMP |
         VariantUtil.Type.TIMESTAMP_NTZ => "timestamp"
    case VariantUtil.Type.BINARY => "binary"
    case VariantUtil.Type.UUID => "uuid"
    case other => "unknown<" + other.toString.toLowerCase + ">"
  }

  private def arrayTag(v: Variant): String = {
    val tags = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < v.arraySize()) {
      val e = v.getElementAtIndex(i)
      tags += (e.getType match {
        case VariantUtil.Type.OBJECT => "dict"
        case VariantUtil.Type.ARRAY => arrayTag(e)
        case _ => scalarTag(e)
      })
      i += 1
    }
    val nonNull = tags - "null"
    if (tags.isEmpty) "array<empty>"
    else if (nonNull.isEmpty) "array<null>"
    else if (nonNull.size == 1) s"array<${nonNull.head}>"
    else "array<mixed>"
  }

  private def walk(prefix: String, v: Variant,
                   out: ArrayBuffer[InternalRow]): Unit =
    v.getType match {
      case VariantUtil.Type.OBJECT =>
        var i = 0
        while (i < v.objectSize()) {
          val f = v.getFieldAtIndex(i)
          walk(s"$prefix.${f.key}", f.value, out)
          i += 1
        }
      case VariantUtil.Type.ARRAY =>
        out += row(prefix, v.toJson(java.time.ZoneOffset.UTC), null,
          arrayTag(v))
        var i = 0
        while (i < v.arraySize()) {
          val e = v.getElementAtIndex(i)
          e.getType match {
            case VariantUtil.Type.OBJECT | VariantUtil.Type.ARRAY =>
              walk(s"$prefix[]", e, out)
            case _ => out += scalarRow(s"$prefix[]", e)
          }
          i += 1
        }
      case _ => out += scalarRow(prefix, v)
    }

  private def scalarRow(path: String, v: Variant): InternalRow =
    v.getType match {
      case VariantUtil.Type.NULL => row(path, null, null, "null")
      case VariantUtil.Type.BOOLEAN =>
        row(path, if (v.getBoolean) "true" else "false", null, "bool")
      case VariantUtil.Type.LONG =>
        val x = v.getLong
        row(path, x.toString, java.lang.Double.valueOf(x.toDouble),
          scalarTag(v))
      case VariantUtil.Type.DOUBLE =>
        val x = v.getDouble
        row(path, x.toString, java.lang.Double.valueOf(x), "double")
      case VariantUtil.Type.FLOAT =>
        val x = v.getFloat.toDouble
        row(path, x.toString, java.lang.Double.valueOf(x), "double")
      case VariantUtil.Type.DECIMAL =>
        val d = v.getDecimalWithOriginalScale
        row(path, d.toPlainString,
          java.lang.Double.valueOf(d.doubleValue()), "double")
      case VariantUtil.Type.STRING =>
        row(path, v.getString, null, "str")
      case _ =>
        // date/timestamp/binary/uuid: render via the variant's own
        // JSON form (quoted), value-only — cannot arise from the
        // wire decode
        row(path, v.toJson(java.time.ZoneOffset.UTC), null,
          scalarTag(v))
    }

  override protected def withNewChildInternal(c: Expression)
      : VariantExplode = copy(child = c)
}

object VariantExplode {
  /** `variant_explode_tags(col, prefix)` as a generator Column. */
  def variantExplode(c: Column, pathPrefix: String): Column =
    Shims.column(VariantExplode(Shims.expression(c), pathPrefix))
}
