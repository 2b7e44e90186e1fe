package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.Shims

import graft.functions.{DotLong, DotProduct, MisraGriesAgg, SqDistLong,
  WordShingles}
import graft.plans.JsonExplode

/** SQL surface for the custom Catalyst expressions: register
  * `dot_product` and `json_explode` so `spark.sql("...")` users get
  * them too — either per session via [[register]] or globally via the
  * [[GraftExtensions]] `SparkSessionExtensions` hook
  * (`--conf spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftFunctions {

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "double-precision dot product of two numeric arrays",
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("sq_dist_long",
      "exact integer squared L2 distance of two bigint arrays",
      (es: Seq[Expression]) => SqDistLong(es(0), es(1))),
    ("dot_long", "exact integer dot product of two bigint arrays",
      (es: Seq[Expression]) => DotLong(es(0), es(1))),
    ("word_shingles",
      "word n-gram shingles of a text (second arg: n)",
      (es: Seq[Expression]) => WordShingles.fromExprs(es)),
    ("json_explode",
      "explode a JSON document into (path, vstr, vnum, vtag) leaf rows",
      (es: Seq[Expression]) => JsonExplode(es.head)),
    ("misra_gries",
      "bounded frequent-items candidate summary struct<n, keys> " +
        "(second arg: counter capacity, a literal)",
      (es: Seq[Expression]) => {
        val cap = es(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"misra_gries capacity must be an integer literal, got $other")
        }
        MisraGriesAgg(es(0), cap).toAggregateExpression()
      }))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val reg = Shims.registry(spark)
    builders.foreach { case (name, _, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `SparkSessionExtensions` hook installing the functions at session
  * build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, usage, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), b))
    }
}
