package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.JsonExplode.jsonExplode

/** Profiling over semi-structured JSON columns with per-value type
  * tags — the mixed-type workload the reference was built for. Same
  * output contract as [[Profiler]] but the flatten step is the
  * [[graft.plans.JsonExplode]] Generator instead of a schema-driven
  * projection, so a field may legitimately carry several tags.
  */
object JsonProfiler {

  /** (path, vstr, vnum, vtag) leaf rows of one JSON column.
    *
    * @param emitRoot also emit a `path=""` marker row per document (see
    *                 [[graft.plans.JsonExplode]]) so consumers can
    *                 derive document totals from this same scan.
    */
  def flattenJson(df: DataFrame, jsonCol: String,
                  emitRoot: Boolean = false): DataFrame =
    graft.util.Utils.spread(df).select(
      jsonExplode(col(jsonCol), emitRoot).as(
        Seq("path", "vstr", "vnum", "vtag")))

  /** Per-path stats over JSON values (presence, missing%, cardinality,
    * numeric min/max), counted against document totals. ONE scan of the
    * source: the document total comes from the generator's per-document
    * root marker rows, not a second `df.count()` pass.
    *
    * Cardinality runs through the bounded
    * [[graft.functions.ProfileAggregate]] buffer (exact below
    * `exactLimit` string-hash entries per path, HLL beyond) — same
    * rationale as [[Profiler.profileStats]]: an exact `countDistinct`
    * over every distinct (path, value-string) pair is the 100 TB
    * scale-killer on exactly the raw-document input this profiler
    * exists for. [[profileStatsBuiltin]] keeps the countDistinct plan
    * as the cross-check twin.
    */
  def profileStats(df: DataFrame, jsonCol: String): DataFrame = {
    import graft.functions.ProfileAggregate.profileAgg
    import org.apache.spark.sql.types.TimestampType
    val flat = flattenJson(df, jsonCol, emitRoot = true)
    val rows = flat.groupBy("path")
      .agg(profileAgg(col("vstr"), col("vnum"),
        lit(null).cast(TimestampType), col("vtag")).as("p"))
      .select(col("path"), col("p.*"))
    // total docs = count of root marker rows, windowed over the (tiny)
    // per-path aggregate — same trick as Profiler.profileStats
    val total = max(when(col("path") === "", col("seen")))
      .over(Window.partitionBy())
    rows.withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast("double"))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .filter(col("path") =!= "")
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("num_min"), col("num_max"))
      .orderBy("path")
  }

  /** The complete raw-document answer in ONE pass: per-path counts,
    * missing%, bounded-exact cardinality, numeric min/max, the
    * per-VALUE type histogram (`type_distribution` in its full
    * mixed-type glory) and Misra-Gries top-k string values — the
    * [[Profiler.profileFull]] twin for schemaless input. Maps render
    * as deterministic sorted JSON.
    */
  def profileFull(df: DataFrame, jsonCol: String,
                  exactLimit: Int = 100000,
                  topkCap: Int = 256): DataFrame = {
    import graft.functions.ProfileAggregate.profileAgg
    import org.apache.spark.sql.types.TimestampType
    val flat = flattenJson(df, jsonCol, emitRoot = true)
    val rows = flat.groupBy("path")
      .agg(profileAgg(col("vstr"), col("vnum"),
        lit(null).cast(TimestampType), col("vtag"),
        exactLimit, topkCap).as("p"))
      .select(col("path"), col("p.*"))
    val total = max(when(col("path") === "", col("seen")))
      .over(Window.partitionBy())
    rows.withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast("double"))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .filter(col("path") =!= "")
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("cardinality_approx"),
        col("num_min"), col("num_max"),
        to_json(col("type_counts")).as("type_distribution"),
        to_json(col("top_values")).as("top_values"))
      .orderBy("path")
  }

  /** Built-in-aggregates twin of [[profileStats]] (exact countDistinct
    * over value strings) — cross-check plan only.
    */
  def profileStatsBuiltin(df: DataFrame, jsonCol: String): DataFrame = {
    val agg = flattenJson(df, jsonCol, emitRoot = true)
      .groupBy("path").agg(
        count(col("vstr")).as("n_present"),
        count(lit(1)).as("n_seen"),
        countDistinct(col("vstr")).as("cardinality"),
        min(col("vnum")).as("num_min"),
        max(col("vnum")).as("num_max"))
    val total = max(when(col("path") === "", col("n_seen")))
      .over(Window.partitionBy())
    agg.withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast("double"))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .filter(col("path") =!= "")
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("num_min"), col("num_max"))
      .orderBy("path")
  }

  /** Per-path per-VALUE type histogram — `type_distribution`
    * (`core/analyser.py:192,286`) in its full mixed-type glory.
    */
  def typeHistogram(df: DataFrame, jsonCol: String): DataFrame =
    flattenJson(df, jsonCol).groupBy("path", "vtag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("path", "vtag")

  /** (path, vstr, vnum, vtag) leaf rows of one native `VariantType`
    * column, rooted at the column's own name — the variant binary is
    * walked directly ([[graft.plans.VariantExplode]]), never rendered
    * to JSON and re-parsed.
    */
  def flattenVariant(df: DataFrame, variantCol: String): DataFrame =
    graft.util.Utils.spread(df).select(
      graft.plans.VariantExplode.variantExplode(
        col(variantCol), variantCol).as(
        Seq("path", "vstr", "vnum", "vtag")))

  /** [[typeHistogram]] over NATIVE `VariantType` columns — the §2
    * type profile for `varianttype=true` reads without a second pass
    * through the StringType bridge. Several variant columns union
    * into one histogram (each rooted at its column name), the shape
    * of a document split across variant fields; the single-scan
    * union is cheap because every branch prunes to its one column.
    */
  def variantTypeHistogram(df: DataFrame,
                           variantCols: Seq[String]): DataFrame = {
    require(variantCols.nonEmpty, "variantTypeHistogram needs columns")
    variantCols.map(flattenVariant(df, _)).reduce(_ unionAll _)
      .groupBy("path", "vtag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("path", "vtag")
  }

  /** Flat schema with deterministic most-frequent-tag election
    * (tie → lexical; the fix over last-writer-wins, SURVEY §1.2).
    */
  def flatSchema(df: DataFrame, jsonCol: String): DataFrame = {
    val hist = flattenJson(df, jsonCol)
      .filter(col("vtag") =!= "null")
      .groupBy("path", "vtag").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("path")
      .orderBy(col("cnt").desc, col("vtag").asc)
    hist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("path"), col("vtag").as("type_tag"))
      .orderBy("path")
  }
}
