package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TypeTags

/** The flagship operator: schema inference + per-field statistics over a
  * collection — the reference's "Analyze Schema" pipeline (reference:
  * `core/analyser.py:242-322`, fused per-path aggregate state at
  * `core/analyser.py:47-66`) re-architected for Spark.
  *
  * Design: ONE scan of the source. A schema-driven projection flattens
  * every document into `(path, vstr, vnum, vts, vtype)` leaf rows (the
  * columnar analogue of the reference's recursive
  * `extract_schema_and_stats` walk at `core/analyser.py:32-79`), then a
  * single `groupBy(path)` computes all statistics. Path cardinality is
  * tiny (≤ thousands), so the shuffle is negligible; the heavy lifting —
  * partial counts, min/max — happens map-side via Catalyst's partial
  * aggregation. Exact `countDistinct` is the only stat that shuffles
  * distinct values; at 100 TB scale flip `exact = false` to use HLL
  * (`approx_count_distinct`), mirroring SURVEY §7.3's sketch-mode flag.
  *
  * Array fields contribute two kinds of rows, matching the reference's
  * semantics: the *whole array* (JSON-canonicalized, for presence +
  * cardinality-of-whole-arrays, `core/analyser.py:142,188`) under `path`,
  * and each *element* under `path[]` for the element sub-stats
  * (`core/analyser.py:131-138`). Struct fields are recursed into, not
  * tagged (`core/analyser.py:70-71`).
  */
object Profiler {

  /** Leaf-row shape produced by [[flatten]]. */
  val rowType: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("vstr", StringType),
    StructField("vnum", DoubleType),
    StructField("vts", TimestampType),
    StructField("vtype", StringType)))

  private def leafStruct(path: String, vstr: Column, vnum: Column,
                         vts: Column, vtype: Column): Column =
    struct(
      lit(path).as("path"), vstr.cast(StringType).as("vstr"),
      vnum.cast(DoubleType).as("vnum"), vts.cast(TimestampType).as("vts"),
      vtype.as("vtype"))

  /** Tag for a value: the static schema tag, or "null" for null values —
    * so the per-path type histogram (`type_distribution`,
    * `core/analyser.py:192,286`) distinguishes nulls like the extractor
    * does (`core/extractor.py:86-87`).
    */
  private def valueTag(c: Column, dt: DataType): Column =
    when(c.isNull, lit(TypeTags.Null)).otherwise(lit(TypeTags.tagOf(dt)))

  /** In lean mode, drop the string rendering of a value whose type has
    * a lossless native (vnum/vts) representation: the ProfileAggregate
    * consumer hashes the native bits for distinct-counting instead, so
    * the double→string / timestamp→string casts — the flatten's
    * dominant cost on numeric tables — never run. Decimals keep the
    * string (double coercion is lossy beyond 15 significant digits,
    * and the string is what preserves exact-distinct parity).
    */
  private def leanable(dt: DataType): Boolean =
    !dt.isInstanceOf[DecimalType] &&
      (TypeTags.isNumeric(dt) || TypeTags.isTemporal(dt))

  /** Recursively build the per-document leaf rows for one column. */
  private def leafRows(path: String, c: Column, dt: DataType,
                       lean: Boolean = false): Seq[Column] =
    dt match {
      case st: StructType =>
        // dict: recurse, don't tag (core/analyser.py:70-71)
        st.fields.toSeq.flatMap(f =>
          leafRows(s"$path.${f.name}", c.getField(f.name), f.dataType, lean))
      case ArrayType(et, _) =>
        val whole = leafStruct(path, to_json(c), lit(null), lit(null),
          valueTag(c, dt))
        val elemRows: Seq[Column] = et match {
          case est: StructType =>
            // array<dict>: one dict-presence row per element, plus each
            // struct field recursed to its own `path[].field` rows
            // (the extractor's per-item sub-schema,
            // core/extractor.py:103-129); scalar fields only — deeper
            // array nesting inside stays summarized by the dict row
            val dictRows = transform(c, x => leafStruct(s"$path[]",
              to_json(x), lit(null), lit(null), valueTag(x, est)))
            val fieldRows = est.fields.toSeq.collect {
              case f if !f.dataType.isInstanceOf[StructType] &&
                !f.dataType.isInstanceOf[ArrayType] =>
                transform(c, x => leafStruct(s"$path[].${f.name}",
                  if (lean && leanable(f.dataType)) lit(null)
                  else x.getField(f.name),
                  if (TypeTags.isNumeric(f.dataType)) x.getField(f.name)
                  else lit(null),
                  if (TypeTags.isTemporal(f.dataType)) x.getField(f.name)
                  else lit(null),
                  valueTag(x.getField(f.name), f.dataType)))
            }
            dictRows +: fieldRows
          case _ =>
            Seq(transform(c, x => leafStruct(s"$path[]",
              if (lean && leanable(et)) lit(null) else x,
              if (TypeTags.isNumeric(et)) x else lit(null),
              if (TypeTags.isTemporal(et)) x else lit(null),
              valueTag(x, et))))
        }
        array(whole) +: elemRows.map(coalesce(_, emptyLeafArray))
      case _ =>
        val vnum = if (TypeTags.isNumeric(dt)) c else lit(null)
        val vts = if (TypeTags.isTemporal(dt)) c else lit(null)
        val vstr = if (lean && leanable(dt)) lit(null) else c
        Seq(array(leafStruct(path, vstr, vnum, vts, valueTag(c, dt))))
    }

  private val emptyLeafArray: Column =
    array().cast(ArrayType(rowType, containsNull = false))

  /** The leaf-row array for one column subtree (public for streaming,
    * which flattens a struct column while keeping event time alongside).
    * Strips the wrapper prefix so paths look like top-level fields.
    */
  def leafRowsFor(path: String, c: Column, dt: DataType): Column = {
    val arrays = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          leafRows(f.name, c.getField(f.name), f.dataType))
      case _ => leafRows(path, c, dt)
    }
    concat(arrays: _*)
  }

  /** One-scan flatten of a DataFrame into (path, vstr, vnum, vts, vtype)
    * leaf rows. The projection is built at plan time from the schema, so
    * the whole thing stays inside whole-stage codegen — no UDFs.
    */
  private def flattenImpl(df: DataFrame, lean: Boolean,
                          spread: Boolean): DataFrame = {
    val arrays: Seq[Column] = df.schema.fields.toSeq.flatMap(f =>
      leafRows(f.name, col(f.name), f.dataType, lean))
    val in = if (spread) graft.util.Utils.spread(df) else df
    in.select(explode(concat(arrays: _*)).as("f")).select("f.*")
  }

  /** One-scan flatten with full value strings, deliberately NOT
    * spread(): its consumers (exact `countDistinct`, `topK`'s
    * groupBy(value)) rely on map-side partial aggregation of repeated
    * values — a round-robin repartition scatters the repeats across
    * partitions, gutting the partial dedup AND adding a full shuffle
    * of the rendered strings.
    */
  def flatten(df: DataFrame): DataFrame =
    flattenImpl(df, lean = false, spread = false)

  /** [[flatten]] in lean mode (see [[leanable]]): vstr is null for
    * numeric/temporal leaves, and the (cheap, now string-free) scan is
    * spread() across the session's parallelism before the CPU-heavy
    * consumer work. ONLY for consumers that either hash vnum/vts
    * natively for distinct counting ([[profileStatsFast]],
    * [[profileFull]]) or never read the numeric strings at all
    * ([[numericQuantiles]]); generic countDistinct-over-vstr consumers
    * need [[flatten]]'s rendered strings.
    */
  def flattenLean(df: DataFrame): DataFrame =
    flattenImpl(df, lean = true, spread = true)

  /** Per-path core statistics: presence, missing %, exact cardinality,
    * numeric min/max, temporal min/max (ISO strings). One row per path,
    * ordered by path (`core/analyser.py:320-321`).
    *
    * Routed through the single-pass [[graft.functions.ProfileAggregate]]
    * ([[profileStatsFast]]) — bit-for-bit identical to the built-in
    * plan below `exactLimit` distinct values per path (the
    * `profile_fast_lineitem` oracle proves parity on the same data),
    * and ~10× faster: the built-in exact `countDistinct` shuffles
    * every distinct (path, value) string pair, the aggregate shuffles
    * one bounded buffer per (partition, path) — the difference between
    * a plan that dies at 100 TB and one that doesn't.
    *
    * @param exact exact cardinality below 100k distinct per path
    *              (reference parity, `core/analyser.py:142,188`) vs
    *              pure-HLL sketch mode for scale.
    */
  def profileStats(df: DataFrame, exact: Boolean = true): DataFrame =
    if (exact) profileStatsFast(df)
    else profileStatsFast(df, exactLimit = 0)

  /** The built-in-aggregates twin of [[profileStats]] (exact
    * `countDistinct` over rendered value strings) — kept as the
    * cross-check plan the specs compare [[profileStatsFast]] against,
    * not as a default path: it is correct but shuffles every distinct
    * (path, value) pair.
    */
  def profileStatsBuiltin(df: DataFrame, exact: Boolean = true): DataFrame = {
    // spread() the DOCUMENT scan (not the leaf rows): the per-leaf
    // string rendering is this twin's dominant CPU and a single-file
    // local scan otherwise runs it on the scan's 1-3 tasks (measured
    // r19: 2.8 s of the row's 3.2 s in a 3-task stage). The dedup
    // argument for unspread flatten still holds per partition — a
    // value repeated across the scatter costs at most one extra
    // shuffled (path, vstr) pair per partition it lands in, bounded
    // and tiny next to a 10x parallel render; on a real multi-split
    // scan spread() is a no-op, so the 100 TB plan is unchanged.
    val flat = flattenImpl(df, lean = false, spread = true)
    val card =
      if (exact) countDistinct(col("vstr"))
      else approx_count_distinct(col("vstr"))
    val agg = flat.groupBy("path").agg(
      count(col("vstr")).as("n_present"),
      count(lit(1)).as("n_seen"),
      card.as("cardinality"),
      min(col("vnum")).as("num_min"),
      max(col("vnum")).as("num_max"),
      date_format(min(col("vts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .as("ts_min"),
      date_format(max(col("vts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .as("ts_max"))
    // document total = rows seen at any top-level path (flatten emits a
    // row per document there even for nulls) — derived from the same
    // pass instead of a second df.count() scan of the source.
    val total = max(when(!col("path").contains("[]"), col("n_seen")))
      .over(Window.partitionBy())
    agg
      // missing% is per-document (core/analyser.py:280-281); for array
      // *element* paths the denominator isn't document count, so the
      // stat is undefined — null it rather than emit a negative number.
      .withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast(DoubleType))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("num_min"), col("num_max"),
        col("ts_min"), col("ts_max"))
      .orderBy("path")
  }

  /** Single-pass profile via the custom [[graft.functions.ProfileAggregate]]
    * (`TypedImperativeAggregate`): ONE global aggregate whose buffer
    * carries all paths' stats — the shuffle is one serialized buffer per
    * partition instead of every distinct (path, value) pair. Exact
    * cardinality below `exactLimit` distinct values per path (where the
    * output matches [[profileStats]] bit-for-bit), HLL beyond.
    * Same output columns as [[profileStats]] for drop-in use.
    */
  def profileStatsFast(df: DataFrame, exactLimit: Int = 100000): DataFrame = {
    import graft.functions.ProfileAggregate.profileAgg
    val flat = flattenLean(df)
    // grouped by path: partial buffers merge in parallel, one reducer
    // per path, instead of funneling every partition's distinct-hash
    // set through a single global-aggregate task
    val rows = flat.groupBy("path")
      .agg(profileAgg(col("vstr"), col("vnum"), col("vts"),
        col("vtype"), exactLimit).as("p"))
      .select(col("path"), col("p.*"))
    // document total = max docs seen over non-element top-level paths
    val total = max(when(!col("path").contains("[]"), col("seen")))
      .over(Window.partitionBy())
    rows.withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast(DoubleType))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("num_min"), col("num_max"),
        col("ts_min"), col("ts_max"))
      .orderBy("path")
  }

  /** The complete single-pass profile — every per-path statistic of the
    * reference's "Analyze Schema" result in ONE aggregate: counts,
    * missing%, cardinality (exact→HLL), numeric/temporal min-max, type
    * distribution, and top-5 values (Misra-Gries). Maps rendered as
    * sorted JSON for deterministic output.
    *
    * @param topkCap Misra-Gries counter budget per path: counts are
    *                exact (and merge-order-independent) while a path's
    *                distinct sub-256-char strings stay ≤ cap, lower
    *                bounds with error ≤ n/cap beyond. 256 default keeps
    *                the buffer tiny while covering realistic
    *                categorical/top-k columns exactly.
    */
  def profileFull(df: DataFrame, exactLimit: Int = 100000,
                  topkCap: Int = 256): DataFrame = {
    import graft.functions.ProfileAggregate.profileAgg
    val flat = flattenLean(df)
    val rows = flat.groupBy("path")
      .agg(profileAgg(col("vstr"), col("vnum"), col("vts"),
        col("vtype"), exactLimit, topkCap).as("p"))
      .select(col("path"), col("p.*"))
    val total = max(when(!col("path").contains("[]"), col("seen")))
      .over(Window.partitionBy())
    rows.withColumn("missing_pct",
        when(col("path").contains("[]"), lit(null).cast(DoubleType))
          .otherwise((total - col("n_present")) * 100.0 / total))
      .select(col("path"), col("n_present"), col("missing_pct"),
        col("cardinality"), col("cardinality_approx"),
        col("num_min"), col("num_max"), col("ts_min"), col("ts_max"),
        to_json(col("type_counts")).as("type_distribution"),
        to_json(col("top_values")).as("top_values"))
      .orderBy("path")
  }

  /** Per-path numeric quantiles (p25/p50/p75, exact interpolated) —
    * beyond-reference profiling stat; rounded to 6 decimals so the
    * interpolation arithmetic is engine-comparable. One flatten pass,
    * numeric paths only.
    */
  def numericQuantiles(df: DataFrame): DataFrame =
    // lean flatten: quantiles read only vnum, so skip the vstr
    // rendering entirely and spread the scan ahead of the CPU-heavy
    // percentile aggregation. ONE percentile agg with the cut ARRAY,
    // not one agg per cut: each exact-percentile aggregate buffers
    // (and sorts) every group value independently, so three scalar
    // calls pay 3× the buffer memory and 3× the sort — the array
    // form answers all cuts from a single buffer (measured on the
    // noop-sink bench: the stacked-scalar shape dominated
    // profile_quantiles_approx at 34.7 s; same values to the bit,
    // since each cut reads the same sorted buffer).
    // (path, value) counts FIRST (whole-stage-codegen hash aggregate,
    // map-side partials), then percentile over DISTINCT values with
    // the count as frequency: the percentile buffer — a boxed
    // value→count map built one insert per input row — receives one
    // insert per distinct value instead. Bit-identical result (the
    // final counts map is the same map), but the heap churn drops
    // from O(rows) boxed inserts to O(distinct): the row-fed shape
    // measured 45 s first-run / 6 s warm on the 4.8M-leaf lineitem
    // flatten purely from allocation pressure (guide §2.3/§5).
    flattenLean(df).filter(col("vnum").isNotNull)
      .groupBy("path", "vnum").agg(count(lit(1)).as("freq"))
      .groupBy("path").agg(
        percentile(col("vnum"),
          array(lit(0.25), lit(0.5), lit(0.75)),
          col("freq")).as("ps"))
      .select(col("path"),
        round(element_at(col("ps"), 1), 6).as("p25"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p75"))
      .orderBy("path")

  /** Equi-width histogram for every numeric path — the distribution
    * visual profilers pair with min/max/quantiles (absent in the
    * reference). Two passes over the lean flatten: a tiny (path →
    * lo/hi) aggregate broadcast back, then one partial-aggregated
    * (path, bucket) count — the corpus never shuffles, only
    * (paths × buckets) count rows do. Bucket index is
    * `min(floor((v-lo)/w), n-1)` in IEEE double arithmetic — the
    * same two divisions in any engine give the same bits, so the
    * binning is oracle-reproducible. A constant path (lo = hi)
    * degenerates to a single bucket 0.
    */
  def histogram(df: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val vals = flattenLean(df).filter(col("vnum").isNotNull)
    val ranges = vals.groupBy("path")
      .agg(min("vnum").as("lo"), max("vnum").as("hi"))
    vals.join(broadcast(ranges), "path")
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("vnum") - col("lo")) /
              ((col("hi") - col("lo")) / lit(buckets))).cast(LongType),
            lit(buckets - 1L))))
      .groupBy("path", "bucket")
      .agg(count(lit(1)).as("n"), min("lo").as("lo"),
        min("hi").as("hi"))
      .orderBy("path", "bucket")
  }

  /** The 100 TB quantile path: `approx_percentile` (a mergeable
    * KLL-style sketch — bounded memory per path however many rows)
    * instead of exact `percentile`, whose state holds every distinct
    * value. Estimates are implementation-defined, so the gate query
    * ([[graft.SparkEntry]] `profile_quantiles_approx`) calibrates
    * them against the exact quantiles in-engine and hash-checks the
    * bound — the same pattern as the HLL cardinality row.
    *
    * @param accuracy approx_percentile's 1/ε knob: error ≤ 1/accuracy
    *                 of the rank space per estimate.
    */
  def numericQuantilesApprox(df: DataFrame,
                             accuracy: Int = 10000): DataFrame =
    // one sketch per group, all cuts from it (see [[numericQuantiles]]
    // on why stacked scalar calls are the wrong shape)
    flattenLean(df).filter(col("vnum").isNotNull)
      .groupBy("path").agg(
        approx_percentile(col("vnum"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy))
          .as("ps"))
      .select(col("path"),
        round(element_at(col("ps"), 1), 6).as("p25"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p75"))
      .orderBy("path")

  /** Per-path type histogram — `type_distribution`
    * (`core/analyser.py:192,286`), with nulls as their own tag. Unlike the
    * reference's nondeterministic last-writer-wins schema entry
    * (`core/analyser.py:186`), the histogram is the primary artifact here
    * (intentional semantic fix, SURVEY §1.2).
    */
  def typeHistogram(df: DataFrame): DataFrame =
    // lean, unspread: only (path, vtype) are read — no value strings to
    // render, and plain counts partial-aggregate fine on the scan tasks
    flattenImpl(df, lean = true, spread = false)
      .groupBy("path", "vtype").agg(count(lit(1)).as("cnt"))
      .orderBy("path", "vtype")

  /** Per-path top-k values: strings shorter than 256 chars only
    * (`core/analyser.py:202-204`), k=5 (`core/analyser.py:299-300`).
    * Deterministic tie-break: count desc, value asc (SURVEY §7.3 fixes
    * the reference's insertion-order-dependent `Counter.most_common`).
    */
  def topK(df: DataFrame, k: Int = 5): DataFrame = {
    // lean keeps every str value (only numeric/temporal strings are
    // dropped, and those never pass the vtype filter below); unspread
    // so the groupBy(value) partial aggregation sees the repeats
    val flat = flattenImpl(df, lean = true, spread = false)
    val counted = flat
      .filter(col("vtype") === "str" && length(col("vstr")) < 256)
      .groupBy("path", "vstr").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("path")
      .orderBy(col("cnt").desc, col("vstr").asc)
    counted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("path"), col("vstr").as("value"), col("cnt"),
        col("rank").cast("long").as("rank"))
      .orderBy("path", "rank")
  }

  /** (path, static tag, non-null-count expression) triples mirroring
    * [[leafRows]]'s path/tag structure, for the [[flatSchema]] fast
    * path.
    */
  private def schemaCounts(path: String, c: Column, dt: DataType)
      : Seq[(String, String, Column)] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap(f =>
        schemaCounts(s"$path.${f.name}", c.getField(f.name), f.dataType))
    case ArrayType(et, _) =>
      def nnElems(g: Column => Column): Column =
        sum(coalesce(size(filter(c, x => g(x).isNotNull)), lit(0)))
      val elems: Seq[(String, String, Column)] = et match {
        case est: StructType =>
          (s"$path[]", TypeTags.tagOf(est), nnElems(identity)) +:
            est.fields.toSeq.collect {
              case f if !f.dataType.isInstanceOf[StructType] &&
                !f.dataType.isInstanceOf[ArrayType] =>
                (s"$path[].${f.name}", TypeTags.tagOf(f.dataType),
                  nnElems(_.getField(f.name)))
            }
        case _ => Seq((s"$path[]", TypeTags.tagOf(et), nnElems(identity)))
      }
      (path, TypeTags.tagOf(dt), count(c)) +: elems
    case _ => Seq((path, TypeTags.tagOf(dt), count(c)))
  }

  /** Flat schema: (path, type_tag) — the representative type per path.
    * Deterministic: most-frequent non-null tag, ties broken lexically
    * (semantic fix over last-writer-wins, SURVEY §1.2).
    *
    * For statically-typed input every non-null value of a path carries
    * the SAME plan-time tag ([[valueTag]] is `lit(tagOf(dt))` outside
    * null), so the vote degenerates to "the static tag, if the path has
    * ≥1 non-null value" — answered by ONE narrow global aggregate:
    * no flatten row blow-up, no groupBy shuffle (partial aggregation
    * reduces each partition to a single row), no rank window. Per-VALUE
    * dynamic tags (mixed-typed JSON columns) are
    * [[JsonProfiler.flatSchema]]'s domain, which keeps the histogram
    * vote.
    */
  def flatSchema(df: DataFrame): DataFrame = {
    val specs = df.schema.fields.toSeq.flatMap(f =>
      schemaCounts(f.name, col(f.name), f.dataType))
    // deliberately NOT spread(): the narrow count aggregate reduces
    // map-side to one row per partition — repartitioning would shuffle
    // the full table just to parallelize cheap null-counting
    val agged = df.agg(specs.head._3.as("c0"),
      specs.tail.zipWithIndex.map { case (s, i) => s._3.as(s"c${i + 1}") }: _*)
    val entries = specs.zipWithIndex.map { case ((p, tag, _), i) =>
      struct(lit(p).as("path"), lit(tag).as("type_tag"),
        col(s"c$i").cast(LongType).as("cnt"))
    }
    agged.select(explode(array(entries: _*)).as("e"))
      .filter(col("e.cnt") > 0)
      .select(col("e.path"), col("e.type_tag"))
      .orderBy("path")
  }

  /** Exact pairwise correlation SUFFICIENT STATISTICS over integer-
    * unit numeric columns — the "which fields move together" EDA
    * matrix, emitted as integers so the answer is engine-reproducible
    * (a float `corr()` accumulates in reduction order and never
    * hash-matches across engines). Callers pass columns ALREADY in
    * integer units (counts, cents, permille — the profile family's
    * micro-izing discipline); rows with a NULL in either column of a
    * pair drop from that pair only, the standard pairwise-complete
    * convention. Output per (x, y) pair with x < y lexicographically:
    * (col_x, col_y, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2).
    *
    * Pearson r falls out as (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ᵗ)(n·Σy²
    * − Σy²ᵗ)) — [[corrPpm]] derives it as a round-6 double for human
    * use; the DECLARED oracle row hashes only the exact integer
    * stats, because casting wide integers to double is exactly where
    * engines double-round apart (the q1@sf1 lesson).
    *
    * Scale shape: ONE map-side-combined global aggregate with
    * pairs × 6 integer lanes (k columns → k·(k−1)/2 pairs) — no
    * shuffle beyond the single agg row, the flatSchema explode
    * pattern turning lanes back into rows. 64-bit overflow bound:
    * |x·y| · rows must stay under 2⁶³ ≈ 9.2·10¹⁸ — at 10¹² rows that
    * allows |x·y| ≤ 9·10⁶, so keep units small (permille, not micro)
    * or pre-aggregate; the bound is the caller's contract and this
    * docstring is where it is stated.
    */
  def corrStats(df: DataFrame, cols: Seq[String],
      groupBy: Seq[String] = Nil): DataFrame = {
    val (lanes, entries) = corrLanes(cols)
    // grouped variant: same 6 integer lanes per pair, keyed by the
    // stratum columns — "does quality correlate with length
    // differently by source" costs exactly one more groupBy key on
    // the single map-side-combined aggregate (result is strata ×
    // pairs rows, still audit-sized)
    val agged =
      if (groupBy.isEmpty) df.agg(lanes.head, lanes.tail: _*)
      else df.groupBy(groupBy.map(col): _*).agg(lanes.head, lanes.tail: _*)
    agged.select(groupBy.map(col) :+
        explode(array(entries: _*)).as("e"): _*)
      .select(groupBy.map(col) :+ col("e.*"): _*)
      .orderBy(groupBy ++ Seq("col_x", "col_y") map col: _*)
  }

  /** The (aggregate lanes, per-pair unpack structs) behind
    * [[corrStats]], factored out because the sufficient statistics
    * are sums — merge-only by addition — so the SAME lanes serve the
    * batch aggregate and the windowed stream stager
    * ([[graft.streaming.ProfileStream.corrStatsStream]]) with the
    * equivalence (slices roll up to batch) holding by construction.
    */
  private[graft] def corrLanes(cols: Seq[String])
      : (Seq[Column], Seq[Column]) = {
    require(cols.size >= 2, "corrStats needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val lanes = pairs.zipWithIndex.flatMap { case ((x, y), p) =>
      val cx = col(x).cast(LongType)
      val cy = col(y).cast(LongType)
      val both = cx.isNotNull && cy.isNotNull
      def s(e: Column, name: String) =
        sum(when(both, e).otherwise(lit(null))).as(s"p${p}_$name")
      Seq(
        count(when(both, lit(1))).as(s"p${p}_n"),
        s(cx, "sx"), s(cy, "sy"), s(cx * cy, "sxy"),
        s(cx * cx, "sx2"), s(cy * cy, "sy2"))
    }
    val entries = pairs.zipWithIndex.map { case ((x, y), p) =>
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"p${p}_n").cast(LongType).as("n"),
        coalesce(col(s"p${p}_sx"), lit(0L)).cast(LongType).as("sum_x"),
        coalesce(col(s"p${p}_sy"), lit(0L)).cast(LongType).as("sum_y"),
        coalesce(col(s"p${p}_sxy"), lit(0L)).cast(LongType)
          .as("sum_xy"),
        coalesce(col(s"p${p}_sx2"), lit(0L)).cast(LongType)
          .as("sum_x2"),
        coalesce(col(s"p${p}_sy2"), lit(0L)).cast(LongType)
          .as("sum_y2"))
    }
    (lanes, entries)
  }

  /** Pearson r (round-6 double) derived from [[corrStats]] rows —
    * the human-facing matrix; constant columns (zero variance) yield
    * NULL. Spec-tested against hand calculation; deliberately NOT the
    * hashed oracle surface (see [[corrStats]]).
    */
  def corrPpm(stats: DataFrame): DataFrame = {
    // DECIMAL(38,0) intermediates: n·sum_x2 and sum_x·sum_x are
    // products of two 64-bit sums and silently wrap 2⁶³ in default
    // non-ANSI Spark at ~10⁷ rows of permille-unit data — far inside
    // corrStats's own 10¹²-row contract. Decimal keeps the derivation
    // exact out to corrStats's full bound; only the final ratio drops
    // to double.
    def d(name: String) = col(name).cast("decimal(38,0)")
    val dx = d("n") * d("sum_x2") - d("sum_x") * d("sum_x")
    val dy = d("n") * d("sum_y2") - d("sum_y") * d("sum_y")
    stats.select(col("col_x"), col("col_y"), col("n"),
      // explicit zero-variance guard: dx/dy are ≥ 0 by Cauchy-Schwarz
      // and ANSI mode errors on /0 rather than yielding NaN
      when(dx > 0 && dy > 0, round(
        (d("n") * d("sum_xy") - d("sum_x") * d("sum_y"))
          .cast("double") /
          sqrt(dx.cast("double") * dy.cast("double")), 6))
        .as("corr"))
      .orderBy("col_x", "col_y")
  }

  /** Schema-drift report between two corpus snapshots — the "did the
    * upstream producer change the contract" alarm a profiling engine
    * exists to raise: full-outer join of the two [[flatSchema]]
    * reports on path, each path tagged `added` / `removed` /
    * `type_changed` / `kept` with both type tags carried. Both inputs
    * reduce map-side to ONE row per partition before the diff (the
    * flatSchema shape), so the join is schema-sized — ≤ paths rows —
    * whatever the corpora weigh; run it between yesterday's and
    * today's landing zone and alert on anything ≠ kept.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = flatSchema(oldDf).withColumnRenamed("type_tag", "old_tag")
    val n = flatSchema(newDf).withColumnRenamed("type_tag", "new_tag")
    o.join(n, Seq("path"), "full_outer")
      .select(col("path"),
        when(col("old_tag").isNull, lit("added"))
          .when(col("new_tag").isNull, lit("removed"))
          .when(col("old_tag") =!= col("new_tag"), lit("type_changed"))
          .otherwise(lit("kept")).as("status"),
        col("old_tag"), col("new_tag"))
      .orderBy("path")
  }

  /** Hierarchical schema render: flat dotted paths → nested JSON object
    * (`core/analyser.py:324-333` `schema_to_hierarchical`). Pure driver
    * function over the (small) flat-schema result.
    */
  def hierarchicalSchema(flat: Seq[(String, String)]): String = {
    sealed trait Node
    case class Leaf(tag: String) extends Node
    case class Branch(children: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node

    val root = Branch(scala.collection.mutable.LinkedHashMap())
    flat.sortBy(_._1).foreach { case (path, tag) =>
      val parts = path.split('.')
      var cur = root
      parts.dropRight(1).foreach { p =>
        cur = cur.children.getOrElseUpdate(p,
          Branch(scala.collection.mutable.LinkedHashMap())) match {
          case b: Branch => b
          case _: Leaf => // path collides with a leaf; shadow it
            val b = Branch(scala.collection.mutable.LinkedHashMap())
            cur.children.update(p, b); b
        }
      }
      cur.children.update(parts.last, Leaf(tag))
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    def render(n: Node): String = n match {
      case Leaf(t) => s"""{"type": "${esc(t)}"}"""
      case Branch(ch) => ch.map { case (k, v) =>
        s""""${esc(k)}": ${render(v)}"""
      }.mkString("{", ", ", "}")
    }
    render(root)
  }
}
