package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Datasketches HLL via Spark's
  * `hll_sketch_agg` family) — the incremental-distinct pattern a
  * 100 TB pipeline runs on: sketch each ingest slice ONCE into a tiny
  * staging table (one binary column per group), then answer any
  * coarser rollup — per week, per source, global — by merging sketches
  * without ever rescanning the raw data. Re-aggregating exact
  * distincts at that scale re-shuffles the corpus per question;
  * merging sketches shuffles kilobytes.
  *
  * Estimates are implementation-defined (like the profiler's HLL
  * mode), so gates hash the deterministic columns and bound the
  * estimate against the exact count — see `hll_rollup_events`.
  */
object Sketches {

  /** The staging table: one row per group with an HLL sketch of
    * `target`, plus the exact row count (exact counts ARE mergeable —
    * sums — so they ride along). lgK = 12 ⇒ ~1.6 % standard error,
    * 2–4 KB per sketch dense.
    */
  def sketchTable(df: DataFrame, groups: Seq[String], target: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(hll_sketch_agg(col(target), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Roll a sketch table up to a coarser grouping by merging sketches
    * — no raw data touched. Empty `groups` = the global rollup.
    */
  def rollup(sketches: DataFrame, groups: Seq[String]): DataFrame = {
    val agg = sketches.groupBy(groups.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
          .as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))
    if (groups.isEmpty) agg else agg.orderBy(groups.map(col): _*)
  }
}
