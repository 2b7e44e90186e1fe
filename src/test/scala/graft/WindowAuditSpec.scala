package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface scale audit: no query may plan a corpus-sized
  * single-partition window. Global (empty-partition) windows are
  * legitimate ONLY over provably tiny inputs — each allowlisted entry
  * documents why its input is bounded.
  */
class WindowAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  test("every declared query has an oracle, and every oracle has a " +
      "query — a missing oracleSql entry silently downgrades the " +
      "driver's gate to a rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphaned oracle SQL: ${o -- q}")
  }

  test("every query's physical plan: global windows only on " +
      "bounded inputs") {
    import org.apache.spark.sql.execution.window.WindowExec
    val allow = Map(
      // rank over ≤ topN survivors of TakeOrderedAndProject
      "vocabulary" -> "post-top-N rank over ≤ topN rows",
      // offsets over exactly 256 shard-count rows
      "shuffle_order" -> "256-row shard offset rollup",
      // offsets over ≤ stages·256 cells + the quality_blend bin
      // cumsums (≤ bins rows each)
      "curriculum_order" -> "stage-shard offset rollup, ≤ 4·256 rows",
      // profile family: the doc-total max() runs over the per-path
      // AGGREGATE (≤ #schema paths rows), never the corpus
      "profile_stats_events" -> "per-path aggregate, schema-sized",
      "profile_stats_lineitem" -> "per-path aggregate, schema-sized",
      "profile_stats_embeddings" -> "per-path aggregate, schema-sized",
      "profile_fast_lineitem" -> "per-path aggregate, schema-sized",
      "profile_full_events" -> "per-path aggregate, schema-sized",
      "profile_approx_events" -> "per-path aggregate, schema-sized",
      "json_profile_docs" -> "per-path aggregate, schema-sized",
      "json_profile_props" -> "per-path aggregate, schema-sized",
      "json_full_docs" -> "per-path aggregate, schema-sized",
      // IVF/PQ: centroid numbering over the limit(nlist) sample (16
      // rows)
      "ann_ivf_topk" -> "centroid rank over limit(nlist) rows",
      "ann_ivf_probe1" -> "centroid rank over limit(nlist) rows",
      "ann_pq_topk" -> "codebook rank over limit(codebookSize) rows",
      // embeds the sampled-PQ arm (same bounded codebook rank); the
      // trained arm ranks nothing globally — row-local argmin encode
      "ann_pq_recall" -> "codebook rank over limit(codebookSize) rows",
      "ann_ivfpq_topk" -> "codebook ranks over bounded samples",
      "ann_ivfpq_probe1" -> "codebook ranks over bounded samples",
      // trained-residual arm: the only global window is the coarse
      // centroid numbering over the limit(nlist) sample; codebooks
      // come from the window-free TakeOrdered trainer
      "ann_ivfpq_residual" -> "centroid rank over limit(nlist) rows",
      "ann_ivfpq_recall" -> "centroid ranks over limit(nlist) rows",
      "ann_ivfpq_rerank" -> "centroid rank over limit(nlist) rows",
      // the kCand knob curve rides the same trained-index build
      "ann_rerank_curve" -> "centroid rank over limit(nlist) rows",
      "ann_ivfsq8_topk" -> "centroid rank over limit(nlist) rows",
      "ann_ivfsq8_probe1" -> "centroid rank over limit(nlist) rows",
      "ann_index_roundtrip" -> "centroid rank over limit(nlist) rows",
      // marginal-CDF cumsums run over the bin HISTOGRAM (≤ bins rows
      // post-aggregation), never the corpus — the sort-free design
      "quality_blend" -> "bin-histogram cumsum, ≤ bins rows",
      // both CDF cumsums run over bin-sketch rows (≤ bins each)
      "ks_sample_audit" -> "bin-sketch cumsum, ≤ bins rows",
      // global-CDF cumsum + total over the merged sketch (≤ bins)
      "ks_by_source" -> "merged bin-sketch cumsum, ≤ bins rows",
      // staged-slice merge + both CDFs: all ≤ bins-row inputs
      "ks_stream_audit" -> "merged bin-sketch cumsum, ≤ bins rows",
      // consecutive-window lag over DISTINCT closed slice starts
      // (≤ #windows rows; the slices themselves are schema-sized)
      "schema_diff_stream" -> "lag over ≤ #windows slice starts"
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val globals =
          try fn(spark, dir).queryExecution.sparkPlan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          catch { case _: Throwable => Nil }
        if (globals.nonEmpty) Some(name) else None
      }
    val unexpected = offenders.filterNot(allow.contains)
    assert(unexpected.isEmpty,
      s"corpus-sized single-partition windows in: $unexpected")
  }

  test("every query's physical plan: unbounded joins (cartesian / " +
      "nested-loop) only where one side is provably small") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val allow = Map(
      // the documented O(n²) recall-1.0 baseline (scale path is LSH)
      "embedding_near_dups_exact" -> "declared exact baseline",
      // train × broadcast benchmark-sized test side — the gate's
      // declared exhaustive twin (scale path is semantic_decontam)
      "semantic_decontam_exact" -> "declared exact baseline",
      // the curve's truth denominator is the same declared O(n²)
      // exact arm (run once; every knob arm itself is bucket-banded)
      "lsh_occupancy_curve" -> "exact-twin truth denominator",
      // 3-row knob literals × 3-row band rollup grid (both bounded)
      "semantic_decontam_tables" -> "knobs x bands literal grid",
      // query batch × centroid/hyperplane tables: broadcast side is
      // nlist/tables-sized by construction
      "ann_cosine_topk" -> "corpus x broadcast query batch",
      "ann_ivf_topk" -> "centroid table is nlist rows",
      "ann_ivf_probe1" -> "centroid table is nlist rows",
      "ann_pq_topk" -> "codebook/query tables are codebook-sized",
      // sampled-PQ arm + exact-baseline BNLJ (query batch broadcast)
      // + the 1-row recall total crossJoin
      "ann_pq_recall" -> "codebook tables, query batch, 1-row total",
      "ann_ivfpq_topk" -> "coarse/pq codebooks are sample-sized",
      "ann_ivfpq_probe1" -> "coarse/pq codebooks are sample-sized",
      // residual arm: corpus x broadcast nlist-row coarse table +
      // broadcast ADC table (queries x codebook-sized); the recall
      // row adds the exact-baseline BNLJ (query batch broadcast) and
      // the 1-row total crossJoin
      "ann_ivfpq_residual" -> "coarse table nlist rows, ADC broadcast",
      "ann_ivfpq_recall" -> "bounded codebooks, query batch, 1-row total",
      "ann_ivfpq_rerank" -> "shortlist + query batch broadcasts",
      // knob curves: corpus x broadcast nlist-row centroid table (the
      // ivf routing join), the brute-force truth arm's query-batch
      // broadcast, and the 1-row recall denominator crossJoin
      "ann_recall_curve" -> "nlist centroids, query batch, 1-row total",
      "ann_rerank_curve" -> "shortlist + query batch, 1-row total",
      "ann_lsh_topk" -> "query batch broadcast",
      // SQ8: corpus scan x broadcast query batch (+ the exact
      // baseline and 1-row recall total in the recall row)
      "ann_sq8_topk" -> "corpus x broadcast query batch",
      "ann_sq8_recall" -> "query batch broadcast, 1-row total",
      // coarse routing: corpus x broadcast nlist-row centroid table
      "ann_ivfsq8_topk" -> "centroid table is nlist rows",
      "ann_ivfsq8_probe1" -> "centroid table is nlist rows",
      "ann_index_roundtrip" -> "centroid table is nlist rows",
      // label-inequality join against the broadcast query batch
      "hard_negatives" -> "corpus x broadcast query batch",
      // scalar-subquery pattern: the broadcast side is ONE row (the
      // global positive-balance average)
      "q22_dormant_accounts" -> "1-row scalar average broadcast",
      // centroid pair join: BOTH sides are the labels-sized centroid
      // table (catalog-sized), inequality-joined on label1 < label2
      "centroid_similarity" -> "labels x labels centroid tables",
      // the global rollup level: 1-row merged sketch x 1-row exact twin
      "hll_rollup_events" -> "1-row global sketch x 1-row exact",
      // 1-row percentile-threshold broadcast against the scored corpus
      "keep_top_quantile" -> "1-row threshold broadcast",
      // 1-row reference-day + 1-row quintile-cuts broadcasts
      "rfm_users" -> "1-row ref-day and cuts broadcasts",
      // 2-value (total, n_keys) broadcast against per-key counts
      "skew_report" -> "1-row totals broadcast",
      // 1-row corpus bucket-range broadcast against distinct groups
      "resample_events" -> "1-row bucket-range broadcast",
      // HAVING-vs-global-scalar probe: the broadcast side is ONE row
      // (the corpus-wide revenue total)
      "q11_important_parts" -> "1-row global total broadcast",
      // 1-row target-gram total against the bucket-sized profile
      "dsir_affinity" -> "1-row gram-total broadcast",
      "dsir_select" -> "1-row gram-total broadcast (via dsirScores)",
      // merged bin table (groups × ≤256 bins) × the 4-row q literal
      "quantile_rollup_lineitem" -> "bins-sized x quantile literals",
      // brute-force candidate source: corpus x broadcast query batch
      // (the documented exact baseline; IVF routing is the scale path)
      "knn_label_vote" -> "corpus x broadcast query batch",
      // 1-row corpus token total against the per-source aggregate
      "mixture_weights" -> "1-row total broadcast",
      "mixture_apply" -> "1-row total broadcast (via mixtureWeights)",
      // 1-row (token, micro-sqrt) totals against per-source rows
      "tempered_shares" -> "1-row totals broadcast",
      // merged slice bins (groups × ≤bins rows) × the 3-row q literal
      "quantile_stream_rollup" -> "bins-sized x quantile literals",
      // verifyHitters: 1-row exact token total against the ≤cap
      // candidate counts
      "hot_terms_stream" -> "1-row total broadcast",
      // two 1-row side totals against the bins-sized CDF join
      "ks_sample_audit" -> "1-row side-total broadcasts",
      "ks_stream_audit" -> "1-row side-total broadcasts",
      // four 1-row total broadcasts against the 1-row forecast agg
      "join_size_forecast" -> "1-row total broadcasts"
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val bad =
          try fn(spark, dir).queryExecution.sparkPlan.collect {
            case j: CartesianProductExec => j
            case j: BroadcastNestedLoopJoinExec => j
          }
          catch { case _: Throwable => Nil }
        if (bad.nonEmpty) Some(name) else None
      }
    val unexpected = offenders.filterNot(allow.contains)
    assert(unexpected.isEmpty, s"unbounded joins in: $unexpected")
  }
}
