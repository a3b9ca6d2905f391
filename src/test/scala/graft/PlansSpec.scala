package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape guards for the 100 TB invariants: broadcast HINTS may
  * only pin FIXED-cardinality dims (nation/region). Data-proportional
  * tables (customer, orders, lineitem, supplier) must be left to
  * stats/AQE — an explicit hint is honored regardless of size and
  * OOMs at scale instead of degrading to a shuffle join.
  */
class PlansSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Leaf descriptions of every broadcast-hinted subtree. */
  private def hintedLeaves(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }.flatMap(_.collectLeaves()).map(_.toString)

  test("the only broadcast hints anywhere are fixed-size nation/region") {
    val audited = Seq(
      "dim_customer", "dim_order", "fact_lineitem",
      "q3_shipping_priority", "q5_regional_revenue", "rollup_revenue",
      "q4_returned_priority", "q22_no_orders", "top_orders_per_cust",
      "scd2_merge", "stg_soft_delete", "schema_evolution", "flatten_props",
      "q18_large_orders", "events_rolling", "asof_last_view",
      "asof_next_error", "range_join_sessions", "q13_custdist",
      "cdc_snapshot_diff", "events_pivot", "curation_pipeline",
      "scd2_asof", "sample_split", "corpus_top_terms")
    // a relation leaf prints its columns — n_/r_ prefixes identify the
    // fixed-size geography dims
    audited.foreach { name =>
      hintedLeaves(SparkEntry.queries(name)(spark, dir)).foreach { leaf =>
        assert(leaf.contains("n_nationkey") || leaf.contains("r_regionkey"),
          s"$name force-broadcasts a data-proportional table: $leaf")
      }
    }
  }

  test("hint detection is not vacuous: dimCustomer does hint nation and region") {
    val leaves = hintedLeaves(pipeline.Models.dimCustomer(spark, dir))
    assert(leaves.exists(_.contains("n_name")))
    assert(leaves.exists(_.contains("r_regionkey")))
  }

  test("no graded query plans a cartesian or unintended nested-loop join") {
    // justified nested-loop plans, each a bounded side by construction:
    // the DECLARED exhaustive oracle baseline (dedup_embedding), ANN
    // rankers broadcasting a tiny query set / nlist centroids, and the
    // fixed-cardinality band table's non-equi broadcast. Every other
    // query must stay equi-join shaped at every SF — a cartesian that
    // sneaks into a refactor is the #1 silent 100 TB killer.
    // corpus_top_terms_approx attaches its certified-error scalar (a
    // ONE-row agg-without-grouping frame) to the top-k via broadcast —
    // the one legitimate nested-loop shape left: a scalar join
    // ann_sq8/ann_pq: the quantized-candidate pass is the same
    // broadcast-queries-over-corpus stream as ann_brute (codes stream
    // instead of vectors); the rerank joins are equi-joins
    // corpus_bm25_topk broadcasts its ONE-row corpus-stats frame
    // (avgdl, N, dfs) the same way — a scalar join, not a pair space
    // q11/q15 attach a ONE-row global aggregate (total revenue / max
    // revenue) to a grouped frame the same way — scalar joins whose
    // broadcast side is 1 row by construction at any SF
    // ann_ivf_incr_topk: the incremental-index twin ranks the same
    // tiny query set over the same nlist-bounded broadcast centroids
    // ann_knn_label rides ann_brute_topk's broadcast-queries stream
    val nestedLoopOk = Set("dedup_embedding", "ann_brute_topk", "ann_ivf_topk",
      "ann_ivf_incr_topk", "ann_knn_label",
      // the IVF-ranked labeling twin ranks the same tiny unlabeled
      // batch over the same nlist-bounded broadcast centroids
      "ann_knn_label_ivf",
      // hard-negative mining rides ann_brute's broadcast-queries
      // stream (the exact oracle; swap in the IVF cells at scale)
      "ann_hard_negatives",
      "ann_lsh_topk", "ann_sq8_topk", "ann_pq_topk", "band_join_price",
      // the bm25 scoring tail joins a 1-row corpus-stats frame on a
      // constant key — shared by the full-scan and maintained forms
      "corpus_top_terms_approx", "corpus_bm25_topk", "corpus_bm25_incr",
      // the MG presence gate attaches the ONE-row corpus word total
      // to the exact counts the same way (scalar join; the heavy
      // filter rides the join condition) — 1 row at any SF
      "corpus_top_terms_guarantee",
      // RRF runs both rankers, inheriting bm25's and tfidf's 1-row
      // corpus-stats scalar joins
      "search_rrf_fusion",
      // search_ndcg evaluates ON corpus_bm25_topk's ranking, so it
      // inherits the same 1-row corpus-stats scalar join
      "search_ndcg",
      // search_map_mrr evaluates the same ranking — the identical
      // inherited scalar join (its OWN metrics ride a tagged union,
      // not a join)
      "search_map_mrr",
      "q11_important_parts", "q15_top_supplier",
      // events_growth_accounting attaches its 1-row max-week frame to
      // the user-week walk the same way (churn caps at the last week)
      "events_growth_accounting",
      // bloom_reduced_join broadcasts a ONE-row bloom sketch of the
      // filtered dim keys — the same scalar-join shape
      "bloom_reduced_join",
      // dq_chi2's full R×C grid IS a cross of the two category-sized
      // marginal frames (zero-observation cells must exist to
      // contribute their expectation) — both sides bounded by the
      // column cardinalities, never by data size
      "dq_chi2",
      // dq_woe_iv attaches its 1-row totals and 1-row IV sum to the
      // category-sized frame — the q11/q15 scalar-join shape
      "dq_woe_iv",
      // survival_logrank crosses the distinct-duration axis with a
      // 2-row group frame (the zero-filled risk grid — bounded by the
      // duration range) and attaches its 1-row term aggregate
      "survival_logrank",
      // dq_t_closeness attaches its 1-row global-N frame to the
      // observed cells — the q11/q15 scalar-join shape
      "dq_t_closeness",
      // graph_hits joins each phase's 1-row integer-max normalizer
      // to the node frame — the same scalar-join shape, per round
      "graph_hits",
      // fact_balance_snapshots attaches the 1-row global-max-month
      // frame to the per-account grid — the q11/q15 scalar shape
      "fact_balance_snapshots",
      // rollup_share attaches the 1-row global-total frame to the
      // leaf rows — the q11/q15 scalar shape
      "rollup_share",
      // ab_bootstrap attaches its 1-row point-estimate frame and the
      // two 1-row percentile-bound frames — scalar joins, B-bounded
      "ab_bootstrap",
      // demand_croston attaches the 1-row global month-bounds frame
      // to the part list (the fact_balance_snapshots shape)
      "demand_croston",
      // corpus_tfidf_topk attaches the 1-row N frame and the 1-row
      // query-norm frame — the corpus_bm25_topk scalar shape; the
      // maintained-index twin shares the identical scoring tail
      "corpus_tfidf_topk", "corpus_tfidf_incr",
      // rfmBucketed attaches the 1-row corpus-max-date frame to the
      // customer frame (replacing rfm's unpartitioned window) — the
      // q11/q15 scalar-join shape
      "customer_rfm_bucketed",
      // sourceDivergence attaches the 1-row corpus-total frame to the
      // (source, term) stream — the q11/q15 scalar-join shape
      "corpus_source_divergence",
      // cohensKappa attaches the 1-row Σ r·c marginal-product frame
      // to the 1-row (n, diag) frame — two bounded scalars
      "dq_cohens_kappa",
      // the recall scorecard runs BOTH rankers, inheriting
      // ann_brute's broadcast-queries stream (the declared exhaustive
      // truth side) and ann_ivf's broadcast-centroid assignment
      "ann_recall_eval",
      // domain stats attach the 1-row grand-total frame to the
      // domain-grain rollup — the q11/q15 scalar-join shape
      "corpus_domain_stats",
      // the blocking scorecard composes THREE 1-row aggregate frames
      // (record count, comparison count, truth counts) — pure scalar
      // joins; the truth pass itself is a banded equi-join
      "er_blocking_eval",
      // the cardinality estimator composes FIVE bounded aggregate
      // frames (1-row totals/distincts/product-sum) — pure scalar
      // joins; the histogram join itself is an equi-join on the key
      // (the incremental fold shares the identical scoring tail)
      "dq_join_cardinality", "dq_join_cardinality_incr",
      // modularity attaches the 1-row total-edges frame to the
      // per-community counts — the q11/q15 scalar-join shape
      "graph_modularity",
      // the CCF crosses the bounded (maxLag+1)-row lag table into
      // the bounded hourly series before the hour-index equi-join
      "events_xcorr")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (!nestedLoopOk(name)) {
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
      }
    }
  }

  test("unpartitioned windows appear only in the pinned justified set") {
    // The #2 silent 100 TB killer after cartesians: a Window with no
    // PARTITION BY plans a single-partition exchange — fatal when its
    // input is corpus-sized. Three shapes are legitimate and pinned
    // here; ANY key newly planning a global window must be added with
    // a justification, so the shape can't sneak in via a refactor:
    //  (a) k-bounded ranking (rank <= k filter): Spark 3.5+ compiles
    //      it to a two-phase WindowGroupLimit (map-side partial
    //      top-k), so only ~k rows per partition reach the single
    //      reducer — the top-k retrieval/scoring keys;
    //  (b) bounded-rollup input: the window runs over a frame whose
    //      row count is bounded by construction (stat grids, band
    //      rollups, B bootstrap replicates, shard/bucket boundary
    //      frames), not by data size;
    //  (c) declared oracle-baseline forms whose SCALE twin is a
    //      separate graded key (customer_rfm -> customer_rfm_bucketed,
    //      quality_quantile_norm -> _approx).
    val globalWindowOk = Set(
      // (a) k-bounded ranking -> WindowGroupLimit
      "basket_cosine", "corpus_bm25_topk", "corpus_bm25_incr",
      "corpus_tfidf_topk", "corpus_tfidf_incr", "corpus_collocations",
      "doc_surprisal", "graph_adamic_adar", "graph_link_predict",
      "search_map_mrr", "search_ndcg", "search_rrf_fusion",
      "skyline_frontier",
      // (b) bounded-rollup input
      "ab_bootstrap", "dq_bh_fdr", "dq_drift_js", "dq_drift_psi",
      "dq_key_skew", "dq_volume_anomaly", "corpus_zipf",
      "corpus_interleave", "corpus_select_budget", "dedup_threshold_sweep",
      "feature_target_encoding", "graph_hits", "inventory_safety_stock",
      "sample_balanced", "sample_temperature", "sample_temperature_hash",
      "sample_weighted_n", "sample_weighted_n_incr", "select_dsir",
      "sessions_concurrency",
      // (c) oracle-baseline form; the scale twin is its own key
      "customer_rfm", "quality_quantile_norm")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val gw = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      if (!globalWindowOk(name))
        assert(gw.isEmpty,
          s"$name plans an unpartitioned Window — justify it in globalWindowOk")
      else
        assert(gw.nonEmpty,
          s"$name no longer plans an unpartitioned Window — prune it from globalWindowOk")
    }
  }

  test("band_join_price broadcasts ONLY the fixed-cardinality band table") {
    hintedLeaves(SparkEntry.queries("band_join_price")(spark, dir)).foreach { leaf =>
      // the band table is a driver-local literal relation (its toDF
      // renames sit above the leaf) — tiny by construction; any
      // parquet relation leaf here would be a data-sized broadcast
      assert(leaf.contains("price_tier") || leaf.startsWith("LocalRelation"),
        s"band_join_price hints a non-band table: $leaf")
    }
  }

  test("the graded declarative containment join runs through RangeJoinRewrite") {
    val df = SparkEntry.queries("range_join_rewrite")(spark, dir)
    assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
      "RangeJoinRewrite did not fire on the graded BETWEEN join")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // not vacuous: with the rule disabled the same query nested-loops
    spark.conf.set(plans.RangeJoinRewrite.BucketSecondsConf, "0")
    try {
      val off = SparkEntry.queries("range_join_rewrite")(spark, dir)
      assert(off.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(plans.RangeJoinRewrite.BucketSecondsConf)
  }

  test("incremental cutoff is pushed to the events parquet scan") {
    val df = SparkEntry.queries("cdc_incremental_filter")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(ts"),
      "cutoff predicate did not reach the parquet scan")
  }

  test("oracle keys match queries; rows-only grading is the documented set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // a typo'd oracle key silently grades NOTHING — it must name a query
    assert((o -- q).isEmpty, s"dangling oracle keys: ${(o -- q).mkString(", ")}")
    // and a query LOSING its oracle silently downgrades to rows-only —
    // pin the exact documented rows-only set (hash arithmetic that is
    // not SQL-portable, each pinned in ScalaTest instead)
    // r12 (verdict ask #4): the five xxhash64 originals with
    // hash-green md5 twins grading identical arithmetic
    // (dedup_minhash, dedup_simhash, doc_fingerprint, doc_winnow,
    // doc_shared_runs) are RETIRED from grading — operators + specs
    // stay; only the redundant graded keys went
    val documentedRowsOnly = Set(
      "corpus_top_terms_approx", "doc_pack",
      // the learned merge table is not SQL-stateable, so per-doc BPE
      // token counts can't replay in DuckDB; BpeSpec pins encode
      // semantics and doc_pack_serial hash-grades the pack algorithm
      "corpus_bpe_encode", "doc_pack_bpe",
      "dq_numeric_profile_approx", "dq_profile_approx",
      // HLL sketch bytes are register-layout-dependent; the fold vs
      // recompute equivalence is pinned in IncrementalAggSpec
      "mv_incremental_distinct_hll",
      // iterative argmax-merge loop is not SQL-expressible; BpeSpec
      // pins the merge table on a hand-computed corpus
      "corpus_bpe",
      // L-BFGS coefficients reproduce only to float-sum order;
      // QualityModelSpec pins teacher agreement + separation
      "doc_quality_model",
      // GK-sketch quantiles are not SQL-portable; QualitySpec pins
      // exact-vs-approx agreement (endpoints, monotonicity, bounded
      // rank distance) against quantileNormalize
      "quality_quantile_norm_approx",
      // HLL estimates are engine-specific; R13Wave2Spec pins rsd
      // agreement with exact + the never-false-negative verdict
      "dq_candidate_keys_approx")
    assert((q -- o) === documentedRowsOnly,
      s"rows-only drift: ${((q -- o) -- documentedRowsOnly).mkString(", ")} lost oracles; " +
        s"${(documentedRowsOnly -- (q -- o)).mkString(", ")} unexpectedly gained one (update the set)")
  }

  test("r8 sampler scale paths keep their plan shape") {
    import spark.implicits._
    import graft.operators.Sampling
    // through parquet: a LocalRelation input lets the optimizer fold
    // filters into the scan and the shapes under test disappear
    val pq = tmpDir("plans-sampler")
    (1L to 5000L)
      .map(i => (i, s"g${i % 3}", ((i * 37) % 100) / 100.0, (i % 50) + 1))
      .toDF("id", "grp", "score", "tok").write.mode("overwrite").parquet(pq)
    val df = spark.read.parquet(pq)
    // stratifiedTopN: the sampled ids come back onto the corpus via a
    // BROADCAST join — a sort-merge join here would shuffle the corpus
    // to fetch a bounded sample
    val p1 = Sampling.stratifiedTopN(df, "id", "grp", n = 20)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"),
      "stratifiedTopN join-back is not broadcast")
    assert(!p1.contains("SortMergeJoin"),
      "stratifiedTopN shuffles the corpus for the join-back")
    // selectBudget: the single global-order window must be gated by
    // the boundary-bucket equality, and the full-accept branch is a
    // pure scan filter — the projection collapses __b to
    // FLOOR(score·10^scale) pushed onto the scan, so assert on that
    val p2 = Sampling.selectBudget(df, "id", "tok", "score", budget = 60000L)
      .queryExecution.executedPlan.toString
    assert(p2.contains("Window"), "selectBudget boundary window missing")
    assert("FLOOR\\([^\n]*\\) = \\d+".r.findFirstIn(p2).isDefined,
      "selectBudget's window is not gated by the boundary-bucket filter")
    assert("FLOOR\\([^\n]*\\) > \\d+".r.findFirstIn(p2).isDefined,
      "selectBudget's full-accept branch lost its scan-level bucket filter")
    // topFracPerGroup: bucket metadata joins broadcast, and the rank
    // window's input is the (__b = __bb, group) equi-join — boundary
    // rows only, never whole groups
    val p3 = Sampling.topFracPerGroup(df, "id", "grp", "score", frac = 0.3)
      .queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"),
      "topFracPerGroup bucket-threshold joins are not broadcast")
    assert(!p3.contains("SortMergeJoin"),
      "topFracPerGroup shuffles the corpus against bucket metadata")
    assert(p3.contains("__bb#"),
      "topFracPerGroup's rank window is not gated to the boundary bucket")
  }
}
