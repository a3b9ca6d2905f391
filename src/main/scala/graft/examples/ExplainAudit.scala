package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries so the
  * scale properties are auditable: parquet `PushedFilters` /
  * `ReadSchema` pruning, broadcast vs shuffle joins, and
  * whole-stage-codegen spans.
  *
  * Run: `sbt "runMain graft.examples.ExplainAudit [queryName ...]"`
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
        "fact_lineitem", "cdc_incremental_filter", "events_sessions", "dedup_minhash_md5",
        "asof_last_view", "range_join_sessions", "dedup_embedding_lsh",
        "curation_pipeline", "dedup_ngram_jaccard", "doc_tfidf",
        "doc_shared_runs_md5", "sample_temperature", "doc_pii_redact",
        "events_funnel", "events_retention", "doc_chunk",
        "doc_bigram_surprisal", "dedup_minhash_incr_md5",
        "corpus_top_terms_approx", "events_funnel_windowed",
        "dedup_ngram_jaccard_incr", "dedup_minhash_vg_md5",
        "pipeline_day_replay",
        // r8-cont additions: sampler scale paths, salted join, Q10
        "sample_stratified_n", "corpus_select_budget",
        "doc_quality_top_frac", "skew_salted_join", "q10_returned_revenue",
        // r8-cont wave 2: edit distance, Q21 agg rewrite, SQ8/PQ ANN,
        // data-skipping read, PPS sampler
        "dedup_edit_distance", "dedup_edit_distance_incr",
        "q21_waiting_supplier", "ann_sq8_topk", "ann_pq_topk",
        "clustered_prune_read", "sample_weighted_n",
        "sample_weighted_n_stratum", "dedup_edit_clusters",
        "doc_substring_search", "doc_multi_search",
        // r12 wave: the forecast fold's grid join, the fixed-point
        // retrieval tail, the Poisson-bootstrap grid, k-means's
        // zero-join assignment path
        "demand_croston", "corpus_tfidf_topk", "ab_bootstrap",
        "customer_kmeans", "dq_anomaly_esd", "dedup_eval")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
