package graft

import graft.operators._
import graft.pipeline.{Analytics, Dag, DayReplay, IncrementalModel, Models, Schedule}
import graft.sources.SchemaEvolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query here has a matching DuckDB oracle in [[oracleSql]]
  * unless its arithmetic isn't portable (hash-based ops), in which
  * case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Composed from the registry shards (r11 verdict ask #8: the
    * 11k-line single-file registry was a bad-merge hazard). Shards
    * hold the entries verbatim in wave order; RegistrySpec asserts
    * shard-key disjointness (a ++ collision would silently shadow)
    * and that every oracle grades an existing query. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesShard1.m ++ QueriesShard2.m ++ QueriesShard3.m ++
      QueriesShard4.m ++ QueriesShard5.m ++ QueriesShard6.m ++
      QueriesShard7.m ++ QueriesShard8.m

  def oracleSql: Map[String, String] = {
    val base =
      OraclesShard1.m ++
      OraclesShard2.m ++
      OraclesShard3.m ++
      OraclesShard4.m ++
      OraclesShard5.m ++
      OraclesShard6.m ++
      OraclesShard7.m ++
      OraclesShard8.m ++
      OraclesShard9.m
    // the incremental CC twin is PROVABLY the same labeling as the
    // full replay (star-edge folding, DedupSpec), so it shares the
    // recursive-reachability oracle verbatim
    base + ("dedup_components_incr" -> base("dedup_components")) +
      // the streaming attributor must converge to the batch
      // attribution — same oracle verbatim
      ("stream_attribution" -> base("events_attribution")) +
      // the streaming versioned MV must converge to the full batch
      // recompute — the mv_incremental oracle verbatim
      ("stream_mv_versioned" -> base("mv_incremental")) +
      // the streaming CUSUM must equal the batch recurrence
      // bit-for-bit — the recursive-CTE oracle verbatim
      ("stream_cusum" -> base("events_cusum")) +
      // same contract for the streaming Holt smoother
      ("stream_holt_winters" -> base("events_holt_winters")) +
      // the streaming Croston twin must equal the batch fold
      // bit-for-bit — demand_croston's recursive-CTE oracle verbatim
      ("stream_croston" -> base("demand_croston")) +
      // the streaming SPRT emits ONLY decision rows (a still-running
      // variant has no final row yet) — the batch oracle restricted
      // to crossed variants
      ("stream_sprt" ->
        s"""SELECT * FROM (${base("ab_sprt")})
            WHERE decision <> 'continue' ORDER BY variant""") +
      // the maintained tf-idf index must answer exactly like the full
      // re-scan — the structural equality the index-frame union makes
      ("corpus_tfidf_incr" -> base("corpus_tfidf_topk")) +
      // the percentile-bucket RFM is row-identical to the window-ntile
      // form by the exact-ntile construction — same oracle verbatim
      ("customer_rfm_bucketed" -> base("customer_rfm")) +
      // the keep-best fold is provably ≡ the full keep-best (see the
      // registry entry) — same oracle verbatim
      ("dedup_keep_best_incr" -> base("dedup_keep_best")) +
      // the FT-checkpoint variant must produce the IDENTICAL labeling
      // (checkpoint() vs localCheckpoint() changes fault tolerance,
      // never data) — the recursive-reachability oracle verbatim
      ("dedup_components_reliable" -> base("dedup_components")) +
      // the stateful streaming sessionizer must converge to the batch
      // gap-islands computation — events_sessions' oracle verbatim
      ("stream_sessions_stateful" -> base("events_sessions")) +
      // exactly-once file ingest = the raw events table, same
      // contract (and oracle) as the dedup door
      ("stream_file_ingest" -> base("stream_dedup")) +
      // the folded histogram is provably the full corpus's histogram
      // (additivity), so the incremental estimator shares the full
      // recompute's oracle verbatim
      ("dq_join_cardinality_incr" -> base("dq_join_cardinality")) +
      // modularity composes the unrolled label-propagation oracle (as
      // a CTE) with the Newman–Girvan per-community counts + one
      // fixed contribution tree over the same deduped edge set
      ("graph_modularity" ->
        s"""WITH lab AS (${base("graph_communities")}),
              li AS (
                SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
                WHERE l_partkey % 4 = 0
              ), e AS (
                SELECT DISTINCT x.pk AS a, y.pk AS b
                FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
              ), mm AS (SELECT count(*) AS m FROM e
              ), el AS (
                SELECT la.label AS la, lb.label AS lb
                FROM e JOIN lab la ON la.node = e.a
                  JOIN lab lb ON lb.node = e.b
              ), nn AS (
                SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
                FROM lab GROUP BY 1
              ), ds AS (
                SELECT label, CAST(count(*) AS BIGINT) AS degree_sum
                FROM (SELECT la AS label FROM el
                      UNION ALL SELECT lb AS label FROM el)
                GROUP BY 1
              ), ie AS (
                SELECT la AS label, CAST(count(*) AS BIGINT)
                  AS internal_edges
                FROM el WHERE la = lb GROUP BY 1)
            SELECT nn.label, nn.n_nodes,
              coalesce(ie.internal_edges, 0) AS internal_edges,
              coalesce(ds.degree_sum, 0) AS degree_sum,
              round(CAST(coalesce(ie.internal_edges, 0) AS DOUBLE)
                  / CAST(m AS DOUBLE)
                - (CAST(coalesce(ds.degree_sum, 0) AS DOUBLE)
                    / (2.0 * CAST(m AS DOUBLE)))
                  * (CAST(coalesce(ds.degree_sum, 0) AS DOUBLE)
                    / (2.0 * CAST(m AS DOUBLE))), 6) AS contribution
            FROM nn LEFT JOIN ds USING (label)
              LEFT JOIN ie USING (label), mm
            ORDER BY label""") +
      // the cluster-size histogram is a pure rollup of the components
      // labeling — the recursive oracle as a CTE, grouped twice
      ("dedup_cluster_histogram" ->
        s"""WITH lab AS (${base("dedup_components")}),
              sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
                     FROM lab GROUP BY comp)
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
            FROM sz GROUP BY cluster_size ORDER BY cluster_size""") +
      // the incremental source-matrix fold is a distinct-union of the
      // stored and batch fingerprint sets — provably the full
      // recompute's input, so the full-matrix oracle verbatim
      ("dedup_source_matrix_incr" -> base("dedup_source_matrix")) +
      // token savings compose the components labeling (its recursive
      // oracle as a CTE) with the BPE-proxy token counts
      ("dedup_savings" ->
        s"""WITH lab AS (${base("dedup_components")}),
              tok AS (
                SELECT doc_id, source,
                  CAST(coalesce(list_sum(list_transform(
                      regexp_extract_all(text, '[A-Za-z0-9]+'),
                      w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
                    + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                    AS BIGINT) AS nt
                FROM documents),
              l2 AS (
                SELECT t.doc_id, t.source, t.nt,
                  coalesce(l.comp, t.doc_id) AS comp
                FROM tok t LEFT JOIN lab l ON l.id = t.doc_id),
              keep AS (SELECT comp, min(doc_id) AS keep_id
                       FROM l2 GROUP BY comp)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
              CAST(sum(nt) AS BIGINT) AS tokens_total,
              CAST(sum(CASE WHEN doc_id = keep_id THEN nt ELSE 0 END)
                AS BIGINT) AS tokens_kept
            FROM l2 JOIN keep USING (comp)
            GROUP BY source ORDER BY source""") +
      // the recall scorecard composes the two graded ANN oracles —
      // brute is truth, IVF is the probe, recall an integer ratio
      ("ann_recall_eval" ->
        s"""WITH b AS (${base("ann_brute_topk")}),
              i AS (${base("ann_ivf_topk")})
            SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
              CAST(count(i.neighbor_id) AS BIGINT) AS n_matched,
              round(CAST(count(i.neighbor_id) AS DOUBLE)
                / CAST(count(*) AS DOUBLE), 6) AS recall
            FROM b LEFT JOIN i
              ON b.query_id = i.query_id
              AND b.neighbor_id = i.neighbor_id
            GROUP BY b.query_id ORDER BY b.query_id""") +
      // RRF fuses the two graded rankers — their oracles verbatim as
      // CTEs, then the same exact-integer 1e6-scaled fusion terms
      ("search_rrf_fusion" ->
        s"""WITH b AS (${base("corpus_bm25_topk")}),
              t AS (${base("corpus_tfidf_topk")}),
              f AS (SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
                CAST(coalesce(1000000 // (60 + b.rank), 0)
                  + coalesce(1000000 // (60 + t.rank), 0) AS BIGINT)
                  AS rrf6
                FROM b FULL OUTER JOIN t ON b.doc_id = t.doc_id)
            SELECT CAST(row_number() OVER (ORDER BY rrf6 DESC, doc_id)
              AS BIGINT) AS rank, doc_id, rrf6
            FROM f ORDER BY rank""") +
      // the packing scorecard is a pure rollup of the serial FFD
      // replay — the recursive CTE as a subquery, grouped per bin
      ("doc_pack_stats" ->
        s"""WITH p AS (${base("doc_pack_serial")})
            SELECT bin_id, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS token_sum,
              CAST(2048 - sum(least(n_tokens, 2048)) AS BIGINT) AS waste
            FROM p GROUP BY bin_id ORDER BY bin_id""") +
      // the pair-set scorecard replays BOTH graded pipelines it
      // evaluates — their oracles verbatim as CTE bodies, then the
      // same confusion counts and P/R/F1 trees the operator runs
      ("dedup_eval" ->
        s"""WITH pred AS (${base("dedup_minhash_md5")}),
              truth AS (${base("dedup_ngram_jaccard")}),
              p AS (SELECT DISTINCT least(id_a, id_b) AS a,
                      greatest(id_a, id_b) AS b FROM pred),
              t AS (SELECT DISTINCT least(id_a, id_b) AS a,
                      greatest(id_a, id_b) AS b FROM truth),
              j AS (
                SELECT
                  sum(CASE WHEN p.a IS NOT NULL AND t.a IS NOT NULL
                    THEN 1 ELSE 0 END) AS tp,
                  sum(CASE WHEN p.a IS NOT NULL AND t.a IS NULL
                    THEN 1 ELSE 0 END) AS fp,
                  sum(CASE WHEN p.a IS NULL AND t.a IS NOT NULL
                    THEN 1 ELSE 0 END) AS fn
                FROM p FULL OUTER JOIN t ON p.a = t.a AND p.b = t.b)
            SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
              CAST(fn AS BIGINT) AS fn,
              round(CASE WHEN tp + fp > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6)
                AS precision,
              round(CASE WHEN tp + fn > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6)
                AS recall,
              round(CASE WHEN 2 * tp + fp + fn > 0 THEN
                CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
                END, 6) AS f1
            FROM j""")
  }
}
