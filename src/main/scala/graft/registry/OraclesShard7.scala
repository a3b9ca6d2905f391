package graft

import graft.OracleFragments._

/** Oracle-registry shard 7 — the r12 wave split out of OraclesShard6
  * to hold the RegistrySpec shard-size ceiling (r12 verdict ask #10).
  * DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]] composes the shards. */
private[graft] object OraclesShard7 {
  val m: Map[String, String] = Map(
    // ---- r12 wave ----
    // Croston/SBA replayed row-by-row on the zero-filled month grid:
    // the recursion carries (z, p, q, seeded); every step is the
    // identical IEEE halving the fold runs, outputs unrounded
    "demand_croston" ->
      """WITH RECURSIVE dem AS (
           SELECT l_partkey AS part,
             (year(CAST(l_shipdate AS TIMESTAMP)) - 1970) * 12
               + month(CAST(l_shipdate AS TIMESTAMP)) - 1 AS m,
             sum(CAST(l_quantity AS BIGINT)) AS qty
           FROM lineitem WHERE l_partkey % 40 = 0 GROUP BY 1, 2
         ), b AS (SELECT min(m) AS lo, max(m) AS hi FROM dem),
         g AS (
           SELECT part, unnest(generate_series(lo, hi)) AS m
           FROM (SELECT DISTINCT part FROM dem), b
         ), e AS (
           SELECT g.part, g.m, COALESCE(dem.qty, 0) AS qty,
             row_number() OVER (PARTITION BY g.part ORDER BY g.m) AS rn
           FROM g LEFT JOIN dem ON dem.part = g.part AND dem.m = g.m
         ), r AS (
           SELECT part, m, qty, rn,
             CASE WHEN qty > 0 THEN CAST(qty AS DOUBLE) END AS z,
             CASE WHEN qty > 0 THEN CAST(1 AS DOUBLE) END AS p,
             CASE WHEN qty > 0 THEN 0 ELSE 1 END AS q,
             (qty > 0) AS seeded
           FROM e WHERE rn = 1
           UNION ALL
           SELECT e.part, e.m, e.qty, e.rn,
             CASE WHEN e.qty > 0 THEN
               CASE WHEN r.seeded
                 THEN 0.5 * CAST(e.qty AS DOUBLE) + 0.5 * r.z
                 ELSE CAST(e.qty AS DOUBLE) END
             ELSE r.z END AS z,
             CASE WHEN e.qty > 0 THEN
               CASE WHEN r.seeded
                 THEN 0.5 * CAST(r.q + 1 AS DOUBLE) + 0.5 * r.p
                 ELSE CAST(r.q + 1 AS DOUBLE) END
             ELSE r.p END AS p,
             CASE WHEN e.qty > 0 THEN 0 ELSE r.q + 1 END AS q,
             (r.seeded OR e.qty > 0) AS seeded
           FROM e JOIN r ON e.part = r.part AND e.rn = r.rn + 1)
         SELECT part,
           CAST(DATE '1970-01-01' + CAST(m AS INT) * INTERVAL 1 MONTH
             AS TIMESTAMP) AS month_start,
           CAST(qty AS DOUBLE) AS qty,
           z AS z_size, p AS p_interval,
           z / p AS croston, 0.75 * (z / p) AS sba
         FROM r ORDER BY part, month_start""",

    // the Poisson bootstrap replayed DRAWS-AND-ALL: md5-60 weights
    // against the SAME 2^60-scaled thresholds the operator embeds,
    // exact decimal Σw·v per replicate, percentile row_numbers —
    // every double is the identical IEEE tree
    "ab_bootstrap" -> {
      val w = graft.operators.Quality.PoissonThresholds60.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
      s"""WITH rows0 AS (
           SELECT CAST(user_id % 2 AS VARCHAR) AS g, event_id AS id,
             CAST(value AS DECIMAL(18,6)) AS v
           FROM events
         ), stats AS (
           SELECT g, count(*) AS n, sum(v) AS s FROM rows0 GROUP BY g
         ), hashed AS (
           SELECT g, b, v,
             CAST('0x' || substr(md5('bs:' || g || ':'
                 || CAST(b AS VARCHAR) || ':' || CAST(id AS VARCHAR)),
               1, 15) AS BIGINT) AS h
           FROM rows0
           CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS b) bb
         ), weighted AS (
           SELECT g, b, v, CAST($w AS BIGINT) AS w FROM hashed
         ), rep AS (
           SELECT g, b,
             CASE WHEN sum(w) > 0 THEN
               CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) END AS m
           FROM weighted GROUP BY 1, 2
         ), diffs AS (
           SELECT b, max(CASE WHEN g = '1' THEN m END)
             - max(CASE WHEN g = '0' THEN m END) AS diff
           FROM rep GROUP BY b
         ), ds AS (
           SELECT diff, row_number() OVER (ORDER BY diff, b) AS r
           FROM diffs WHERE diff IS NOT NULL
         ), pt AS (
           SELECT
             max(CASE WHEN g = '1' THEN n END) AS n_a,
             max(CASE WHEN g = '0' THEN n END) AS n_b,
             max(CASE WHEN g = '1'
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS mean_a,
             max(CASE WHEN g = '0'
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS mean_b
           FROM stats)
         SELECT n_a, n_b, mean_a, mean_b, mean_a - mean_b AS mean_diff,
           (SELECT diff FROM ds WHERE r = 5) AS ci_lo,
           (SELECT diff FROM ds WHERE r = 196) AS ci_hi,
           CAST(200 AS BIGINT) AS resamples
         FROM pt"""
    },

    // tf-idf cosine replay: 1e6 fixed-point weights, HUGEINT dot and
    // norms, one rounded double per doc, rank on (cosine desc, id)
    "corpus_tfidf_topk" ->
      """WITH words AS (
           SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS term
           FROM documents
         ), w1 AS (SELECT doc_id, term FROM words WHERE length(term) > 0),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM w1 GROUP BY 1, 2
         ), df AS (
           SELECT term, count(*) AS df
           FROM (SELECT DISTINCT doc_id, term FROM w1) GROUP BY term
         ), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         w AS (
           SELECT tf.doc_id, tf.term,
             CAST(round(CAST(tf.tf AS DOUBLE)
               * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
               * 1000000.0) AS BIGINT) AS w6
           FROM tf JOIN df USING (term), nd
         ), norm2 AS (
           SELECT doc_id, sum(CAST(w6 AS HUGEINT) * w6) AS norm2
           FROM w GROUP BY doc_id
         ), qw AS (
           SELECT df.term AS qterm,
             CAST(round(ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
               * 1000000.0) AS BIGINT) AS qw6
           FROM df, nd WHERE df.term IN ('spark', 'hash', 'join')
         ), qn AS (SELECT sum(CAST(qw6 AS HUGEINT) * qw6) AS qnorm2 FROM qw),
         dots AS (
           SELECT w.doc_id, sum(CAST(w.w6 AS HUGEINT) * q.qw6) AS dot
           FROM w JOIN qw q ON w.term = q.qterm GROUP BY w.doc_id
         ), scored AS (
           SELECT d.doc_id,
             round(CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(n.norm2 AS DOUBLE))
                  * sqrt(CAST(qn.qnorm2 AS DOUBLE))), 6) AS cosine
           FROM dots d JOIN norm2 n USING (doc_id), qn)
         SELECT CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
             AS INTEGER) AS rank,
           doc_id, cosine
         FROM scored ORDER BY cosine DESC, doc_id LIMIT 50""",

    // generalized ESD replay: 5 unrolled remove-and-re-estimate
    // rounds, HUGEINT deviations, the identical studentized tree
    "dq_anomaly_esd" -> esdRoundsSql(5),

    // k-means replay: 5 unrolled Lloyd rounds, exact-integer argmin
    // (tie → low cluster id = the operator's sequential whens),
    // centroids re-rounded to 1e6 fixed point each round, empty
    // clusters carrying the previous centroid via the left join
    "customer_kmeans" -> kmeansRoundsSql(5),

    // restore replay: the restored head IS v1's snapshot; v2 stays
    // intact underneath — both stated literally
    "versioned_restore" ->
      """WITH base AS (
           SELECT c_custkey AS customer_id, c_name AS customer_name,
                  c_acctbal AS account_balance, c_mktsegment AS market_segment
           FROM customer)
         SELECT 'restored' AS version_tag, customer_id, customer_name,
                account_balance, market_segment,
                TIMESTAMP '2026-01-01 00:00:00' AS updated_at
         FROM base WHERE customer_id % 2 = 0
         UNION ALL
         SELECT 'v2_intact', customer_id, customer_name,
                CASE WHEN customer_id % 4 = 0 THEN account_balance + 1000
                     ELSE account_balance END,
                market_segment,
                CASE WHEN customer_id % 4 = 0
                     THEN TIMESTAMP '2026-02-01 00:00:00'
                     ELSE TIMESTAMP '2026-01-01 00:00:00' END
         FROM base WHERE customer_id % 2 = 0
         UNION ALL
         SELECT 'v2_intact', customer_id, customer_name, account_balance,
                market_segment, TIMESTAMP '2026-02-01 00:00:00'
         FROM base WHERE customer_id % 2 = 1 AND customer_id % 3 = 0
         ORDER BY version_tag, customer_id""",

    // stratified-fraction replay: the xxHash64 chain, pmod bucket,
    // per-stratum round(f*1e6) thresholds. Thresholds attach via a
    // JOIN, not a CASE: a bare filter over the 22-layer hash nest
    // sends DuckDB's filter-pushdown into an expression-substitution
    // blowup (measured: >100 s vs 0.4 s with the join — the same
    // reason sample_temperature_hash joins its threshold frame)
    "sample_stratified_frac" ->
      s"""WITH hx AS (${xxhash64LongSql(
             """SELECT doc_id, 's' || CAST(doc_id % 3 AS VARCHAR) AS stratum
                FROM documents""",
             "doc_id", 42L, keep = Seq("stratum"))}),
         p(stratum, thresh) AS (VALUES
           ('s0', 500000), ('s1', 200000), ('s2', 800000))
         SELECT doc_id, stratum FROM hx JOIN p USING (stratum)
         WHERE ((h % 1000000) + 1000000) % 1000000 < thresh
         ORDER BY doc_id""",

    // Mann-Kendall replay: intra-key pair self-join for S, tie-group
    // aggregate for the x18 variance numerator, one z tree
    "events_mann_kendall" ->
      """WITH w AS (
           SELECT event_type AS k,
             date_diff('day', DATE '1970-01-05',
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
               // 7 AS p,
             count(*) AS x
           FROM events GROUP BY 1, 2
         ), s AS (
           SELECT a.k,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
           FROM w a JOIN w b ON a.k = b.k AND a.p < b.p
           GROUP BY a.k
         ), t AS (
           SELECT k, CAST(count(*) AS BIGINT) AS tt, x
           FROM w GROUP BY k, x
         ), v AS (
           SELECT k, CAST(sum(tt) AS BIGINT) AS n,
             CAST(sum(tt) * (sum(tt) - 1) * (2 * sum(tt) + 5)
               - sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS var18
           FROM t GROUP BY k
         ), z0 AS (
           SELECT s.k, v.n, s.s_stat, v.var18,
             CASE WHEN v.var18 > 0 THEN
               CASE WHEN s.s_stat = 0 THEN 0.0 ELSE
                 round((CAST(s.s_stat AS DOUBLE)
                     - CASE WHEN s.s_stat > 0 THEN 1.0
                            WHEN s.s_stat < 0 THEN -1.0 ELSE 0.0 END)
                   / sqrt(CAST(v.var18 AS DOUBLE) / 18.0), 6) END END AS z
           FROM s JOIN v ON s.k = v.k WHERE v.n >= 3)
         SELECT k AS event_type, n AS n_periods, s_stat, var18, z,
           CASE WHEN z IS NULL THEN 'no_trend'
                WHEN z > 1.959964 THEN 'increasing'
                WHEN z < -1.959964 THEN 'decreasing'
                ELSE 'no_trend' END AS verdict
         FROM z0 ORDER BY event_type""",

    // SPRT replay: the same 1e6-scaled constants (interpolated from
    // the operator's own sprtConstants6), exact integer LLR cumsums,
    // first boundary crossing per variant
    "ab_sprt" -> {
      val (l1, l0, a6, b6) =
        graft.operators.Quality.sprtConstants6(0.18, 0.22, 0.05, 0.05)
      s"""WITH w AS (
           SELECT CAST(user_id % 2 AS VARCHAR) AS g, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
           FROM events
         ), c AS (
           SELECT g,
             CAST(row_number() OVER (PARTITION BY g ORDER BY event_id)
               AS BIGINT) AS n,
             CAST(sum(x) OVER (PARTITION BY g ORDER BY event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
           FROM w
         ), l AS (
           SELECT g, n, s, s * ($l1) + (n - s) * ($l0) AS llr6 FROM c
         ), f AS (
           SELECT g,
             min(CASE WHEN llr6 >= $a6 OR llr6 <= $b6 THEN n END) AS nc,
             max(n) AS nt
           FROM l GROUP BY g)
         SELECT l.g AS variant,
           CASE WHEN f.nc IS NULL THEN 'continue'
                WHEN l.llr6 >= $a6 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           l.n AS n_obs, l.s AS successes,
           CAST(l.llr6 AS DOUBLE) / 1000000.0 AS llr
         FROM l JOIN f ON l.g = f.g AND l.n = COALESCE(f.nc, f.nt)
         ORDER BY variant"""
    },

    // Count-Min replay: the same md5 row hashes, integer cell adds,
    // min over the d probes — est >= exact is graded content
    "corpus_cms_counts" ->
      """WITH terms AS (
           SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
             AS term
           FROM documents
         ), counts AS (
           SELECT term, count(*) AS n_exact FROM terms
           WHERE length(term) > 0 GROUP BY term
         ), jj AS (SELECT unnest(generate_series(0, 3)) AS j),
         cells AS (
           SELECT j, bucket, sum(n_exact) AS cell FROM (
             SELECT n_exact, j,
               CAST('0x' || substr(md5('cms:' || CAST(j AS VARCHAR)
                 || ':' || term), 1, 15) AS BIGINT) % 1024 AS bucket
             FROM counts CROSS JOIN jj)
           GROUP BY 1, 2
         ), top AS (
           SELECT term, n_exact FROM counts
           ORDER BY n_exact DESC, term LIMIT 20
         ), probes AS (
           SELECT term, n_exact, j,
             CAST('0x' || substr(md5('cms:' || CAST(j AS VARCHAR)
               || ':' || term), 1, 15) AS BIGINT) % 1024 AS bucket
           FROM top CROSS JOIN jj)
         SELECT term, CAST(max(n_exact) AS BIGINT) AS n_exact,
           CAST(min(cell) AS BIGINT) AS n_est
         FROM probes JOIN cells USING (j, bucket)
         GROUP BY term ORDER BY n_exact DESC, term""",

    // hard-negative replay: the brute cosine stream with the
    // label-inequality filter, rank <= 8 per query
    "ann_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS query_id, label AS ql,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id % 50 = 0
         ), c AS (
           SELECT vec_id AS neighbor_id, label AS cl,
             CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings
         ), scored AS (
           SELECT query_id, neighbor_id,
             list_sum(list_transform(generate_series(1, len(cv)),
               i -> cv[i] * qv[i]))
             / (sqrt(list_sum(list_transform(cv, x -> x * x)))
                * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cosine
           FROM c, q WHERE neighbor_id <> query_id AND cl <> ql)
         SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn
           FROM scored)
         WHERE rn <= 8 ORDER BY query_id, rank""",

    // ---- r13 wave ----
    // IVF-ranked weak labeling: the ann_ivf_topk replay with corpus =
    // labeled (vec_id % 50 <> 0) and queries = the unlabeled batch,
    // then ann_knn_label's integer vote on the probed top-10
    "ann_knn_label_ivf" ->
      """WITH e AS (SELECT vec_id, label,
               CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           cent AS (SELECT vec_id AS cell, v AS cv,
                      list_sum(list_transform(v, x -> x * x)) AS cc
                    FROM e WHERE vec_id < 16),
           ad AS (
             SELECT e.vec_id, e.label, c.cell,
               -2 * list_sum(list_transform(generate_series(1, len(e.v)),
                 i -> e.v[i] * c.cv[i])) + c.cc AS dist
             FROM e, cent c),
           assigned AS (
             SELECT vec_id, label, cell FROM (
               SELECT vec_id, label, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cell) AS r
               FROM ad WHERE vec_id % 50 <> 0)
             WHERE r = 1),
           probes AS (
             SELECT vec_id AS query_id, cell FROM (
               SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dist, cell) AS r
               FROM ad WHERE vec_id % 50 = 0)
             WHERE r <= 4),
           scored AS (
             SELECT p.query_id, a.vec_id AS neighbor_id, a.label,
               list_sum(list_transform(generate_series(1, len(c.v)),
                 i -> c.v[i] * q.v[i]))
               / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.v, x -> x * x)))) AS cosine
             FROM assigned a JOIN probes p USING (cell)
               JOIN e c ON a.vec_id = c.vec_id
               JOIN e q ON p.query_id = q.vec_id
             WHERE a.vec_id <> p.query_id),
           topk AS (
             SELECT query_id, label FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
             WHERE rn <= 10),
           votes AS (
             SELECT query_id, label, count(*) AS votes
             FROM topk GROUP BY query_id, label)
           SELECT query_id AS vec_id, label AS pred_label, votes FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY votes DESC, label) AS rn FROM votes)
           WHERE rn = 1 ORDER BY vec_id""",

    // the positional index itself: normalize + split + 1-based token
    // positions (empty tokens can only arise from empty docs and are
    // filtered on both sides)
    "doc_phrase_index_build" ->
      """WITH d AS (
           SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS toks
           FROM documents),
         t AS (
           SELECT doc_id,
             unnest(toks) AS term,
             unnest(generate_series(1, len(toks))) AS pos
           FROM d)
         SELECT doc_id, term, CAST(pos AS BIGINT) AS pos
         FROM t WHERE length(term) > 0
         ORDER BY doc_id, pos""",

    // video-metadata round trip: the synth parameters replayed from
    // doc_id — the Spark side must recover exactly these from the
    // container bytes it built
    "multimodal_video_meta" ->
      """SELECT doc_id AS media_id,
           CAST(500 + (doc_id % 97) * 250 AS BIGINT) AS duration_ms,
           CAST(160 + (doc_id % 20) * 16 AS INTEGER) AS width,
           CAST(90 + (doc_id % 12) * 9 AS INTEGER) AS height,
           CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS codec,
           CASE WHEN doc_id % 3 = 0 THEN 'mp42' ELSE 'isom' END AS brand,
           TRUE AS parsed
         FROM documents ORDER BY media_id""",

    // frame-sample replay: 2 + id%7 frames at 40 ms cadence, sampled
    // every 3rd (everyMs 120); payload = 2 marker bytes + the ASCII
    // "frame:<id>:<no>" tag
    "multimodal_frame_sample" ->
      """WITH f AS (
           SELECT doc_id,
             unnest(generate_series(0, CAST(2 + doc_id % 7 AS BIGINT) - 1,
               3)) AS frame_no
           FROM documents)
         SELECT doc_id AS media_id, CAST(frame_no AS BIGINT) AS frame_no,
           CAST(2 + length('frame:' || doc_id || ':' || frame_no)
             AS INTEGER) AS n_frame_bytes
         FROM f ORDER BY media_id, frame_no""",

    // definitional O(n^2) radius join over the replayed coordinates —
    // the grid blocking must lose nothing
    "geo_radius_join" ->
      """WITH p AS (
           SELECT c_custkey AS id,
             (c_custkey * 7919) % 1000000 AS x,
             (c_custkey * 104729) % 1000000 AS y
           FROM customer)
         SELECT a.id AS left_id, b.id AS right_id,
           CAST((a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
         FROM p a JOIN p b ON a.id < b.id
         WHERE (a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y) <= 400000000
         ORDER BY left_id, right_id""",

    // definitional windowed-median replay: the frame's order
    // statistics extracted explicitly so the even-count tree is the
    // identical (a + b) / 2 the operator runs (DuckDB's median() is
    // an interpolating quantile — lo + (hi−lo)·0.5 — whose IEEE tree
    // can differ in the last ulp)
    "events_rolling_median" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
           FROM events
         ), w AS (
           SELECT a.user_id, a.event_id, a.ts, a.value, b.value AS bv,
             row_number() OVER (PARTITION BY a.user_id, a.event_id
               ORDER BY b.value) AS r,
             count(*) OVER (PARTITION BY a.user_id, a.event_id) AS n
           FROM e a JOIN e b ON a.user_id = b.user_id
             AND b.rn BETWEEN a.rn - 6 AND a.rn)
         SELECT user_id, event_id, ts, value,
           CASE WHEN n % 2 = 1
             THEN max(CASE WHEN r = (n + 1) // 2 THEN bv END)
             ELSE (max(CASE WHEN r = n // 2 THEN bv END)
               + max(CASE WHEN r = n // 2 + 1 THEN bv END)) / 2
           END AS rolling_median
         FROM w GROUP BY user_id, event_id, ts, value, n
         ORDER BY user_id, event_id""",

    // rank-cut trimmed/winsorized replay: same decimal(18,6) values,
    // same floor(0.05*n) cut, same closed-form winsorized sum
    "dq_robust_mean" ->
      """WITH r AS (
           SELECT o_orderpriority AS k,
             CAST(o_totalprice AS DECIMAL(18,6)) AS v,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(18,6)), o_orderkey)
               AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders
         ), c AS (
           SELECT *, CAST(floor(0.05 * n) AS BIGINT) AS cut FROM r)
         SELECT k AS o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(v) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean,
           CAST(sum(CASE WHEN rn > cut AND rn <= n - cut THEN v END)
               AS DOUBLE)
             / CAST(sum(CASE WHEN rn > cut AND rn <= n - cut
                 THEN 1 ELSE 0 END) AS DOUBLE) AS trimmed_mean,
           CAST(sum(CASE WHEN rn > cut AND rn <= n - cut THEN v END)
               + max(cut) * max(CASE WHEN rn = cut + 1 THEN v END)
               + max(cut) * max(CASE WHEN rn = n - cut THEN v END)
               AS DOUBLE)
             / CAST(max(n) AS DOUBLE) AS winsorized_mean
         FROM c GROUP BY k ORDER BY o_orderpriority""",

    // FS scoring replay over the same nation blocks with the SAME
    // 1e6-scaled integer log-weights (interpolated from the one
    // driver-side rounding both engines share)
    "er_fs_scores" -> fsScoresSql(),

    // incremental FS door: the full replay restricted to pairs with
    // an odd (batch) side — the equivalence the door guarantees
    "er_fs_scores_incr" ->
      fsScoresSql("WHERE id_a % 2 = 1 OR id_b % 2 = 1"),

    // Heaps'-law replay: same integer checkpoints (maxId*j)//points,
    // same >0 guards, the corpus_zipf closed-form OLS
    "corpus_heaps" ->
      """WITH w AS (
           SELECT doc_id AS id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
             AS term
           FROM documents
         ), w1 AS (SELECT id, term FROM w WHERE length(term) > 0),
         fd AS (SELECT term, min(id) AS fd FROM w1 GROUP BY term),
         pd AS (SELECT id, count(*) AS tok FROM w1 GROUP BY id),
         mx AS (SELECT max(id) AS m FROM pd),
         cp AS (SELECT DISTINCT (mx.m * j) // 32 AS c
                FROM mx, (SELECT unnest(generate_series(1, 32)) AS j)),
         pts AS (
           SELECT cp.c,
             (SELECT count(*) FROM fd WHERE fd.fd <= cp.c) AS v,
             (SELECT coalesce(sum(tok), 0) FROM pd WHERE pd.id <= cp.c) AS n
           FROM cp),
         l AS (SELECT ln(CAST(n AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
               FROM pts WHERE n > 0 AND v > 0),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
                 sum(y*y) AS syy
               FROM l)
         SELECT CAST(n AS BIGINT) AS n_points,
           CASE WHEN n*sxx - sx*sx <> 0 THEN
             round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0 END AS beta,
           CASE WHEN n*sxx - sx*sx <> 0 THEN
             round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
               + 0.0
           END AS intercept,
           CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0 THEN
             round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                   / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) + 0.0 END AS r2
         FROM s""",

    // Tukey-fence replay: same type-7 interpolated quartiles, fences
    // from the UNROUNDED quartiles, round-6 on both compare sides
    "dq_outlier_iqr" ->
      """WITH q AS (
           SELECT event_type AS g,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
           FROM events GROUP BY 1
         ), f AS (
           SELECT g, round(q1, 6) AS q1r, round(q3, 6) AS q3r,
             round(q1 - 1.5 * (q3 - q1), 6) AS lo,
             round(q3 + 1.5 * (q3 - q1), 6) AS hi
           FROM q)
         SELECT e.event_type, e.event_id, e.value,
           f.q1r AS q1, f.q3r AS q3, f.lo AS fence_lo, f.hi AS fence_hi
         FROM events e JOIN f ON e.event_type = f.g
         WHERE round(e.value, 6) < f.lo OR round(e.value, 6) > f.hi
         ORDER BY e.event_type, e.event_id""",

    // G-test replay: observed cells only (o = 0 contributes exactly
    // 0), same r6-scaled integer contribution sum as dq_chi2
    "dq_gtest" ->
      """WITH obs AS (
           SELECT c_mktsegment AS a, c_nationkey AS b,
             CAST(count(*) AS BIGINT) AS o
           FROM customer GROUP BY 1, 2
         ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
         ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
         ), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
         ), sc AS (
           SELECT obs.a, obs.b,
             CAST(round(2.0 * CAST(obs.o AS DOUBLE)
               * ln(CAST(obs.o AS DOUBLE)
                 / (CAST(ra.r AS DOUBLE) * CAST(cb.c AS DOUBLE)
                    / CAST(nn.n AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS s6
           FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn)
         SELECT nn.n, x.n_rows_cat, x.n_cols_cat,
           (x.n_rows_cat - 1) * (x.n_cols_cat - 1) AS dof,
           round(CAST(x.g6 AS DOUBLE) / 1000000.0, 6) AS g_stat
         FROM (
           SELECT CAST(count(DISTINCT a) AS BIGINT) AS n_rows_cat,
             CAST(count(DISTINCT b) AS BIGINT) AS n_cols_cat,
             CAST(sum(s6) AS BIGINT) AS g6
           FROM sc) x CROSS JOIN nn""",

    // kappa replay: the exact-integer closed form
    // (diag*N - SUM r*c) / (N^2 - SUM r*c) on the lang-ID confusion
    "dq_cohens_kappa" -> cohensKappaSql,

    // per-source JSD replay: identical p/q/m divisions, rounded
    // contributions integer-summed, the closed-form absent mass
    "corpus_source_divergence" -> sourceDivergenceSql,

  )

  /** Cohen's-kappa replay on the lang-ID confusion — the same exact
    * integer closed form the operator runs.
    */
  private def cohensKappaSql: String =
    s"""WITH pred AS (
          SELECT doc_id, $langPredCaseSql AS lang_pred
          FROM ($langPredBaseSql)
        ), pairs AS (
          SELECT d.lang AS a, p.lang_pred AS b
          FROM documents d JOIN pred p USING (doc_id)
        ), obs AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS o
          FROM pairs GROUP BY a, b
        ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
        ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
        ), rc AS (
          SELECT CAST(sum(coalesce(r, 0) * coalesce(c, 0)) AS BIGINT) AS rc
          FROM ra FULL OUTER JOIN cb ON ra.a = cb.b
        ), base AS (
          SELECT CAST(sum(o) AS BIGINT) AS n,
            CAST(sum(CASE WHEN a = b THEN o ELSE 0 END) AS BIGINT) AS diag
          FROM obs)
        SELECT base.n,
          CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
          CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS p_e,
          CASE WHEN n * n <> rc THEN
            CAST(diag * n - rc AS DOUBLE) / CAST(n * n - rc AS DOUBLE)
          END AS kappa
        FROM base CROSS JOIN rc"""

  /** Per-source JSD replay — the same rounded contribution sum and
    * closed-form absent mass, with the operator's driver-side
    * 0.5*ln(2) constant interpolated so both engines use the one
    * double.
    */
  private def sourceDivergenceSql: String = {
    val halfLn2 = 0.5 * math.log(2.0)
    s"""WITH w AS (
          SELECT source, unnest(string_split(
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
          FROM documents
        ), st AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS cst
          FROM w WHERE length(term) > 0 GROUP BY source, term
        ), t AS (SELECT term, CAST(sum(cst) AS BIGINT) AS ct FROM st GROUP BY 1
        ), g AS (SELECT source, CAST(sum(cst) AS BIGINT) AS ns FROM st GROUP BY 1
        ), nn AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM t
        ), sc AS (
          SELECT st.source,
            CAST(round((0.5 * (CAST(st.cst AS DOUBLE) / CAST(g.ns AS DOUBLE))
                * ln((CAST(st.cst AS DOUBLE) / CAST(g.ns AS DOUBLE))
                  / ((CAST(st.cst AS DOUBLE) / CAST(g.ns AS DOUBLE)
                      + CAST(t.ct AS DOUBLE) / CAST(nn.n AS DOUBLE)) / 2.0))
              + 0.5 * (CAST(t.ct AS DOUBLE) / CAST(nn.n AS DOUBLE))
                * ln((CAST(t.ct AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  / ((CAST(st.cst AS DOUBLE) / CAST(g.ns AS DOUBLE)
                      + CAST(t.ct AS DOUBLE) / CAST(nn.n AS DOUBLE)) / 2.0)))
              * 1000000.0) AS BIGINT) AS s6,
            t.ct
          FROM st JOIN t USING (term) JOIN g USING (source) CROSS JOIN nn
        ), per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
            CAST(sum(s6) AS BIGINT) AS c6, CAST(sum(ct) AS BIGINT) AS cov
          FROM sc GROUP BY source)
        SELECT per.source, per.n_terms,
          round(CAST(per.c6
            + CAST(round($halfLn2
                * (1.0 - CAST(per.cov AS DOUBLE) / CAST(nn.n AS DOUBLE))
                * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0, 6) AS jsd
        FROM per CROSS JOIN nn ORDER BY source"""
  }

  /** [[graft.operators.Linkage.fellegiSunter]]'s integer log-weights,
    * computed by the SAME driver-side rounding the operator uses, so
    * both engines sum identical integers (the sprtConstants6
    * discipline).
    */
  private def fsScoresSql(pairWhere: String = ""): String = {
    def w(m: Double, u: Double): (Long, Long) =
      (math.round(math.log(m / u) * 1e6),
        math.round(math.log((1 - m) / (1 - u)) * 1e6))
    val (nA, nD) = w(0.9, 0.001)
    val (sA, sD) = w(0.95, 0.2)
    val (bA, bD) = w(0.8, 0.01)
    val u6 = math.round(5.0 * 1e6)
    val l6 = math.round(0.0 * 1e6)
    s"""WITH c AS (
          SELECT c_custkey AS id,
            CAST(c_nationkey AS VARCHAR) || ':'
              || CAST(c_custkey % 8 AS VARCHAR) AS blk,
            c_name, c_mktsegment,
            CAST(c_acctbal AS DECIMAL(12,2)) AS bal
          FROM customer
        ), s AS (
          SELECT a.id AS id_a, b.id AS id_b,
            (CASE WHEN levenshtein(a.c_name, b.c_name) <= 2
               THEN 1 ELSE 0 END) AS ag_name,
            (CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN 1 ELSE 0 END) AS ag_seg,
            (CASE WHEN abs(a.bal - b.bal) <= CAST('10.00' AS DECIMAL(12,2))
               THEN 1 ELSE 0 END) AS ag_bal
          FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        ), sc AS (
          SELECT id_a, id_b,
            CAST(ag_name + ag_seg + ag_bal AS INTEGER) AS n_agree,
            (CASE WHEN ag_name = 1 THEN $nA ELSE $nD END
             + CASE WHEN ag_seg = 1 THEN $sA ELSE $sD END
             + CASE WHEN ag_bal = 1 THEN $bA ELSE $bD END) AS s6
          FROM s)
        SELECT id_a, id_b, n_agree,
          CAST(s6 AS DOUBLE) / 1000000.0 AS score,
          CASE WHEN s6 >= $u6 THEN 'link'
               WHEN s6 <= $l6 THEN 'non_link'
               ELSE 'possible' END AS decision
        FROM sc $pairWhere ORDER BY id_a, id_b"""
  }

  /** [[graft.operators.KMeans.fit]]'s Lloyd rounds unrolled over the
    * RFM score features: aᵣ assigns against cᵣ₋₁ by exact integer
    * distance, cᵣ re-rounds the per-cluster means to 1e6 fixed point.
    */
  private def kmeansRoundsSql(rounds: Int): String = {
    def dist(c: String) =
      s"""(f.x1 * 1000000 - $c.d1) * (f.x1 * 1000000 - $c.d1)
          + (f.x2 * 1000000 - $c.d2) * (f.x2 * 1000000 - $c.d2)
          + (f.x3 * 1000000 - $c.d3) * (f.x3 * 1000000 - $c.d3)"""
    val iters = (1 to rounds).map { i =>
      s"""a$i AS (
           SELECT id, x1, x2, x3, j AS c FROM (
             SELECT f.id, f.x1, f.x2, f.x3, c.j,
               row_number() OVER (PARTITION BY f.id
                 ORDER BY ${dist("c")}, c.j) AS rk
             FROM f, c${i - 1} c) WHERE rk = 1
         ), c$i AS (
           SELECT p.j, COALESCE(u.d1, p.d1) AS d1,
             COALESCE(u.d2, p.d2) AS d2, COALESCE(u.d3, p.d3) AS d3
           FROM c${i - 1} p LEFT JOIN (
             SELECT c AS j,
               CAST(round(1000000.0 * CAST(sum(x1) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS d1,
               CAST(round(1000000.0 * CAST(sum(x2) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS d2,
               CAST(round(1000000.0 * CAST(sum(x3) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS d3
             FROM a$i GROUP BY c) u ON p.j = u.j
         )"""
    }.mkString(", ")
    s"""WITH pc AS (
         SELECT o_custkey, max(o_orderdate) AS last_o,
           count(*) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
         FROM orders GROUP BY 1
       ), r AS (
         SELECT *, date_diff('day', last_o,
           (SELECT max(last_o) FROM pc)) AS recency_days FROM pc
       ), f AS (
         SELECT o_custkey AS id,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
             AS BIGINT) AS x1,
           CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
             AS BIGINT) AS x2,
           CAST(ntile(5) OVER (ORDER BY monetary, o_custkey)
             AS BIGINT) AS x3
         FROM r
       ), c0(j, d1, d2, d3) AS (VALUES
         (0, 1000000, 1000000, 1000000),
         (1, 5000000, 5000000, 5000000),
         (2, 5000000, 1000000, 1000000),
         (3, 1000000, 5000000, 5000000)
       ), $iters
       SELECT id AS o_custkey, CAST(j AS INTEGER) AS cluster,
         x1 AS r_score, x2 AS f_score, x3 AS m_score,
         CAST(dist AS BIGINT) AS dist2
       FROM (
         SELECT f.id, f.x1, f.x2, f.x3, c.j, ${dist("c")} AS dist,
           row_number() OVER (PARTITION BY f.id
             ORDER BY ${dist("c")}, c.j) AS rk
         FROM f, c$rounds c) WHERE rk = 1
       ORDER BY o_custkey"""
  }

  /** The [[graft.operators.Quality.esdOutliers]] rounds unrolled as
    * CTE chains: cᵣ = remaining points, sᵣ = per-key exact stats,
    * fᵣ = that round's argmax flag.
    */
  private def esdRoundsSql(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""s$i AS (
           SELECT k, count(*) AS n, sum(CAST(x AS HUGEINT)) AS s,
             sum(CAST(x AS HUGEINT) * x) AS q
           FROM c${i - 1} GROUP BY k
           HAVING count(*) >= 3
             AND CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
               > sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT))
         ), d$i AS (
           SELECT c.k, c.slot, c.x, s.n, s.s, s.q,
             abs(CAST(s.n AS HUGEINT) * c.x - s.s) AS dev,
             row_number() OVER (PARTITION BY c.k
               ORDER BY abs(CAST(s.n AS HUGEINT) * c.x - s.s) DESC, c.slot)
               AS rk
           FROM c${i - 1} c JOIN s$i s ON c.k = s.k
         ), f$i AS (
           SELECT k, $i AS esd_round, slot, x,
             (CAST(dev AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               AS r_stat
           FROM d$i WHERE rk = 1
         ), c$i AS (
           SELECT c.* FROM c${i - 1} c
           WHERE NOT EXISTS (SELECT 1 FROM f$i
             WHERE f$i.k = c.k AND f$i.slot = c.slot)
         )"""
    }.mkString(", ")
    val flags = (1 to rounds).map(i => s"SELECT * FROM f$i")
      .mkString(" UNION ALL ")
    s"""WITH c0 AS (
         SELECT event_type AS k,
           CAST(datediff('day', DATE '1970-01-01',
             CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS slot,
           count(*) AS x
         FROM events GROUP BY 1, 2
       ), $iters
       SELECT k AS event_type, CAST(esd_round AS INTEGER) AS esd_round,
         slot AS day, CAST(x AS BIGINT) AS n, r_stat
       FROM ($flags) ORDER BY event_type, esd_round"""
  }
}
