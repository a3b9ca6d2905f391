package graft

import graft.OracleFragments._

/** Oracle-registry shard 8 — the r13 wave-2 oracles split out of
  * OraclesShard7 at the RegistrySpec 1200-line ceiling. DuckDB SQL
  * VERBATIM; [[SparkEntry.oracleSql]] composes the shards. */
private[graft] object OraclesShard8 {
  val m: Map[String, String] = Map(
    // ---- experimentation-stats wave 2 (r13) ----
    // Kruskal–Wallis replay: the ab_mannwhitney doubled
    // tie-averaged ranks, per-group contribution
    // 3·SR2²/(n_g·N·(N+1)) r6-scaled and integer-summed, exact tie
    // term, one final division by the correction
    "ab_kruskal_wallis" ->
      """WITH f AS (
           SELECT hour(CAST(ts AS TIMESTAMP)) AS hod, event_type AS g,
             value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         ), r AS (
           SELECT hod, g,
             2 * (rank() OVER (PARTITION BY hod ORDER BY v) - 1)
               + count(*) OVER (PARTITION BY hod, v) + 1 AS r2
           FROM f
         ), pg AS (
           SELECT hod, g, count(*) AS ng, CAST(sum(r2) AS BIGINT) AS sr2
           FROM r GROUP BY 1, 2
         ), tot AS (SELECT hod, count(*) AS n FROM f GROUP BY 1
         ), t AS (
           SELECT hod, CAST(sum(tt*tt*tt - tt) AS BIGINT) AS tie
           FROM (SELECT hod, v, count(*) AS tt FROM f GROUP BY 1, 2)
           GROUP BY 1
         ), c AS (
           SELECT pg.hod, tot.n,
             CAST(round(3.0 * CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE)
               / (CAST(ng AS DOUBLE) * CAST(tot.n AS DOUBLE)
                 * CAST(tot.n + 1 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS c6
           FROM pg JOIN tot ON pg.hod = tot.hod
         ), a AS (
           SELECT hod, max(n) AS n, count(*) AS k,
             CAST(sum(c6) AS BIGINT) AS h6
           FROM c GROUP BY 1 HAVING count(*) >= 2
         ), x AS (
           SELECT a.hod, a.n, a.k, a.h6,
             1.0 - CAST(t.tie AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE)
                 * CAST(a.n AS DOUBLE) - CAST(a.n AS DOUBLE)) AS corr
           FROM a JOIN t ON a.hod = t.hod)
         SELECT hod, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(k - 1 AS BIGINT) AS dof,
           round(CASE WHEN corr > 0 THEN
             (CAST(h6 AS DOUBLE) / 1000000.0
               - 3.0 * CAST(n + 1 AS DOUBLE)) / corr END, 6) AS h
         FROM x ORDER BY hod""",

    // Brown–Forsythe replay: round-6-guarded group medians
    // (quantile_cont = Spark percentile), r6-scaled integer |v−med|
    // deviations, per-group between/within terms rounded to integer
    // z units and summed order-free, one F tree
    "ab_brown_forsythe" ->
      """WITH src AS (
           SELECT hour(CAST(ts AS TIMESTAMP)) AS hod, event_type AS g,
             CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         ), med AS (
           SELECT hod, g, round(quantile_cont(v, 0.5), 6) AS med
           FROM src GROUP BY 1, 2
         ), z AS (
           SELECT src.hod, src.g,
             CAST(round(abs(src.v - med.med) * 1000000.0) AS BIGINT) AS z6
           FROM src JOIN med ON src.hod = med.hod AND src.g = med.g
         ), pg AS (
           SELECT hod, g, count(*) AS ng, CAST(sum(z6) AS BIGINT) AS s,
             sum(CAST(z6 AS HUGEINT) * z6) AS q
           FROM z GROUP BY 1, 2
         ), t2 AS (
           SELECT hod, ng, s,
             CAST(round((CAST(s AS DOUBLE) / 1000000.0)
               * (CAST(s AS DOUBLE) / 1000000.0)
               / CAST(ng AS DOUBLE)) AS BIGINT) AS b0,
             CAST(round(CAST(q AS DOUBLE) / 1000000000000.0
               - (CAST(s AS DOUBLE) / 1000000.0)
                 * (CAST(s AS DOUBLE) / 1000000.0)
                 / CAST(ng AS DOUBLE)) AS BIGINT) AS w0
           FROM pg
         ), a AS (
           SELECT hod, CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
             CAST(sum(s) AS BIGINT) AS stot,
             CAST(sum(b0) AS BIGINT) AS bsum,
             CAST(sum(w0) AS BIGINT) AS wsum
           FROM t2 GROUP BY 1
           HAVING count(*) >= 2 AND sum(ng) > count(*)
         ), x AS (
           SELECT a.*, CAST(stot AS DOUBLE) / 1000000.0 AS gtot FROM a)
         SELECT hod, n, CAST(k AS BIGINT) AS k,
           CAST(k - 1 AS BIGINT) AS dof1, CAST(n - k AS BIGINT) AS dof2,
           round(CASE WHEN wsum > 0 THEN
             ((CAST(bsum AS DOUBLE) - gtot * gtot / CAST(n AS DOUBLE))
               / CAST(k - 1 AS DOUBLE))
             / (CAST(wsum AS DOUBLE) / CAST(n - k AS DOUBLE)) END, 6) AS f
         FROM x ORDER BY hod""",

    // BH replay: the ab_mannwhitney z pipeline → two-sided p via the
    // identical A&S 26.2.17 literal tree → rank/threshold/step-up/
    // reversed-running-min windows over the 24-test frame
    "dq_bh_fdr" ->
      """WITH f AS (
           SELECT hour(CAST(ts AS TIMESTAMP)) AS hod,
             event_type = 'purchase' AS isa, value AS v
           FROM events WHERE event_type IN ('purchase', 'view')
         ), r AS (
           SELECT hod, isa, v,
             2 * (rank() OVER (PARTITION BY hod ORDER BY v) - 1)
               + count(*) OVER (PARTITION BY hod, v) + 1 AS r2
           FROM f
         ), t AS (
           SELECT hod, CAST(sum(tt*tt*tt - tt) AS BIGINT) AS tie
           FROM (SELECT hod, v, count(*) AS tt FROM f GROUP BY 1, 2)
           GROUP BY 1
         ), a AS (
           SELECT hod, sum(CASE WHEN isa THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN isa THEN 0 ELSE 1 END) AS n_b,
             CAST(sum(CASE WHEN isa THEN r2 ELSE 0 END) AS BIGINT) AS ra2
           FROM r GROUP BY 1
           HAVING sum(CASE WHEN isa THEN 1 ELSE 0 END) >= 1
             AND sum(CASE WHEN isa THEN 0 ELSE 1 END) >= 1
         ), c AS (
           SELECT a.hod, n_a, n_b, ra2 - n_a * (n_a + 1) AS u2,
             n_a + n_b AS n, t.tie
           FROM a JOIN t ON a.hod = t.hod
         ), s AS (
           SELECT *, (CAST(n_a AS DOUBLE) * n_b / 12.0)
             * (CAST(n + 1 AS DOUBLE) - CAST(tie AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS s2
           FROM c
         ), mw AS (
           SELECT hod, round(CASE WHEN s2 > 0 THEN
             (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)
             / (2.0 * sqrt(s2)) END, 6) AS z
           FROM s
         ), az AS (
           SELECT hod, abs(z) AS az,
             1.0 / (1.0 + 0.2316419 * abs(z)) AS t
           FROM mw WHERE z IS NOT NULL
         ), pp AS (
           SELECT hod, least(1.0,
             2.0 * (exp(-0.5 * az * az) / 2.5066282746310002)
               * (t * (0.319381530 + t * (-0.356563782
                 + t * (1.781477937 + t * (-1.821255978
                   + t * 1.330274429)))))) AS p
           FROM az
         ), b AS (
           SELECT hod, p, row_number() OVER (ORDER BY p, hod) AS rnk,
             count(*) OVER () AS m
           FROM pp
         ), q AS (
           SELECT *, min(least(1.0,
               p * CAST(m AS DOUBLE) / CAST(rnk AS DOUBLE)))
               OVER (ORDER BY rnk DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS q_value,
             max(CASE WHEN p <= CAST(rnk AS DOUBLE) * 0.05
               / CAST(m AS DOUBLE) THEN rnk END) OVER () AS passrank
           FROM b)
         SELECT hod, CAST(rnk AS BIGINT) AS rank, round(p, 6) AS p,
           round(CAST(rnk AS DOUBLE) * 0.05 / CAST(m AS DOUBLE), 6)
             AS bh_threshold,
           round(q_value, 6) AS q_value,
           (passrank IS NOT NULL AND rnk <= passrank) AS reject
         FROM q ORDER BY rank""",

    // power/MDE replay: welch-style HUGEINT sufficient statistics,
    // z quantiles as the SAME parsed literals summed in-engine so
    // both sides use one double, ceil on the round-6 value
    "ab_power_mde" ->
      """WITH u AS (
           SELECT event_type AS k, CAST(user_id % 2 AS VARCHAR) AS g,
             count(*) AS v
           FROM events GROUP BY event_type, user_id
         ), a AS (
           SELECT k,
             sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN g = '1' THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
             sum(CASE WHEN g = '0' THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
             sum(CASE WHEN g = '1' THEN CAST(v AS HUGEINT) * v ELSE 0 END)
               AS qa,
             sum(CASE WHEN g = '0' THEN CAST(v AS HUGEINT) * v ELSE 0 END)
               AS qb
           FROM u GROUP BY k
           HAVING sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) >= 2
             AND sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) >= 2
         ), c AS (
           SELECT k, n_a, n_b,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
               / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS va,
             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
               / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS vb,
             (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS mean
           FROM a
         ), m AS (
           SELECT *, (1.959964 + 0.841621)
               * sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
               AS mde,
             0.05 * mean AS delta
           FROM c)
         SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(mean, 6) AS pooled_mean, round(mde, 6) AS mde_abs,
           round(CASE WHEN mean > 0 THEN mde / mean END, 6) AS mde_rel,
           CASE WHEN delta > 0
             AND (1.959964 + 0.841621) * (1.959964 + 0.841621) * (va + vb)
               / (delta * delta) <= 1.0e15
           THEN CAST(ceil(round(
             (1.959964 + 0.841621) * (1.959964 + 0.841621) * (va + vb)
               / (delta * delta), 6)) AS BIGINT) END AS n_per_arm
         FROM m ORDER BY event_type""",

    // balanced-sample replay: the pure-SQL xxhash64 chain ranks each
    // class; the cut is the minimum class count
    "sample_balanced" ->
      s"""WITH r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
               AS rank
           FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                    "doc_id", 42L, Seq("lang"))})
         ), c AS (
           SELECT min(cnt) AS nmin FROM (
             SELECT count(*) AS cnt FROM documents GROUP BY lang))
         SELECT doc_id, lang, rank FROM r, c
         WHERE rank <= c.nmin ORDER BY lang, rank""",

    // audio round-trip replay: the synth parameters derived from
    // doc_id, exactly what the PCM decode must recover — duration
    // n/8 ms (n a multiple of 8), rms = peak = (256m/32768)·1e7
    // = m·78125 exact
    "multimodal_audio_meta" ->
      """SELECT doc_id AS media_id,
           8000.0 AS sample_rate,
           CAST(1 AS BIGINT) AS channels,
           CAST((800 + (doc_id % 50) * 16) / 8 AS BIGINT) AS duration_ms,
           CAST((1 + doc_id % 100) * 78125 AS BIGINT) AS rms_x1e7,
           CAST((1 + doc_id % 100) * 78125 AS BIGINT) AS peak_x1e7,
           TRUE AS parsed
         FROM documents ORDER BY media_id""",

    // median-CI replay: identical rank trees (floor/ceil on round-6
    // values), order statistics off the same tie-broken ranking,
    // quantile_cont median
    "dq_median_ci" ->
      """WITH f AS (
           SELECT event_type AS k, event_id AS id,
             CAST(value AS DOUBLE) AS v
           FROM events
         ), r AS (
           SELECT k, v,
             row_number() OVER (PARTITION BY k ORDER BY v, id) AS rn,
             count(*) OVER (PARTITION BY k) AS n
           FROM f
         ), g AS (
           SELECT k, rn, v, n,
             greatest(1, CAST(floor(round((CAST(n AS DOUBLE)
               - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0, 6))
               AS BIGINT)) AS rlo,
             least(n, CAST(ceil(round(1.0 + (CAST(n AS DOUBLE)
               + 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0, 6))
               AS BIGINT)) AS rhi
           FROM r WHERE n >= 20
         ), a AS (
           SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(max(rlo) AS BIGINT) AS rank_lo,
             CAST(max(rhi) AS BIGINT) AS rank_hi,
             max(CASE WHEN rn = rlo THEN v END) AS lo,
             max(CASE WHEN rn = rhi THEN v END) AS hi
           FROM g GROUP BY k
         ), m AS (
           SELECT event_type AS k, round(quantile_cont(value, 0.5), 6)
             AS median
           FROM events GROUP BY 1)
         SELECT a.k AS event_type, a.n, m.median, a.rank_lo, a.rank_hi,
           round(a.lo, 6) AS ci_lo, round(a.hi, 6) AS ci_hi
         FROM a JOIN m ON a.k = m.k ORDER BY event_type""",

    // SRM replay: distinct units, the identical chi-square and A&S
    // p-value trees, flag on the round-6 p
    "ab_srm" -> srmSql,

    // the streaming monitor accumulates the SAME unit set (set-union
    // state, redelivery anti-joined), so its verdict oracle is the
    // batch SRM replay verbatim
    "stream_srm" -> srmSql,


    // two-regressor OLS replay: HUGEINT-exact normal equations,
    // identical Cramer cofactor expansion and closed-form R^2
    "events_ols_multi" ->
      """WITH daily AS (
           SELECT event_type AS k,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS y
           FROM events GROUP BY 1, 2
         ), r0 AS (
           SELECT k,
             CAST(date_diff('day', DATE '1970-01-01', day) AS HUGEINT) AS t,
             CAST(CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END
               AS HUGEINT) AS w,
             CAST(y AS HUGEINT) AS y
           FROM daily
         ), a AS (
           SELECT k, CAST(count(*) AS HUGEINT) AS n,
             sum(t) AS st, sum(w) AS sw, sum(t*t) AS stt, sum(t*w) AS stw,
             sum(w*w) AS sww, sum(y) AS sy, sum(t*y) AS sty,
             sum(w*y) AS swy, sum(y*y) AS syy
           FROM r0 GROUP BY k
         ), dd AS (
           SELECT *,
             n*(stt*sww - stw*stw) - st*(st*sww - stw*sw)
               + sw*(st*stw - stt*sw) AS det,
             sy*(stt*sww - stw*stw) - st*(sty*sww - stw*swy)
               + sw*(sty*stw - stt*swy) AS deta,
             n*(sty*sww - stw*swy) - sy*(st*sww - stw*sw)
               + sw*(st*swy - sty*sw) AS detb1,
             n*(stt*swy - sty*stw) - st*(st*swy - sty*sw)
               + sy*(st*stw - stt*sw) AS detb2
           FROM a
         ), bb AS (
           SELECT *,
             CASE WHEN det <> 0 THEN
               CAST(deta AS DOUBLE) / CAST(det AS DOUBLE) END AS ia,
             CASE WHEN det <> 0 THEN
               CAST(detb1 AS DOUBLE) / CAST(det AS DOUBLE) END AS b1,
             CASE WHEN det <> 0 THEN
               CAST(detb2 AS DOUBLE) / CAST(det AS DOUBLE) END AS b2
           FROM dd
         ), rr AS (
           SELECT *,
             CAST(syy AS DOUBLE) - ia * CAST(sy AS DOUBLE)
               - b1 * CAST(sty AS DOUBLE) - b2 * CAST(swy AS DOUBLE) AS sse,
             CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n AS DOUBLE) AS sst
           FROM bb)
         SELECT k AS event_type, CAST(n AS BIGINT) AS n,
           round(ia, 6) AS intercept, round(b1, 6) AS beta_t,
           round(b2, 6) AS beta_w,
           round(CASE WHEN det <> 0 AND sst > 0 THEN 1.0 - sse / sst END, 6)
             AS r2
         FROM rr ORDER BY event_type""",

    // local clustering replay: canonical distinct edges, sorted
    // triple enumeration, per-corner credit, the identical lcc tree
    "graph_clustering" ->
      """WITH li AS (
           SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
           WHERE l_partkey % 4 = 0
         ), e AS (
           SELECT DISTINCT a.pk AS a, b.pk AS b
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         ), deg AS (
           SELECT n, count(*) AS degree FROM (
             SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1
         ), tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
           JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
         ), tc AS (
           SELECT n, CAST(count(*) AS BIGINT) AS n_tri FROM (
             SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri) GROUP BY 1)
         SELECT deg.n, CAST(deg.degree AS BIGINT) AS degree,
           coalesce(tc.n_tri, 0) AS n_tri,
           round(CASE WHEN deg.degree >= 2 THEN
             2.0 * CAST(coalesce(tc.n_tri, 0) AS DOUBLE)
             / (CAST(deg.degree AS DOUBLE)
               * (CAST(deg.degree AS DOUBLE) - 1.0)) END, 6) AS lcc
         FROM deg LEFT JOIN tc USING (n) ORDER BY n""",

    // safety-stock replay: same month keys, closed-form zero fill
    // (zeros add nothing to the sums; n = the corpus span), the
    // identical z·σ·√L trees
    "inventory_safety_stock" ->
      """WITH dem AS (
           SELECT l_partkey AS part,
             (year(CAST(l_shipdate AS TIMESTAMP)) - 1970) * 12
               + month(CAST(l_shipdate AS TIMESTAMP)) - 1 AS m,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
           FROM lineitem WHERE l_partkey % 40 = 0 GROUP BY 1, 2
         ), b AS (SELECT min(m) AS lo, max(m) AS hi FROM dem
         ), a AS (
           SELECT part, CAST(b.hi - b.lo + 1 AS BIGINT) AS n_months,
             CAST(sum(qty) AS BIGINT) AS s,
             sum(CAST(qty AS HUGEINT) * qty) AS q
           FROM dem, b GROUP BY part, b.hi, b.lo
         ), x AS (
           SELECT *, CASE WHEN n_months > 1 THEN sqrt(
             (CAST(n_months AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_months AS DOUBLE)
               * (CAST(n_months AS DOUBLE) - 1.0))) END AS sd
           FROM a)
         SELECT part, n_months,
           round(CAST(s AS DOUBLE) / CAST(n_months AS DOUBLE), 6)
             AS mean_demand,
           round(sd, 6) AS sd_demand,
           round(1.644854 * sd * sqrt(2.0), 6) AS safety_stock,
           round(CAST(s AS DOUBLE) / CAST(n_months AS DOUBLE) * 2.0
             + 1.644854 * sd * sqrt(2.0), 6) AS reorder_point
         FROM x ORDER BY part""",

    // streaming quality gate replay: the gate's per-doc verdict is
    // static, so the final corpus = every streamed doc whose
    // doc_quality_filter verdict is keep
    "stream_quality_gate" ->
      """WITH w AS (
           SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
           FROM documents
         ), f AS (
           SELECT doc_id, w, count(*) AS c FROM w
           WHERE length(w) > 0 GROUP BY doc_id, w
         ), m AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             count(*) / CAST(sum(c) AS DOUBLE) AS dr,
             max(c) / CAST(sum(c) AS DOUBLE) AS twf
           FROM f GROUP BY doc_id)
         SELECT d.doc_id, d.text FROM documents d JOIN m USING (doc_id)
         WHERE NOT (n_words < 20 OR n_words > 1000
           OR dr < 0.4 OR twf > 0.12)
         ORDER BY doc_id""",

    // TWAP replay: identical epoch-second lead chain, HUGEINT-exact
    // v100·Δsec numerator, one double division
    "events_twap" ->
      """WITH e AS (
           SELECT event_type AS k,
             date_diff('second', TIMESTAMP '1970-01-01',
               CAST(ts AS TIMESTAMP)) AS sec,
             event_id AS id,
             CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS v100
           FROM events
         ), l AS (
           SELECT k, sec, v100,
             lead(sec) OVER (PARTITION BY k ORDER BY sec, id) AS nsec
           FROM e)
         SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(max(sec) - min(sec) AS BIGINT) AS span_sec,
           round(CASE WHEN max(sec) - min(sec) > 0 THEN
             CAST(sum(CASE WHEN nsec IS NOT NULL THEN
               CAST(v100 AS HUGEINT) * (nsec - sec) ELSE 0 END) AS DOUBLE)
             / (100.0 * CAST(max(sec) - min(sec) AS DOUBLE)) END, 6) AS twa
         FROM l GROUP BY k ORDER BY event_type""",

    // LOO target-encoding replay: category sums, global prior, the
    // identical smoothing tree per row
    "feature_target_encoding" ->
      """WITH c AS (
           SELECT c_mktsegment AS cat, count(*) AS nc,
             CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS sc
           FROM customer GROUP BY 1
         ), g AS (
           SELECT CAST(sum(nc) AS BIGINT) AS ng,
             CAST(sum(sc) AS BIGINT) AS sg
           FROM c)
         SELECT cu.c_custkey, cu.c_mktsegment,
           CAST(CASE WHEN cu.c_acctbal > 0 THEN 1 ELSE 0 END AS BIGINT) AS y,
           round((CAST(sc AS DOUBLE)
               - CAST(CASE WHEN cu.c_acctbal > 0 THEN 1 ELSE 0 END AS DOUBLE)
               + 10.0 * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
             / (CAST(nc AS DOUBLE) - 1.0 + 10.0), 6) AS enc
         FROM customer cu JOIN c ON cu.c_mktsegment = c.cat CROSS JOIN g
         ORDER BY c_custkey""",

    // Jaro–Winkler pair replay: DuckDB's jaro_winkler_similarity IS
    // the reference formulation the native expression is pinned
    // against bit-for-bit; round-6 guard on both compare sides
    "er_jaro_pairs" ->
      """WITH b AS (
           SELECT c_custkey AS id, c_name AS name,
             c_nationkey * 8 + c_custkey % 8 AS blk
           FROM customer)
         SELECT a.id AS id_a, c.id AS id_b,
           round(jaro_winkler_similarity(a.name, c.name), 6) AS sim
         FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
         WHERE round(jaro_winkler_similarity(a.name, c.name), 6) >= 0.97
         ORDER BY id_a, id_b""",

    // MRR/AP replay over the shared BM25 ranking
    "search_map_mrr" -> mapMrrOracleSql,

    // calibration replay: the n/(n+20) squash r6-scaled to integer
    // s6, integer-div bins, exact HUGEINT Brier numerator, per-bin
    // n_b·|conf−acc| r6-scaled and integer-summed
    "model_calibration" ->
      """WITH u AS (
           SELECT user_id, count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS l,
             user_id % 2 AS cohort
           FROM events GROUP BY user_id
         ), s AS (
           SELECT cohort, l,
             CAST(round(CAST(n_events AS DOUBLE)
               / (CAST(n_events AS DOUBLE) + 20.0) * 1000000.0) AS BIGINT)
               AS s6
           FROM u
         ), b AS (
           SELECT cohort, least((s6 * 10) // 1000000, 9) AS bin, s6, l
           FROM s
         ), pb AS (
           SELECT cohort, bin, count(*) AS nb,
             CAST(sum(s6) AS BIGINT) AS ss, CAST(sum(l) AS BIGINT) AS sl,
             sum(CAST(s6 - l * 1000000 AS HUGEINT) * (s6 - l * 1000000))
               AS qb
           FROM b GROUP BY 1, 2
         ), e AS (
           SELECT cohort, nb, qb,
             CAST(round(abs(CAST(nb AS DOUBLE)
               * (CAST(ss AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000000.0)
                 - CAST(sl AS DOUBLE) / CAST(nb AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS e6
           FROM pb)
         SELECT cohort, CAST(sum(nb) AS BIGINT) AS n,
           round(CAST(sum(e6) AS DOUBLE)
             / (1000000.0 * CAST(sum(nb) AS DOUBLE)), 6) AS ece,
           round(CAST(sum(qb) AS DOUBLE)
             / (CAST(sum(nb) AS DOUBLE) * 1000000000000.0), 6) AS brier
         FROM e GROUP BY cohort ORDER BY cohort""",

    // ---- r14 wave ----

    // serial FFD replay (r13 verdict ask #7): the identical
    // first-fit-decreasing fold as a recursive CTE — docs in
    // (tokens desc, id asc) order, state = per-bin remaining
    // capacity + occupancy lists, first fitting bin via
    // list_position over a predicate map, positional update via
    // indexed list_transform. `coalesce(list_position(...), 0) = 0`
    // stands in for IS NULL (DuckDB 1.0 mis-plans the IS NULL form
    // inside recursive CTEs — the whole state column collapses to
    // []); MATERIALIZED pins the token CTE so the regex scan runs
    // once, not once per recursion step.
    "doc_pack_serial" ->
      """WITH RECURSIVE d AS MATERIALIZED (
           SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
           FROM (
             SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(
                   regexp_extract_all(text, '[A-Za-z0-9]+'),
                   w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
                 + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                 AS BIGINT) AS n_tokens
             FROM documents)
         ), pack AS (
           SELECT CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS BIGINT) AS n_tokens,
             CAST(NULL AS BIGINT) AS bin_id, CAST(NULL AS BIGINT) AS slot,
             CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS cnt
           UNION ALL
           SELECT q.rn, q.doc_id, q.n_tokens,
             CASE WHEN q.ix = 0 THEN len(q.rem) ELSE q.ix - 1 END,
             CASE WHEN q.ix = 0 THEN 0 ELSE q.cnt[q.ix] END,
             CASE WHEN q.ix = 0 THEN list_append(q.rem, 2048 - q.need)
               ELSE list_transform(q.rem, (x, i) ->
                 CASE WHEN i = q.ix THEN x - q.need ELSE x END) END,
             CASE WHEN q.ix = 0 THEN list_append(q.cnt, 1)
               ELSE list_transform(q.cnt, (x, i) ->
                 CASE WHEN i = q.ix THEN x + 1 ELSE x END) END
           FROM (
             SELECT d.rn, d.doc_id, d.n_tokens, p.rem, p.cnt,
               least(greatest(d.n_tokens, 0), 2048) AS need,
               coalesce(list_position(list_transform(p.rem,
                 r -> r >= least(greatest(d.n_tokens, 0), 2048)), true), 0)
                 AS ix
             FROM pack p JOIN d ON d.rn = p.rn + 1
           ) q
         )
         SELECT bin_id, doc_id, n_tokens, CAST(slot AS INT) AS slot
         FROM pack WHERE rn > 0 ORDER BY doc_id""",

    // Misra–Gries presence-guarantee gate (r13 verdict ask #7): by
    // the MG guarantee the semi-joined output equals the exact
    // heavy-hitter set — which is plain SQL
    "corpus_top_terms_guarantee" ->
      """WITH w AS (
           SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
           FROM documents
         ), w2 AS MATERIALIZED (
           SELECT term FROM w WHERE length(term) > 0
         ), n AS (SELECT count(*) AS n FROM w2)
         SELECT term, CAST(count(*) AS BIGINT) AS true_count
         FROM w2, n GROUP BY term, n.n
         HAVING count(*) * 257 > n.n
         ORDER BY term""",

    // cross-source duplication matrix: winnow fingerprints replayed
    // (the doc_winnow_md5 machinery), (source, fp) distinct, pair
    // counts + Szymkiewicz–Simpson overlap
    "dedup_source_matrix" ->
      s"""WITH fp AS (
           SELECT doc_id, unnest(sel) AS fp FROM (${winnowSql(5, 4)})
         ), sf AS MATERIALIZED (
           SELECT DISTINCT d.source, f.fp
           FROM fp f JOIN documents d USING (doc_id)
         ), tot AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM sf GROUP BY source)
         SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS shared_fingerprints,
           ta.n AS n_a, tb.n AS n_b,
           round(CAST(count(*) AS DOUBLE)
             / CAST(least(ta.n, tb.n) AS DOUBLE), 6) AS overlap
         FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
         JOIN tot ta ON ta.source = a.source
         JOIN tot tb ON tb.source = b.source
         GROUP BY 1, 2, ta.n, tb.n
         ORDER BY src_a, src_b""",

    // embedding health replay: same NaN/Inf screen, same index-order
    // double dot, same r6-scaled integer norm sums
    "emb_health" ->
      """WITH v AS (
           SELECT label,
             (embedding IS NULL) AS isn,
             CASE WHEN embedding IS NULL THEN NULL
               ELSE CAST(len(embedding) AS BIGINT) END AS dim,
             CASE WHEN embedding IS NULL THEN 0
               WHEN len(list_filter(embedding,
                 x -> isnan(x) OR isinf(x))) > 0 THEN 1 ELSE 0 END AS bad,
             CASE WHEN embedding IS NULL THEN NULL
               ELSE list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) END AS n2
           FROM embeddings
         ), x AS (
           SELECT label, isn, dim, bad,
             CASE WHEN isn OR bad = 1 THEN 0
               WHEN n2 = 0 THEN 1 ELSE 0 END AS zero,
             CASE WHEN isn OR bad = 1 THEN NULL
               ELSE CAST(round(sqrt(n2) * 1000000.0) AS BIGINT) END AS n6
           FROM v)
         SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN isn THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           min(dim) AS dim_min, max(dim) AS dim_max,
           CAST(sum(bad) AS BIGINT) AS n_nonfinite,
           CAST(sum(zero) AS BIGINT) AS n_zero,
           round(CAST(min(n6) AS DOUBLE) / 1000000.0, 6) AS norm_min,
           round(CAST(max(n6) AS DOUBLE) / 1000000.0, 6) AS norm_max,
           round(CAST(sum(n6) AS DOUBLE)
             / (1000000.0 * CAST(count(n6) AS DOUBLE)), 6) AS norm_avg
         FROM x GROUP BY label ORDER BY label""",

    // HTML round-trip replay: identical synth (boilerplate + escaped
    // body) and the identical strip chain — script/style/comment
    // blocks with content, tags to spaces, entity decode (&amp;
    // last), whitespace collapse. replace() for the literal entity
    // swaps, RE2 (?is)/lazy quantifiers for the blocks — the same
    // patterns Spark's Java regex runs.
    "doc_html_extract" ->
      """WITH h AS (
           SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
             || '</title><style>p{color:red}</style>'
             || '<script>var x=1;</script></head><body>'
             || '<!-- crawl artifact --><h1>Doc ' || CAST(doc_id AS VARCHAR)
             || ' &amp; friends</h1><p>'
             || replace(replace(replace(text,
                  '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
             || '</p><br/>&nbsp;</body></html>' AS html
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(html,
                       '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                   '(?s)<!--.*?-->', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
             '\s+', ' ', 'g')) AS extracted
         FROM h ORDER BY doc_id""",

    // mojibake round-trip replay: the same corruption sample appended
    // to the same docs, the same literal damage-sequence alternation
    // counted (both sides interpolate the ONE Scala constant — the
    // pattern and the synth can never drift apart)
    "doc_mojibake" ->
      s"""WITH t AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
               THEN text || '${graft.functions.Text.MojibakeSample}'
               ELSE text END AS tx
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(tx,
             '${graft.functions.Text.MojibakePattern}')) AS BIGINT)
             AS n_mojibake,
           len(regexp_extract_all(tx,
             '${graft.functions.Text.MojibakePattern}')) > 0 AS damaged
         FROM t ORDER BY doc_id""",

    // code-switching replay: per-language stopword occurrence counts
    // (the lang-ID lists), list-sorted for top/second, round-6 ratio
    "doc_lang_mix" -> {
      val langs = Seq(
        "en" -> graft.functions.Text.StopwordsEn,
        "fr" -> graft.functions.Text.StopwordsFr,
        "de" -> graft.functions.Text.StopwordsDe,
        "es" -> graft.functions.Text.StopwordsEs,
        "zh" -> graft.functions.Text.StopwordsZh)
      val hitCols = langs.map { case (l, ws) =>
        s"""CAST(len(list_filter(words, w -> w IN (${
          ws.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS hits_$l"""
      }.mkString(",\n             ")
      val arr = langs.map { case (l, _) => s"hits_$l" }.mkString(", ")
      s"""WITH w AS (
           SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ') AS words
           FROM documents
         ), hx AS (
           SELECT doc_id,
             $hitCols
           FROM w
         ), sx AS (
           SELECT doc_id,
             list_sort([$arr], 'DESC') AS srt,
             CAST(len(list_filter([$arr], h -> h > 0)) AS BIGINT)
               AS n_langs_hit
           FROM hx)
         SELECT doc_id, srt[1] AS top_hits, srt[2] AS second_hits,
           n_langs_hit,
           round(CASE WHEN srt[1] > 0 THEN
             CAST(srt[2] AS DOUBLE) / CAST(srt[1] AS DOUBLE) END, 6)
             AS mix_ratio,
           (srt[1] > 0 AND srt[2] * 3 >= srt[1]) AS mixed
         FROM sx ORDER BY doc_id"""
    },

    // streaming mojibake gate: the damaged docs (every 7th, by the
    // shared synthesis) drop at the door — the surviving corpus is
    // exactly the clean documents
    "stream_mojibake_gate" ->
      """SELECT doc_id, text FROM documents
         WHERE doc_id % 7 <> 0 ORDER BY doc_id""",

    // n-gram diversity replay: the gramsSql shingle convention
    // (sub-n docs -> one whole-text shingle) per source, one
    // count/count-distinct rollup per n
    "corpus_ngram_diversity" -> {
      val blocks = Seq(1, 2, 3).map { n =>
        s"""SELECT source, CAST($n AS BIGINT) AS n,
              unnest(CASE WHEN len(ws) < $n THEN [array_to_string(ws, ' ')]
                ELSE [array_to_string(ws[i+1:i+$n], ' ')
                      for i in range(0, len(ws) - $n + 1)] END) AS g
            FROM base"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH base AS MATERIALIZED (
           SELECT source,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ') AS ws
           FROM documents
         ), gn AS (
           $blocks
         )
         SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
           CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           round(CAST(count(DISTINCT g) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS diversity
         FROM gn GROUP BY source, n ORDER BY source, n"""
    },

    // tokenizer fertility replay: the doc_token_count word/BPE-proxy
    // expressions rolled up per source, two round-6 divisions
    "corpus_fertility" ->
      """WITH t AS (
           SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE CAST(len(string_split_regex(trim(text), '\s+'))
                 AS BIGINT) END AS nw,
             CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(text, '[A-Za-z0-9]+'),
                 w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
               + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
               AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           round(CASE WHEN sum(nw) > 0 THEN
             CAST(sum(nt) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) END, 6)
             AS fertility,
           round(CASE WHEN sum(nt) > 0 THEN
             CAST(sum(nc) AS DOUBLE) / CAST(sum(nt) AS DOUBLE) END, 6)
             AS chars_per_token
         FROM t GROUP BY source ORDER BY source""",

    // ---- URL canonicalization family (r14 wave 7) ----
    // the shared urlCanonSql fragment replays Url.synthesize (the
    // deterministic fixture) + Url.canonicalize rules 1-7 with the
    // SAME RE2 parts pattern the Spark side compiles
    "doc_url_normalize" ->
      s"""SELECT doc_id, url_raw, url_canon, domain
          FROM ($urlCanonSql) ORDER BY doc_id""",

    "dedup_url" ->
      s"""SELECT url_canon, CAST(count(*) AS BIGINT) AS n_dups,
            min(doc_id) AS keeper_doc
          FROM ($urlCanonSql)
          GROUP BY url_canon ORDER BY url_canon""",

    "corpus_domain_stats" ->
      s"""WITH u AS ($urlCanonSql),
            t AS (SELECT doc_id, $nWordsSql AS n_tokens
                  FROM documents)
          SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(DISTINCT url_canon) AS BIGINT) AS n_urls,
            CAST(sum(n_tokens) AS BIGINT) AS token_sum,
            CAST(round(count(*) * 1000000.0
              / sum(count(*)) OVER ()) AS BIGINT) AS share_ppm
          FROM u JOIN t USING (doc_id)
          GROUP BY domain ORDER BY domain""",

    // ---- (ScalaTest only) -> graded (r14 wave 8) ----
    "stg_derived_metrics" ->
      """SELECT l_orderkey, l_linenumber,
           l_returnflag || '/' || l_linestatus AS status_code,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))
             * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    // the two-day Versioned.upsert fold: v1 = latest-wins dedup of
    // the doubled-tracking snapshot; v2 = v1 keys untouched by day 2
    // + the day-2 batch (replace-by-key). Both versions emitted.
    "versioned_upsert" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate
           FROM orders
         ), d1 AS (
           SELECT *, CAST(1 AS BIGINT) AS ingest_seq FROM o
           WHERE o_orderkey % 3 <> 0
           UNION ALL
           SELECT o_orderkey, o_custkey, 'X', o_totalprice,
             o_orderdate, CAST(2 AS BIGINT)
           FROM o WHERE o_orderkey % 6 = 1
         ), v1 AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, ingest_seq
           FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                   ORDER BY ingest_seq DESC) AS rn FROM d1)
           WHERE rn = 1
         ), d2 AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 5.0 AS o_totalprice, o_orderdate,
             CAST(3 AS BIGINT) AS ingest_seq
           FROM o WHERE o_orderkey % 2 = 0
         ), v2 AS (
           SELECT * FROM v1
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d2)
           UNION ALL SELECT * FROM d2)
         SELECT *, CAST(1 AS BIGINT) AS version FROM v1
         UNION ALL SELECT *, CAST(2 AS BIGINT) FROM v2
         ORDER BY version, o_orderkey""",

    // ---- streaming URL-dedup ingest gate (r14 wave 9) ----
    // keep-first at the door under id-ordered arrival ≡ the batch
    // keeper set: min doc_id per canonical URL
    "stream_url_gate" ->
      s"""SELECT min(doc_id) AS doc_id, url_canon
          FROM ($urlCanonSql)
          GROUP BY url_canon ORDER BY doc_id""",

    // ---- perceptual-hash image dedup (r14 wave 10) ----
    // round-trip synthesis: pixel content is a pure function of
    // doc_id % 23 and aHash is scale-invariant across the 2x
    // re-upload variant, so the hash groups ARE the mod classes;
    // the hash arithmetic itself is pinned in MultimodalSpec
    "multimodal_phash_dedup" ->
      """SELECT min(doc_id) AS keeper_media,
           CAST(count(*) AS BIGINT) AS n_dups
         FROM documents GROUP BY doc_id % 23 ORDER BY keeper_media""",

    // ---- Markdown -> text extraction (r14 wave 11) ----
    // the identical synth + strip chain; DuckDB spells Spark's $1 as
    // \1 and needs the explicit 'g' flag
    "doc_markdown_extract" ->
      """WITH m AS (
           SELECT doc_id,
             '## Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
             || '> quoted **bold** _note_' || chr(10)
             || '- item [Link ' || CAST(doc_id AS VARCHAR)
             || '](https://ex.com/' || CAST(doc_id AS VARCHAR) || ')'
             || chr(10)
             || '```' || chr(10) || 'secret ' || CAST(doc_id AS VARCHAR)
             || chr(10) || '```' || chr(10)
             || text || ' `tick`' || chr(10)
             || '---' || chr(10) AS md
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(md,
                               '(?s)```.*?```', ' ', 'g'),
                             '`([^`]*)`', '\1', 'g'),
                           '!\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                         '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                       '(?m)^#{1,6}[ \t]*', '', 'g'),
                     '(?m)^>[ \t]?', '', 'g'),
                   '(?m)^[ \t]*[-*+][ \t]+', '', 'g'),
                 '(?m)^(-{3,}|\*{3,})[ \t]*$', ' ', 'g'),
               '[*_]{1,3}', '', 'g'),
             '\s+', ' ', 'g')) AS extracted
         FROM m ORDER BY doc_id""",

    // ---- near-dup threshold sweep (r14 wave 12) ----
    // the dedup_ngram_jaccard replay at the loosest threshold,
    // banded and cumulated on the band rollup
    "dedup_threshold_sweep" ->
      s"""WITH sh AS (
           SELECT doc_id AS id, list_distinct(
             CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             ELSE list_transform(generate_series(1, len(words) - 2),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
           FROM (SELECT doc_id, string_split($norm, ' ') AS words
                 FROM documents)
         ), ex AS (
           SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram
           FROM sh
         ), pairs AS (
           SELECT jaccard FROM (
             SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS DOUBLE)
                 / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
             FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
             GROUP BY a.id, b.id, a.cnt, b.cnt)
           WHERE jaccard >= 0.05
         ), bands AS (
           SELECT CAST(floor(jaccard * 10) AS INTEGER) AS band,
             count(*) AS n_pairs
           FROM pairs GROUP BY 1)
         SELECT band, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY band DESC) AS BIGINT)
             AS n_pairs_cum
         FROM bands ORDER BY band""",

    // ---- ER blocking-quality scorecard (r14 wave 15) ----
    // truth = the naive banded quadratic (affordable here); blocked
    // coverage = truth pairs sharing the last-word block key;
    // comparisons = unsplit per-block m(m-1)/2
    "er_blocking_eval" ->
      """WITH s AS (
           SELECT p_partkey AS id, p_name AS nm,
             ws[len(ws)] AS bk
           FROM (SELECT p_partkey, p_name,
                   string_split(p_name, ' ') AS ws
                 FROM part WHERE p_partkey % 4 = 0)
         ), nrec AS (SELECT count(*) AS n_records FROM s
         ), ncmp AS (
           SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_compared
           FROM (SELECT bk, count(*) AS m FROM s GROUP BY bk)
         ), t AS (
           SELECT count(*) AS n_true,
             CAST(sum(CASE WHEN a.bk = b.bk THEN 1 ELSE 0 END)
               AS BIGINT) AS n_blocked_true
           FROM s a JOIN s b
             ON a.id < b.id AND abs(length(a.nm) - length(b.nm)) <= 2
           WHERE levenshtein(a.nm, b.nm) <= 2)
         SELECT CAST(n_records AS BIGINT) AS n_records,
           CAST(n_records * (n_records - 1) // 2 AS BIGINT)
             AS n_all_pairs,
           n_compared, CAST(n_true AS BIGINT) AS n_true,
           n_blocked_true,
           CAST(round(n_blocked_true * 1000000.0 / n_true) AS BIGINT)
             AS pc_ppm,
           CAST(round((1.0 - n_compared
               / (n_records * (n_records - 1) / 2.0)) * 1000000.0)
             AS BIGINT) AS rr_ppm
         FROM nrec, ncmp, t""",

    // ---- zero-copy shallow clone (r14 wave 14) ----
    // both heads replayed as set algebra over orders: src head =
    // v1 ∪ evens-of-%3 ∪ 'S'-batch; clone head = src v2 ∪ 'C'-batch
    "versioned_clone" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate
           FROM orders
         ), v2 AS (
           SELECT * FROM o WHERE o_orderkey % 3 <> 0
           UNION ALL
           SELECT * FROM o
           WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 = 0)
         SELECT *, 'src' AS side FROM (
           SELECT * FROM v2
           UNION ALL
           SELECT o_orderkey, o_custkey, 'S', o_totalprice, o_orderdate
           FROM o WHERE o_orderkey % 7 = 0)
         UNION ALL
         SELECT *, 'clone' FROM (
           SELECT * FROM v2
           UNION ALL
           SELECT o_orderkey, o_custkey, 'C', o_totalprice, o_orderdate
           FROM o WHERE o_orderkey % 5 = 0)
         ORDER BY side, o_orderkey, o_orderstatus""",

    // ---- span-level decontamination (r14 wave 13) ----
    // positions are 1-based here, 0-based in Spark; the REWRITE is
    // what grades, so each engine just masks the same WORDS. Short
    // docs shingle as one whole-text gram covering every word.
    "decontamination_redact" ->
      s"""WITH w AS (
           SELECT doc_id, string_split($norm, ' ') AS words
           FROM documents
         ), ev AS (
           SELECT DISTINCT unnest(grams) AS gram
           FROM (${gramsSql(3, distinct = true)})
           WHERE doc_id % 10 = 0
         ), pg AS (
           SELECT doc_id, unnest(
             CASE WHEN len(words) < 3
               THEN [struct_pack(p := 1, g := array_to_string(words, ' '))]
               ELSE [struct_pack(p := i,
                       g := words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                     for i in range(1, len(words) - 1)] END) AS pge
           FROM w WHERE doc_id % 10 <> 0
         ), hit AS (
           SELECT pg.doc_id, unnest(generate_series(pge.p,
             least(pge.p + 2, len(w.words)))) AS m
           FROM pg JOIN w USING (doc_id) JOIN ev ON pge.g = ev.gram
         ), msk AS (
           SELECT doc_id, list_sort(list_distinct(list(m))) AS mask
           FROM hit GROUP BY doc_id)
         SELECT w.doc_id,
           array_to_string(list_transform(
             generate_series(1, len(w.words)),
             i -> CASE WHEN msk.mask IS NOT NULL
                    AND list_contains(msk.mask, i)
                  THEN '[MASKED]' ELSE w.words[i] END), ' ')
             AS text_redacted,
           CAST(coalesce(len(msk.mask), 0) AS BIGINT) AS n_masked
         FROM w LEFT JOIN msk USING (doc_id)
         WHERE w.doc_id % 10 <> 0
         ORDER BY w.doc_id""",

    // stream-static enrichment must equal the plain batch left join —
    // the stream side holds no state, the dim side joins per batch
    "stream_enrich_static" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           e.event_type, e.value, c.c_name AS customer_name,
           c.c_mktsegment AS market_segment
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",
  )

  /** The SRM replay shared by the batch key and its streaming-monitor
    * twin (the accumulated unit set makes both verdicts identical).
    */
  private def srmSql: String =
    """WITH u AS (SELECT DISTINCT event_type AS k, user_id FROM events
         ), a AS (
           SELECT k,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_b
           FROM u GROUP BY k HAVING count(*) > 0
         ), c AS (
           SELECT k, n_a, n_b,
             CAST(n_a + n_b AS DOUBLE) * 0.5 AS ea,
             CAST(n_a + n_b AS DOUBLE) * 0.5 AS eb
           FROM a
         ), x AS (
           SELECT k, n_a, n_b,
             (CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea) / ea
               + (CAST(n_b AS DOUBLE) - eb) * (CAST(n_b AS DOUBLE) - eb)
                 / eb AS chi2
           FROM c
         ), pz AS (
           SELECT k, n_a, n_b, chi2, sqrt(chi2) AS az,
             1.0 / (1.0 + 0.2316419 * sqrt(chi2)) AS t
           FROM x
         ), pp AS (
           SELECT k, n_a, n_b, chi2,
             least(1.0, 2.0 * (exp(-0.5 * az * az) / 2.5066282746310002)
               * (t * (0.319381530 + t * (-0.356563782
                 + t * (1.781477937 + t * (-1.821255978
                   + t * 1.330274429)))))) AS p
           FROM pz)
         SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(chi2, 6) AS chi2, round(p, 6) AS p,
           round(p, 6) < 0.001 AS srm
         FROM pp ORDER BY event_type"""
}
