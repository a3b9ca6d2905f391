package graft

import graft.OracleFragments._

/** Oracle-registry shard 6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard6 {
  val m: Map[String, String] = Map(
      // gains replay: same (score desc, id) ntile, integer cum/total
      // sums, the three divisions
      "model_gains" ->
        """WITH u AS (
             SELECT user_id, count(*) AS s,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS y,
               user_id % 2 AS k
             FROM events GROUP BY user_id
           ), b AS (
             SELECT k, CAST(ntile(10) OVER (PARTITION BY k
               ORDER BY s DESC, user_id) AS BIGINT) AS bucket, y
             FROM u
           ), g AS (
             SELECT k, bucket, count(*) AS n_units,
               CAST(sum(y) AS BIGINT) AS n_pos
             FROM b GROUP BY 1, 2
           ), w AS (
             SELECT *,
               CAST(sum(n_pos) OVER (PARTITION BY k ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_pos,
               CAST(sum(n_pos) OVER (PARTITION BY k) AS BIGINT) AS tot_pos,
               CAST(sum(n_units) OVER (PARTITION BY k) AS BIGINT) AS tot_n
             FROM g)
           SELECT k AS cohort, bucket, n_units, n_pos,
             round(CAST(n_pos AS DOUBLE) / CAST(n_units AS DOUBLE), 6)
               AS rate,
             round(CASE WHEN tot_pos > 0 THEN CAST(cum_pos AS DOUBLE)
               / CAST(tot_pos AS DOUBLE) END, 6) AS cum_capture,
             round(CASE WHEN tot_pos > 0 THEN
               CAST(n_pos * tot_n AS DOUBLE)
               / CAST(n_units * tot_pos AS DOUBLE) END, 6) AS lift
           FROM w ORDER BY cohort, bucket""",

      // WoE/IV replay: identical smoothed shares, ln through the
      // round-6 guard, contributions on the ROUNDED woe, the same
      // 1e6-scaled integer IV sum
      "dq_woe_iv" ->
        """WITH e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type
             FROM events
           ), f AS (
             SELECT user_id, event_type AS first_event FROM (
               SELECT user_id, event_type, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM e) WHERE rn = 1
           ), c AS (
             SELECT user_id, CAST(max(CASE WHEN event_type = 'purchase'
               THEN 1 ELSE 0 END) AS BIGINT) AS converted
             FROM e GROUP BY 1
           ), u AS (
             SELECT f.first_event, c.converted FROM f JOIN c USING (user_id)
           ), per AS (
             SELECT first_event, count(*) AS n_units,
               CAST(sum(converted) AS BIGINT) AS n_pos,
               CAST(count(*) - sum(converted) AS BIGINT) AS n_neg
             FROM u GROUP BY 1
           ), tot AS (
             SELECT CAST(sum(n_pos) AS BIGINT) AS p,
               CAST(sum(n_neg) AS BIGINT) AS n
             FROM per
           ), w AS (
             SELECT per.*,
               (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(t.p AS DOUBLE) + 0.5)
                 AS gs,
               (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(t.n AS DOUBLE) + 0.5)
                 AS bs
             FROM per CROSS JOIN tot t
           ), w2 AS (SELECT *, round(ln(gs / bs), 6) AS woe FROM w
           ), w3 AS (
             SELECT *, round((gs - bs) * woe, 6) AS iv_contrib FROM w2
           ), w4 AS (
             SELECT *, CAST(round(iv_contrib * 1000000.0) AS BIGINT) AS s6
             FROM w3
           ), iv AS (SELECT CAST(sum(s6) AS BIGINT) AS iv6 FROM w4)
           SELECT first_event, n_units, n_pos, n_neg, woe, iv_contrib,
             round(CAST(iv.iv6 AS DOUBLE) / 1000000.0, 6) AS iv_total
           FROM w4 CROSS JOIN iv ORDER BY first_event""",

      // Spearman replay: the same doubled tie-averaged ranks,
      // HUGEINT sums (≡ Spark's decimal(38)), the same double tree
      "corr_spearman" ->
        """WITH rev AS (
             SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
             FROM orders GROUP BY 1
           ), j AS (
             SELECT n.n_name AS nation, c.c_acctbal AS x, r.rev AS y
             FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
           ), rk AS (
             SELECT nation,
               CAST(2 * (rank() OVER (PARTITION BY nation ORDER BY x) - 1)
                 + count(*) OVER (PARTITION BY nation, x) + 1 AS HUGEINT)
                 AS rx2,
               CAST(2 * (rank() OVER (PARTITION BY nation ORDER BY y) - 1)
                 + count(*) OVER (PARTITION BY nation, y) + 1 AS HUGEINT)
                 AS ry2
             FROM j
           ), s AS (
             SELECT nation, count(*) AS n, sum(rx2) AS sx, sum(ry2) AS sy,
               sum(rx2 * ry2) AS sxy, sum(rx2 * rx2) AS sxx,
               sum(ry2 * ry2) AS syy
             FROM rk GROUP BY 1 HAVING count(*) >= 2
           ), c AS (
             SELECT nation, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
               CAST(n * syy - sy * sy AS DOUBLE) AS dy
             FROM s)
           SELECT nation, n,
             round(CASE WHEN dx > 0 AND dy > 0
               THEN num / sqrt(dx * dy) END, 6) AS rho
           FROM c ORDER BY nation""",

      // χ² replay: the full R×C grid with zero cells, the same
      // per-cell double tree, 1e6-scaled integer contribution sum
      "dq_chi2" ->
        """WITH obs AS (
             SELECT c_mktsegment AS a, c_nationkey AS b,
               CAST(count(*) AS BIGINT) AS o
             FROM customer GROUP BY 1, 2
           ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
           ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
           ), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
           ), grid AS (
             SELECT ra.a, cb.b, ra.r, cb.c, coalesce(obs.o, 0) AS o
             FROM ra CROSS JOIN cb
               LEFT JOIN obs ON ra.a = obs.a AND cb.b = obs.b
           ), cells AS (
             SELECT g.o,  g.a, g.b,
               CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
                 / CAST(nn.n AS DOUBLE) AS e
             FROM grid g CROSS JOIN nn
           ), sc AS (
             SELECT a, b,
               CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
                 / e * 1000000.0) AS BIGINT) AS s6
             FROM cells)
           SELECT nn.n, x.n_rows_cat, x.n_cols_cat,
             (x.n_rows_cat - 1) * (x.n_cols_cat - 1) AS dof,
             round(CAST(x.chi6 AS DOUBLE) / 1000000.0, 6) AS chi2,
             round(CASE WHEN least(x.n_rows_cat, x.n_cols_cat) > 1 THEN
               sqrt((CAST(x.chi6 AS DOUBLE) / 1000000.0)
                 / (CAST(nn.n AS DOUBLE)
                   * CAST(least(x.n_rows_cat, x.n_cols_cat) - 1 AS DOUBLE)))
               END, 6) AS cramers_v
           FROM (
             SELECT count(DISTINCT a) AS n_rows_cat,
               count(DISTINCT b) AS n_cols_cat,
               CAST(sum(s6) AS BIGINT) AS chi6
             FROM sc) x CROSS JOIN nn""",

      // U replay: doubled tie-averaged ranks (integer), exact tie
      // term T = Σ(t³−t), the same fixed double tree for σ and z
      "ab_mannwhitney" ->
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
             FROM c)
           SELECT hod, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(u2 AS DOUBLE) / 2.0 AS u_a,
             round(CASE WHEN s2 > 0 THEN
               (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)
               / (2.0 * sqrt(s2)) END, 6) AS z
           FROM s ORDER BY hod""",

      // Welch replay: HUGEINT-exact n/Σv/Σv² per group, the same
      // fixed double tree for se², t, and the Satterthwaite df
      "ab_welch_t" ->
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
             FROM u GROUP BY 1
             HAVING sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) >= 2
               AND sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) >= 2
           ), s AS (
             SELECT k, n_a, n_b,
               CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
               (CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                   / CAST(n_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                 AS se2a,
               (CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                   / CAST(n_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                 AS se2b
             FROM a)
           SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(sad / CAST(n_a AS DOUBLE), 6) AS mean_a,
             round(sbd / CAST(n_b AS DOUBLE), 6) AS mean_b,
             round(CASE WHEN se2a + se2b > 0 THEN
               (sad / CAST(n_a AS DOUBLE) - sbd / CAST(n_b AS DOUBLE))
               / sqrt(se2a + se2b) END, 6) AS t,
             round(CASE WHEN se2a + se2b > 0 THEN
               (se2a + se2b) * (se2a + se2b)
               / (se2a * se2a / (CAST(n_a AS DOUBLE) - 1.0)
                 + se2b * se2b / (CAST(n_b AS DOUBLE) - 1.0)) END, 6)
               AS df_w
           FROM s ORDER BY event_type""",

      // CUPED replay: exact HUGEINT sufficient statistics, the same
      // one-division θ and fixed double trees
      "ab_cuped" ->
        """WITH u AS (
             SELECT event_type AS k, user_id,
               CAST(user_id % 2 AS VARCHAR) AS g,
               sum(CASE WHEN CAST(ts AS TIMESTAMP)
                 <= TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS x,
               sum(CASE WHEN CAST(ts AS TIMESTAMP)
                 > TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS y
             FROM events GROUP BY 1, 2, 3
           ), a AS (
             SELECT k,
               sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN g = '1' THEN CAST(x AS HUGEINT) ELSE 0 END)
                 AS xa,
               sum(CASE WHEN g = '0' THEN CAST(x AS HUGEINT) ELSE 0 END)
                 AS xb,
               sum(CASE WHEN g = '1' THEN CAST(y AS HUGEINT) ELSE 0 END)
                 AS ya,
               sum(CASE WHEN g = '0' THEN CAST(y AS HUGEINT) ELSE 0 END)
                 AS yb,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy
             FROM u GROUP BY 1
             HAVING sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) >= 2
               AND sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) >= 2
           ), e AS (
             SELECT k, n_a, n_b,
               CAST(n_a + n_b AS HUGEINT) * sxy - (xa + xb) * (ya + yb)
                 AS num,
               CAST(n_a + n_b AS HUGEINT) * sxx - (xa + xb) * (xa + xb)
                 AS denx,
               CAST(n_a + n_b AS HUGEINT) * syy - (ya + yb) * (ya + yb)
                 AS deny,
               CAST(ya AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(yb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff_raw,
               CAST(xa AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(xb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff_x
             FROM a)
           SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(CASE WHEN denx > 0 THEN
               CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END, 6)
               AS theta,
             round(diff_raw, 6) AS diff_raw,
             round(CASE WHEN denx > 0 THEN diff_raw
               - CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) * diff_x
               END, 6) AS diff_cuped,
             round(CASE WHEN denx > 0 AND deny > 0 THEN
               CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS var_reduction
           FROM e ORDER BY event_type""",

      // MI replay: observed cells only (x·ln x → 0 at zero), each
      // term rounded-6 and 1e6-scaled, order-free integer sums
      "dq_mutual_info" ->
        """WITH f AS (
             SELECT event_type AS a, hour(CAST(ts AS TIMESTAMP)) AS b
             FROM events
           ), obs AS (
             SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM f GROUP BY 1, 2
           ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
           ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
           ), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
           ), ha AS (
             SELECT CAST(sum(CAST(round(
               -(CAST(r AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(r AS DOUBLE) / CAST(nn.n AS DOUBLE))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS h6
             FROM ra CROSS JOIN nn
           ), hb AS (
             SELECT CAST(sum(CAST(round(
               -(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS h6
             FROM cb CROSS JOIN nn
           ), j AS (
             SELECT obs.o, ra.r, cb.c, nn.n
             FROM obs JOIN ra ON obs.a = ra.a JOIN cb ON obs.b = cb.b
               CROSS JOIN nn
           ), agg AS (
             SELECT
               CAST(sum(CAST(round(
                 -(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS hab6,
               CAST(sum(CAST(round(
                 (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS mi6,
               CAST(count(*) AS BIGINT) AS n_cells
             FROM j)
           SELECT nn.n, agg.n_cells,
             CAST(ha.h6 AS DOUBLE) / 1000000.0 AS h_a,
             CAST(hb.h6 AS DOUBLE) / 1000000.0 AS h_b,
             CAST(agg.hab6 AS DOUBLE) / 1000000.0 AS h_ab,
             CAST(agg.mi6 AS DOUBLE) / 1000000.0 AS mi,
             round(CASE WHEN least(ha.h6, hb.h6) > 0 THEN
               CAST(agg.mi6 AS DOUBLE)
                 / CAST(least(ha.h6, hb.h6) AS DOUBLE) END, 6) AS nmi
           FROM agg CROSS JOIN nn CROSS JOIN ha CROSS JOIN hb""",

      // OLS replay: the same five integer sums, the same double
      // combination tree
      "events_ols_trend" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), ix AS (
             SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS x
             FROM g
           ), s AS (
             SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
             FROM ix GROUP BY 1 HAVING count(*) >= 2
           ), c AS (
             SELECT event_type, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy,
               sx, sy
             FROM s)
           SELECT event_type, n, round(num / dx, 6) AS slope,
             round((CAST(sy AS DOUBLE) - (num / dx) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE), 6) AS intercept,
             round(CASE WHEN dy > 0 THEN (num * num) / (dx * dy) END, 6) AS r2
           FROM c ORDER BY event_type""",

      // decomposition replay: identical integer window sums, the same
      // division/subtraction tree — resid intentionally repeats the
      // unrounded trend/seasonal expressions
      "events_seasonal_decompose" ->
        s"$seasonalDecomposeCoreSql ORDER BY event_type, hr",

      // the MAD rule over the decomposition's ROUNDED residual —
      // med/mad via quantile_cont ≡ Spark's exact percentile, the
      // events_mad_outliers round-6 compare guard
      "events_stl_anomaly" ->
        s"""WITH dec AS ($seasonalDecomposeCoreSql
           ), sc AS (
             SELECT *, CAST(round(resid * 1000000) AS BIGINT) AS r6 FROM dec
           ), med AS (
             SELECT event_type, quantile_cont(r6, 0.5) AS med_s
             FROM sc GROUP BY 1
           ), dev AS (
             SELECT d.*, m.med_s, abs(d.r6 - m.med_s) AS dev_s
             FROM sc d JOIN med m USING (event_type)
           ), mad AS (
             SELECT event_type, quantile_cont(dev_s, 0.5) AS mad_s
             FROM dev GROUP BY 1)
           SELECT d.event_type, d.hr, d.value, d.resid,
             round(d.med_s / 1000000.0, 6) AS med,
             round(a.mad_s / 1000000.0, 6) AS mad,
             d.dev_s > 3.0 * a.mad_s AS is_anomaly
           FROM dev d JOIN mad a USING (event_type)
           ORDER BY d.event_type, d.hr""",

      // ACF replay: C/H/T from a rn self-join per lag (≡ the lead
      // columns), the same n²-scaled integer statistics and the
      // same double tree
      "events_acf" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), ix AS (
             SELECT event_type, CAST(y AS BIGINT) AS y,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t
             FROM g
           ), base AS (
             SELECT event_type, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS sxx
             FROM ix GROUP BY 1
           ), lags(k) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
             (CAST(3 AS BIGINT))
           ), pairs AS (
             SELECT a.event_type, l.k,
               CAST(sum(a.y * b.y) AS BIGINT) AS c,
               CAST(sum(a.y) AS BIGINT) AS h,
               CAST(sum(b.y) AS BIGINT) AS tl
             FROM ix a CROSS JOIN lags l
               JOIN ix b ON a.event_type = b.event_type AND b.t = a.t + l.k
             GROUP BY 1, 2)
           SELECT p.event_type, p.k AS lag, b.n,
             round(CASE WHEN CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE)
                 * CAST(b.sxx AS DOUBLE)
                 - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)) > 0 THEN
               (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE) * CAST(p.c AS DOUBLE)
                 - CAST(b.n AS DOUBLE) * CAST(b.s AS DOUBLE)
                   * (CAST(p.h AS DOUBLE) + CAST(p.tl AS DOUBLE))
                 + (CAST(b.n AS DOUBLE) - CAST(p.k AS DOUBLE))
                   * CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
               / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE)
                 * CAST(b.sxx AS DOUBLE)
                 - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)))
               END, 6) AS acf
           FROM pairs p JOIN base b USING (event_type)
           ORDER BY event_type, lag""",

      // forecast-accuracy replay: same evaluation window (rn >
      // season), integer Σ|e|/Σe², rounded-term sMAPE sum, one
      // division each
      "events_forecast_accuracy" ->
        """WITH g AS (
             SELECT event_type AS k,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), w AS (
             SELECT k, CAST(y AS BIGINT) AS y,
               row_number() OVER (PARTITION BY k ORDER BY hr) AS rn,
               lag(y, 1) OVER (PARTITION BY k ORDER BY hr) AS f1,
               lag(y, 24) OVER (PARTITION BY k ORDER BY hr) AS fs
             FROM g
           ), e AS (
             SELECT k, y, abs(y - f1) AS en_abs, 'naive' AS model,
               CAST(f1 AS BIGINT) AS f
             FROM w WHERE rn > 24
             UNION ALL
             SELECT k, y, abs(y - f1) AS en_abs, 'seasonal_naive' AS model,
               CAST(fs AS BIGINT) AS f
             FROM w WHERE rn > 24
           ), t AS (
             SELECT k, model, y - f AS e, en_abs,
               CASE WHEN abs(y) + abs(f) > 0 THEN
                 CAST(round(2.0 * abs(CAST(y - f AS DOUBLE))
                   / (abs(CAST(y AS DOUBLE)) + abs(CAST(f AS DOUBLE)))
                   * 1000000.0) AS BIGINT)
               ELSE 0 END AS s6
             FROM e
           ), a AS (
             SELECT k, model, count(*) AS n_eval,
               CAST(sum(abs(e)) AS BIGINT) AS sae,
               sum(CAST(e AS HUGEINT) * e) AS sse,
               CAST(sum(s6) AS BIGINT) AS smape6,
               CAST(sum(en_abs) AS BIGINT) AS san
             FROM t GROUP BY 1, 2)
           SELECT k AS event_type, model, CAST(n_eval AS BIGINT) AS n_eval,
             round(CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS mae,
             round(sqrt(CAST(sse AS DOUBLE) / CAST(n_eval AS DOUBLE)), 6)
               AS rmse,
             round(CAST(smape6 AS DOUBLE) / 1000000.0
               / CAST(n_eval AS DOUBLE), 6) AS smape,
             round(CASE WHEN san > 0 THEN
               CAST(sae AS DOUBLE) / CAST(san AS DOUBLE) END, 6) AS mase
           FROM a ORDER BY event_type, model""",

      // M4 replay: the four per-bucket extreme selections as rank-1
      // windows with the identical tie-breaks, distinct union
      "events_m4_downsample" ->
        """WITH g AS (
             SELECT event_type AS k,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2
           ), b AS (
             SELECT k, hr, y,
               date_diff('second', TIMESTAMP '1970-01-01', hr) // 21600
                 AS bucket
             FROM g
           ), r AS (
             SELECT k, bucket, hr, y,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY hr) AS rf,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY hr DESC) AS rl,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY y, hr) AS rmin,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY y DESC, hr DESC) AS rmax
             FROM b)
           SELECT DISTINCT k AS event_type, bucket, hr AS ts, y AS value
           FROM r WHERE 1 IN (rf, rl, rmin, rmax)
           ORDER BY event_type, ts, value""",

      // debounce replay: the survivor chain as a recursive CTE —
      // each kept row's successor is the minimal-rn event ≥ gap
      // after it (sec non-decreasing in rn ⇒ identical to the fold);
      // the streaming gate accumulates the same survivors
      "events_debounce" -> debounceOracleSql,
      "stream_debounce" -> debounceOracleSql,

      // burstiness replay: integer-second gaps, exact sums, the same
      // σ/μ/B double trees
      "events_burstiness" ->
        """WITH s AS (
             SELECT user_id AS k,
               date_diff('second', TIMESTAMP '1970-01-01',
                 CAST(ts AS TIMESTAMP)) AS sec
             FROM events
           ), g AS (
             SELECT k, sec - lag(sec) OVER (PARTITION BY k ORDER BY sec)
               AS gap
             FROM s
           ), a AS (
             SELECT k, count(*) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS sg,
               CAST(sum(gap * gap) AS BIGINT) AS qg
             FROM g WHERE gap IS NOT NULL GROUP BY 1
             HAVING count(*) >= 2
           ), e AS (
             SELECT k, n_gaps,
               CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
               sqrt((CAST(qg AS DOUBLE)
                 - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                   / CAST(n_gaps AS DOUBLE))
                 / CAST(n_gaps AS DOUBLE)) AS sigma
             FROM a)
           SELECT k AS user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
             round(mu, 6) AS mean_gap, round(sigma, 6) AS sd_gap,
             round(CASE WHEN sigma + mu > 0 THEN
               (sigma - mu) / (sigma + mu) END, 6) AS burstiness
           FROM e ORDER BY user_id""",

      // growth-accounting replay: distinct user-weeks, lag/lead
      // classification, churn capped at the corpus' last week
      "events_growth_accounting" ->
        """WITH uw AS (
             SELECT DISTINCT user_id AS u,
               date_diff('day', DATE '1970-01-05',
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
                 // 7 AS wk
             FROM events
           ), f AS (
             SELECT u, wk,
               lag(wk) OVER (PARTITION BY u ORDER BY wk) AS pv,
               lead(wk) OVER (PARTITION BY u ORDER BY wk) AS nx
             FROM uw
           ), mx AS (SELECT max(wk) AS mw FROM uw
           ), cls AS (
             SELECT wk, CASE WHEN pv IS NULL THEN 'new'
               WHEN wk - pv = 1 THEN 'retained'
               ELSE 'resurrected' END AS cls
             FROM f
             UNION ALL
             SELECT wk + 1, 'churned' FROM f CROSS JOIN mx
             WHERE (nx IS NULL OR nx > wk + 1) AND wk + 1 <= mw
           ), a AS (
             SELECT wk,
               CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_resurrected,
               CAST(sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_churned
             FROM cls GROUP BY 1)
           SELECT CAST(DATE '1970-01-05' + CAST(wk * 7 AS INT)
               AS TIMESTAMP) AS week_start,
             n_new, n_retained, n_resurrected, n_churned,
             round(CASE WHEN n_churned > 0 THEN
               CAST(n_new + n_resurrected AS DOUBLE)
               / CAST(n_churned AS DOUBLE) END, 6) AS quick_ratio
           FROM a ORDER BY week_start""",

      // revenue-bridge replay: exact-decimal (q, r) sums per
      // (brand, period), the identical effect trees
      "revenue_bridge" ->
        """WITH li AS (
             SELECT p.p_brand AS g,
               CASE WHEN year(l_shipdate) = 1997 THEN 0 ELSE 1 END AS per,
               CAST(l_quantity AS DECIMAL(12,2)) AS q,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 AS DECIMAL(18,4)) AS r
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             WHERE year(l_shipdate) IN (1997, 1998)
           ), a AS (
             SELECT g,
               sum(CASE WHEN per = 0 THEN q END) AS q0,
               sum(CASE WHEN per = 1 THEN q END) AS q1,
               sum(CASE WHEN per = 0 THEN r END) AS r0,
               sum(CASE WHEN per = 1 THEN r END) AS r1
             FROM li GROUP BY 1
           ), e AS (
             SELECT g, q0, q1, r0, r1,
               CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE) AS p0,
               CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE) AS p1,
               CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE) AS dq,
               q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
                 AS cont
             FROM a)
           SELECT g AS p_brand,
             CASE WHEN q0 IS NULL THEN 'new'
               WHEN q1 IS NULL THEN 'discontinued'
               ELSE 'continuing' END AS status,
             CAST(q0 AS DOUBLE) AS q0, CAST(q1 AS DOUBLE) AS q1,
             CAST(r0 AS DOUBLE) AS r0, CAST(r1 AS DOUBLE) AS r1,
             CAST(coalesce(r1, 0) - coalesce(r0, 0) AS DOUBLE) AS delta_r,
             round(CASE WHEN cont THEN dq * p0 END, 6) AS volume_effect,
             round(CASE WHEN cont THEN (p1 - p0) * CAST(q0 AS DOUBLE) END, 6)
               AS price_effect,
             round(CASE WHEN cont THEN dq * (p1 - p0) END, 6)
               AS cross_effect
           FROM e ORDER BY p_brand""",

      // KM replay: integer suffix-sum risk sets, then the product
      // recurrence step-by-step in a recursive CTE — the same
      // divide-then-multiply IEEE sequence the keyed fold executes
      "events_survival" ->
        """WITH RECURSIVE g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 AS k,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), tbl AS (
             SELECT k, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), risk AS (
             SELECT k, t, d,
               CAST(sum(m) OVER (PARTITION BY k ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM tbl
           ), er AS (
             SELECT k, t, n, d,
               row_number() OVER (PARTITION BY k ORDER BY t) AS rn
             FROM risk WHERE d >= 1
           ), s AS (
             SELECT k, t, n, d, rn,
               CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS surv
             FROM er WHERE rn = 1
             UNION ALL
             SELECT e.k, e.t, e.n, e.d, e.rn,
               s.surv * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE))
             FROM er e JOIN s ON e.k = s.k AND e.rn = s.rn + 1)
           SELECT k AS cohort, t AS t_duration, n AS n_risk,
             d AS n_events, surv AS survival
           FROM s ORDER BY cohort, t_duration""",

      // Nelson-Aalen replay: the same risk-set CTEs as events_survival
      // up to the event-time cut, then scaled increments + integer
      // running sum — a plain window, no recursion
      "survival_hazard" ->
        """WITH g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 AS k,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), tbl AS (
             SELECT k, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), risk AS (
             SELECT k, t, d,
               CAST(sum(m) OVER (PARTITION BY k ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM tbl
           ), hz AS (
             SELECT k, t, n, d,
               CAST(round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS h6
             FROM risk WHERE d >= 1)
           SELECT k AS cohort, t AS t_duration, n AS n_risk,
             d AS n_events,
             CAST(CAST(sum(h6) OVER (PARTITION BY k ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS DOUBLE) / 1000000.0 AS cum_hazard
           FROM hz ORDER BY cohort, t_duration""",

      // funnel-latency replay: the funnel's min-join chain carrying
      // BOTH endpoints, exact µs gaps, quantile_cont p50
      "events_funnel_latency" ->
        """WITH f AS (
             SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type IN ('view', 'click', 'purchase')
           ), s1 AS (
             SELECT user_id, min(ts) AS t1 FROM f
             WHERE event_type = 'view' GROUP BY user_id
           ), s2 AS (
             SELECT f.user_id, min(ts) AS t2, min(t1) AS t1
             FROM f JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND ts > t1 GROUP BY f.user_id
           ), s3 AS (
             SELECT f.user_id, min(ts) AS t3, min(t2) AS t2
             FROM f JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND ts > t2 GROUP BY f.user_id
           ), a1 AS (
             SELECT 'view' AS step_from, 'click' AS step_to,
               count(*) AS n_users,
               CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) AS sg,
               quantile_cont(epoch_us(t2) - epoch_us(t1), 0.5) AS p50
             FROM s2
           ), a2 AS (
             SELECT 'click' AS step_from, 'purchase' AS step_to,
               count(*) AS n_users,
               CAST(sum(epoch_us(t3) - epoch_us(t2)) AS BIGINT) AS sg,
               quantile_cont(epoch_us(t3) - epoch_us(t2), 0.5) AS p50
             FROM s3)
           SELECT step_from, step_to, CAST(n_users AS BIGINT) AS n_users,
             round(CAST(sg AS DOUBLE) / CAST(n_users AS DOUBLE)
               / 1000000.0, 6) AS mean_s,
             round(p50 / 1000000.0, 6) AS p50_s
           FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
           ORDER BY step_from""",

      // log-rank replay: the same zero-filled grid, integer suffix
      // risk sets, rounded-6/1e6-scaled E/V terms, one z/χ² tree
      "survival_logrank" ->
        """WITH g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 = 1 AS isa,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), per AS (
             SELECT isa, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), grid AS (
             SELECT s.isa, axis.t, coalesce(per.d, 0) AS d,
               coalesce(per.m, 0) AS m
             FROM (SELECT DISTINCT t FROM per) axis
             CROSS JOIN (VALUES (TRUE), (FALSE)) AS s(isa)
             LEFT JOIN per ON per.isa = s.isa AND per.t = axis.t
           ), risk AS (
             SELECT isa, t, d,
               CAST(sum(m) OVER (PARTITION BY isa ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM grid
           ), ab AS (
             SELECT x.t, x.d AS d1, x.n AS n1, y.d AS d2, y.n AS n2
             FROM risk x JOIN risk y ON x.t = y.t AND x.isa AND NOT y.isa
             WHERE x.d + y.d >= 1
           ), terms AS (
             SELECT d1, d2,
               CAST(round(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE) * 1000000.0) AS BIGINT) AS e6,
               CASE WHEN n1 + n2 > 1 THEN
                 CAST(round(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                   * CAST(n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
                   / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                     * (CAST(n1 + n2 AS DOUBLE) - 1.0))
                   * 1000000.0) AS BIGINT) ELSE 0 END AS v6
             FROM ab
           ), agg AS (
             SELECT CAST(sum(d1) AS BIGINT) AS d_a,
               CAST(sum(d2) AS BIGINT) AS d_b,
               CAST(sum(e6) AS BIGINT) AS se6,
               CAST(sum(v6) AS BIGINT) AS sv6
             FROM terms
           ), cnt AS (
             SELECT CAST(sum(CASE WHEN isa THEN m ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(sum(CASE WHEN NOT isa THEN m ELSE 0 END) AS BIGINT)
                 AS n_b
             FROM per
           ), zc AS (
             SELECT n_a, n_b, d_a, d_b, se6, sv6,
               (CAST(d_a AS DOUBLE) - CAST(se6 AS DOUBLE) / 1000000.0)
                 / sqrt(CAST(sv6 AS DOUBLE) / 1000000.0) AS zr
             FROM cnt CROSS JOIN agg)
           SELECT n_a, n_b, d_a, d_b,
             round(CAST(se6 AS DOUBLE) / 1000000.0, 6) AS e_a,
             round(CASE WHEN sv6 > 0 THEN zr END, 6) AS z,
             round(CASE WHEN sv6 > 0 THEN zr * zr END, 6) AS chi2
           FROM zc""",

      // Pettitt replay: tie-averaged ranks doubled to stay integer
      // (2·avg_rank = 2·(rank−1) + ties + 1), U_t an integer running
      // sum, K/argmax exact — the one double is the final p
      "events_pettitt" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS cnt
             FROM events GROUP BY 1, 2
           ), r AS (
             SELECT event_type, hr,
               2 * (rank() OVER (PARTITION BY event_type ORDER BY cnt) - 1)
                 + count(*) OVER (PARTITION BY event_type, cnt) + 1 AS r2,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM g
           ), u AS (
             SELECT event_type, hr, t, n,
               sum(r2) OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - t * (n + 1) AS u
             FROM r
           ), uf AS (SELECT * FROM u WHERE t < n
           ), k AS (
             SELECT event_type, max(abs(u)) AS k_stat FROM uf GROUP BY 1
           ), cp AS (
             SELECT uf.event_type, max(uf.n) AS n, min(uf.hr) AS cp_ts,
               max(k.k_stat) AS k_stat
             FROM uf JOIN k ON uf.event_type = k.event_type
               AND abs(uf.u) = k.k_stat
             GROUP BY 1)
           SELECT event_type, n, cp_ts, CAST(k_stat AS BIGINT) AS k_stat,
             round(least(1.0, 2.0 * exp(-6.0 * k_stat * k_stat
               / CAST(n*n*n + n*n AS DOUBLE))), 6) AS p_value
           FROM cp ORDER BY event_type""",

      // the fold is exact set union, so the oracle is the full
      // distinct recompute
      "mv_incremental_distinct" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_distinct
           FROM events GROUP BY event_type ORDER BY event_type""",

      // the stream's recurrence replayed level-by-level: rn joins the
      // previous row's ewma, e = value + 0.5·e_prev — the SAME IEEE
      // multiply+add sequence the stateful operator executes
      "stream_ewma" ->
        """WITH RECURSIVE e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events
           ), r AS (
             SELECT user_id, event_id, ts, value, rn, value AS ewma
             FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.event_id, e.ts, e.value, e.rn,
               e.value + 0.5 * r.ewma AS ewma
             FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
           SELECT user_id, event_id, ts, value, ewma FROM r
           ORDER BY user_id, event_id""",

      // equal-depth reference bins via quantile_cont, the same
      // list_filter bin fold, Laplace-smoothed fractions, window total
      "dq_drift_psi" ->
        """WITH ref AS (
             SELECT value FROM events WHERE event_id % 5 <> 0
           ), cur AS (
             SELECT value FROM events WHERE event_id % 5 = 0
           ), edges AS (
             SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
               0.6, 0.7, 0.8, 0.9]) AS es FROM ref
           ), rb AS (
             SELECT CAST(len(list_filter(es, e -> value > e)) AS INTEGER)
               AS bin FROM ref, edges
           ), cb AS (
             SELECT CAST(len(list_filter(es, e -> value > e)) AS INTEGER)
               AS bin FROM cur, edges
           ), spine AS (
             SELECT CAST(unnest(generate_series(0, 9)) AS INTEGER) AS bin
           ), rc AS (SELECT bin, count(*) AS c FROM rb GROUP BY bin
           ), cc AS (SELECT bin, count(*) AS c FROM cb GROUP BY bin
           ), j AS (
             SELECT s.bin, CAST(coalesce(rc.c, 0) AS BIGINT) AS n_ref,
               CAST(coalesce(cc.c, 0) AS BIGINT) AS n_cur
             FROM spine s LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
           ), f AS (
             SELECT bin, n_ref, n_cur,
               CAST(n_ref + 1 AS DOUBLE)
                 / CAST(sum(n_ref) OVER () + 10 AS DOUBLE) AS p,
               CAST(n_cur + 1 AS DOUBLE)
                 / CAST(sum(n_cur) OVER () + 10 AS DOUBLE) AS q
             FROM j)
           SELECT bin, n_ref, n_cur, round(p, 6) AS ref_frac,
             round(q, 6) AS cur_frac,
             round((q - p) * ln(q / p), 6) AS psi_contrib,
             round(sum((q - p) * ln(q / p)) OVER (), 6) AS psi
           FROM f ORDER BY bin""",

      // IVF-cell replay (the ann_ivf assignment CTE) + within-cell
      // pairs ≥ threshold — the SemDeDup recipe end to end
      "dedup_semantic" ->
        """WITH e AS (
             SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           ), cent AS (
             SELECT vec_id AS cell, v AS cv,
               list_sum(list_transform(v, x -> x * x)) AS cc
             FROM e WHERE vec_id < 16
           ), ad AS (
             SELECT e.vec_id, c.cell,
               -2 * list_sum(list_transform(generate_series(1, len(e.v)),
                 i -> e.v[i] * c.cv[i])) + c.cc AS dist
             FROM e, cent c
           ), assigned AS (
             SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist, cell) AS r FROM ad)
             WHERE r = 1
           ), pairs AS (
             SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
             FROM assigned a1 JOIN assigned a2
               ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
           ), scored AS (
             SELECT id_a, id_b,
               list_sum(list_transform(generate_series(1, len(x.v)),
                 i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
                  * sqrt(list_sum(list_transform(y.v, t -> t * t)))) AS cosine
             FROM pairs JOIN e x ON pairs.id_a = x.vec_id
               JOIN e y ON pairs.id_b = y.vec_id)
           SELECT id_a, id_b, cosine FROM scored
           WHERE cosine >= 0.4 ORDER BY id_a, id_b""",

  )
}
