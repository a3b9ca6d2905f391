package graft

import graft.OracleFragments._

/** Oracle-registry shard 1/6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard1 {
  val m: Map[String, String] = Map(
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
             count(*) AS count_order
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1999-01-01'
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",

      "q3_shipping_priority" ->
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-01-01'
             AND l_shipdate > TIMESTAMP '1998-01-01'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, o_orderdate, l_orderkey
           LIMIT 10""",

      "q5_regional_revenue" ->
        """SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM customer, orders, lineitem, supplier, nation, region
           WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY n_name
           ORDER BY revenue DESC, n_name""",

      "q10_returned_revenue" ->
        """SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM lineitem, orders, customer, nation
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n_nationkey AND l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1995-10-01'
             AND o_orderdate < TIMESTAMP '1996-01-01'
           GROUP BY c_custkey, c_name, c_acctbal, n_name
           ORDER BY revenue DESC, c_custkey LIMIT 20""",

      "q14_promo_share" ->
        """SELECT round(100.0 *
             CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
               ELSE 0 END) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS promo_share
           FROM lineitem, part
           WHERE l_partkey = p_partkey
             AND l_shipdate >= TIMESTAMP '1995-09-01'
             AND l_shipdate < TIMESTAMP '1995-10-01'""",

      "top_orders_per_cust" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
             FROM orders)
           WHERE rn <= 3 ORDER BY o_custkey, rn""",

      "events_hourly" ->
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // cohort week = week of first event; period = whole weeks since
      // (Monday-aligned in both engines, so days/7 is exact)
      "events_retention" ->
        """WITH first AS (
             SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort_ts
             FROM events GROUP BY user_id
           ), act AS (
             SELECT DISTINCT f.cohort_ts,
               CAST(date_diff('day', CAST(f.cohort_ts AS DATE),
                 CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)) / 7 AS INT)
                 AS period_n,
               e.user_id
             FROM events e JOIN first f USING (user_id))
           SELECT cohort_ts, period_n, count(*) AS n_active
           FROM act GROUP BY 1, 2 ORDER BY 1, 2""",

      // directional rules: same distinct-items self-join, three
      // single divisions of integer counts under round(6)
      "basket_rules" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           ), n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM items
           ), ic AS (
             SELECT l_partkey, count(*) AS c FROM items GROUP BY 1
           ), p AS (
             SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
               count(*) AS n_both
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 4)
           SELECT antecedent, consequent, n_both,
             round(n_both / CAST(nb AS DOUBLE), 6) AS support,
             round(n_both / CAST(ca.c AS DOUBLE), 6) AS confidence,
             round((n_both * CAST(nb AS DOUBLE))
               / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
           FROM p CROSS JOIN n
           JOIN ic ca ON ca.l_partkey = antecedent
           JOIN ic cb ON cb.l_partkey = consequent
           ORDER BY antecedent, consequent""",

      // ntile bands replay (standard SQL distribution), decimal
      // money, recency vs the corpus's own max date
      "customer_rfm" ->
        """WITH pc AS (
             SELECT o_custkey, max(o_orderdate) AS last_o,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
             FROM orders GROUP BY 1
           ), r AS (
             SELECT *, date_diff('day', last_o,
               (SELECT max(last_o) FROM pc)) AS recency_days FROM pc
           ), sc AS (
             SELECT o_custkey, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
             FROM r)
           SELECT o_custkey, recency_days, frequency,
             CAST(monetary AS DOUBLE) AS monetary,
             r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm
           FROM sc ORDER BY o_custkey""",

      "basket_pairs" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2
           ORDER BY part_a, part_b""",

      // centroid-shift replay: WITH ORDINALITY explode, the same
      // r6-scaled integer per-dim sums, n-cancelling cosine tree
      "embedding_centroid_shift" ->
        """WITH e AS (
             SELECT label AS g,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS s
             FROM embeddings
           ), dims AS (
             SELECT g, d, CAST(sum(s) AS HUGEINT) AS sg,
               count(*) AS n
             FROM e GROUP BY 1, 2
           ), gtot AS (
             SELECT d, CAST(sum(sg) AS HUGEINT) AS st FROM dims GROUP BY 1
           ), pg AS (
             SELECT g, CAST(max(n) AS BIGINT) AS n_vectors,
               sum(sg * st) AS dot, sum(sg * sg) AS a2,
               sum(st * st) AS b2
             FROM dims JOIN gtot USING (d) GROUP BY 1)
           SELECT g AS label, n_vectors,
             round(sqrt(CAST(a2 AS DOUBLE)) / CAST(n_vectors AS DOUBLE)
               / 1000000.0, 6) AS centroid_norm,
             round(CASE WHEN a2 > 0 AND b2 > 0 THEN
               CAST(dot AS DOUBLE)
               / (sqrt(CAST(a2 AS DOUBLE)) * sqrt(CAST(b2 AS DOUBLE)))
               END, 6) AS cos_to_global
           FROM pg ORDER BY label""",

      // repurchase-cycle replay: the same (date, key)-ordered lag
      // recurrence, integer day gaps, quantile_cont percentiles
      "repurchase_cycle" ->
        """WITH g AS (
             SELECT o_custkey,
               date_diff('day',
                 CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap
             FROM orders
           ), j AS (
             SELECT c_mktsegment, gap
             FROM g JOIN customer ON o_custkey = c_custkey
             WHERE gap IS NOT NULL)
           SELECT c_mktsegment, count(*) AS n_gaps,
             round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS mean_days,
             quantile_cont(gap, 0.5) AS p50_days,
             quantile_cont(gap, 0.9) AS p90_days
           FROM j GROUP BY 1 ORDER BY c_mktsegment""",

      // share-of-parent replay: exact decimal level re-aggregations,
      // two round-6 divisions per leaf row
      "rollup_share" ->
        """WITH leaf AS (
             SELECT r_name, n_name,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS v
             FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1, 2
           ), p AS (SELECT r_name, sum(v) AS pv FROM leaf GROUP BY 1
           ), t AS (SELECT sum(pv) AS tv FROM p)
           SELECT leaf.r_name, n_name, CAST(v AS DOUBLE) AS value,
             round(CAST(v AS DOUBLE) / CAST(pv AS DOUBLE), 6)
               AS share_of_parent,
             round(CAST(pv AS DOUBLE) / CAST(tv AS DOUBLE), 6)
               AS parent_share_of_total
           FROM leaf JOIN p USING (r_name) CROSS JOIN t
           ORDER BY r_name, n_name""",

      // new-vs-returning replay: integer month indexes, first-month
      // classification, exact decimal revenue, one share division
      "revenue_new_vs_returning" ->
        """WITH b AS (
             SELECT o_custkey AS c,
               (year(CAST(o_orderdate AS TIMESTAMP)) - 1970) * 12
                 + month(CAST(o_orderdate AS TIMESTAMP)) - 1 AS m,
               CAST(o_totalprice AS DECIMAL(12,2)) AS amt
             FROM orders
           ), f AS (SELECT c, min(m) AS fm FROM b GROUP BY 1
           ), j AS (
             SELECT b.m, b.c, b.amt, b.m = f.fm AS isn
             FROM b JOIN f USING (c)
           ), a AS (
             SELECT m,
               sum(CASE WHEN isn THEN amt
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS rn,
               sum(CASE WHEN NOT isn THEN amt
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS rr,
               count(DISTINCT CASE WHEN isn THEN c END) AS nn,
               count(DISTINCT CASE WHEN NOT isn THEN c END) AS nr
             FROM j GROUP BY 1)
           SELECT CAST(DATE '1970-01-01' + CAST(m AS INT)
               * INTERVAL 1 MONTH AS TIMESTAMP) AS month_start,
             CAST(rn AS DOUBLE) AS rev_new,
             CAST(rr AS DOUBLE) AS rev_returning,
             CAST(nn AS BIGINT) AS n_new_customers,
             CAST(nr AS BIGINT) AS n_returning_customers,
             round(CASE WHEN rn + rr > 0 THEN
               CAST(rn AS DOUBLE) / CAST(rn + rr AS DOUBLE) END, 6)
               AS new_rev_share
           FROM a ORDER BY month_start""",

      // cycle-SLA replay: integer day diffs, quantile_cont p50/p90,
      // one round-6 division each for share and mean
      "fulfillment_cycle_sla" ->
        """WITH li AS (
             SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE),
                 CAST(l_shipdate AS DATE)) AS days
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
           SELECT o_orderpriority, count(*) AS n_lines,
             round(CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS late_share,
             round(CAST(sum(days) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_days,
             quantile_cont(days, 0.5) AS p50_days,
             quantile_cont(days, 0.9) AS p90_days
           FROM li GROUP BY 1 ORDER BY o_orderpriority""",

      // elasticity replay: r6-scaled monthly ln(price)/ln(qty) longs,
      // exact HUGEINT OLS sums, scale cancels in slope and R²
      "price_elasticity" ->
        """WITH m AS (
             SELECT p_brand,
               date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS mo,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS q,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2
             HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 0
               AND sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
           ), s AS (
             SELECT p_brand,
               CAST(round(ln(CAST(r AS DOUBLE) / CAST(q AS DOUBLE))
                 * 1000000.0) AS HUGEINT) AS x,
               CAST(round(ln(CAST(q AS DOUBLE)) * 1000000.0) AS HUGEINT)
                 AS y
             FROM m
           ), a AS (
             SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             FROM s GROUP BY 1 HAVING count(*) >= 3
           ), e AS (
             SELECT p_brand, n,
               CAST(n AS HUGEINT) * sxy - sx * sy AS num,
               CAST(n AS HUGEINT) * sxx - sx * sx AS denx,
               CAST(n AS HUGEINT) * syy - sy * sy AS deny
             FROM a)
           SELECT p_brand, CAST(n AS BIGINT) AS n_months,
             round(CASE WHEN denx > 0 THEN
               CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END, 6)
               AS elasticity,
             round(CASE WHEN denx > 0 AND deny > 0 THEN
               CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS r2
           FROM e ORDER BY p_brand""",

      // cosine replay: same pairs, item frequencies, one
      // sqrt+division tree round-6, rank after the top-k cut
      "basket_cosine" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           ), freq AS (
             SELECT l_partkey, count(*) AS n FROM items GROUP BY 1
           ), pairs AS (
             SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2
           ), sc AS (
             SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders,
               round(CAST(n_orders AS DOUBLE)
                 / sqrt(CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6)
                 AS cosine
             FROM pairs
             JOIN freq fa ON fa.l_partkey = part_a
             JOIN freq fb ON fb.l_partkey = part_b)
           SELECT part_a, part_b, n_orders, cosine, CAST(rank AS INT) AS rank
           FROM (SELECT *, row_number()
               OVER (ORDER BY cosine DESC, part_a, part_b) AS rank FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      // per-start chains: for every step-1 start t0, the windowed
      // recurrence tᵢ = min{ts of step i | tᵢ₋₁ < ts ≤ t0 + W};
      // the user keeps the deepest stage, earliest start on ties
      "events_funnel_windowed" ->
        """WITH f AS (
             SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type IN ('view', 'click', 'purchase')
           ), s0 AS (
             SELECT user_id, ts AS t0,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
             FROM f WHERE event_type = 'view'
           ), s0k AS (SELECT user_id, t0 FROM s0 WHERE rn <= 64
           ), c2 AS (
             SELECT s.user_id, s.t0, min(f.ts) AS t2
             FROM s0k s JOIN f ON f.user_id = s.user_id
             WHERE f.event_type = 'click' AND f.ts > s.t0
               AND f.ts <= s.t0 + INTERVAL 3600 SECONDS
             GROUP BY s.user_id, s.t0
           ), c3 AS (
             SELECT c.user_id, c.t0, min(f.ts) AS t3
             FROM c2 c JOIN f ON f.user_id = c.user_id
             WHERE f.event_type = 'purchase' AND f.ts > c.t2
               AND f.ts <= c.t0 + INTERVAL 3600 SECONDS
             GROUP BY c.user_id, c.t0, c.t2
           ), st AS (
             SELECT s.user_id, s.t0,
               CASE WHEN c3.t3 IS NOT NULL THEN 3
                    WHEN c2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
               coalesce(c3.t3, c2.t2, s.t0) AS t_end
             FROM s0k s
               LEFT JOIN c2 ON c2.user_id = s.user_id AND c2.t0 = s.t0
               LEFT JOIN c3 ON c3.user_id = s.user_id AND c3.t0 = s.t0
           ), best AS (
             SELECT user_id, stage, t0 AS t_first, t_end AS t_last,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY stage DESC, t0 ASC) AS rk
             FROM st
           ), u AS (SELECT DISTINCT user_id FROM f)
           SELECT u.user_id, coalesce(b.stage, 0) AS stage,
             b.t_first, b.t_last
           FROM u LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (user_id)
           ORDER BY u.user_id""",

      // the funnel fold ≡ the earliest-completion recurrence
      // tᵢ = min{ts of step i | ts > tᵢ₋₁}, expressed as k min-joins
      "events_funnel" -> funnelOracleSql,
      // the streaming twin's max-version view ≡ the batch fold —
      // the oracle is events_funnel's own, verbatim
      "stream_funnel" -> funnelOracleSql,

      "events_sessions" -> sessionsOracleSql,
      // the incremental fold must equal the full resessionization —
      // the oracle is events_sessions' own, verbatim
      "events_sessions_incr" -> sessionsOracleSql,

      // entry/exit replay: the same session numbering, endpoints via
      // (ts, id)-ordered row_numbers in each direction
      "sessions_entry_exit" ->
        """WITH flagged AS (
             SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
                   CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           ), numbered AS (
             SELECT user_id, event_id, event_type, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS session_seq
             FROM flagged
           ), ranked AS (
             SELECT *,
               row_number() OVER (PARTITION BY user_id, session_seq
                 ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, session_seq
                 ORDER BY ts DESC, event_id DESC) AS rn_d,
               count(*) OVER (PARTITION BY user_id, session_seq)
                 AS n_events
             FROM numbered)
           SELECT en.user_id, en.session_seq,
             en.ts AS session_start, ex.ts AS session_end,
             date_diff('second', en.ts, ex.ts) AS duration_sec,
             CAST(en.n_events AS BIGINT) AS n_events,
             en.event_type AS entry_type, ex.event_type AS exit_type,
             en.n_events = 1 AS is_bounce
           FROM ranked en JOIN ranked ex
             ON en.user_id = ex.user_id AND en.session_seq = ex.session_seq
           WHERE en.rn_a = 1 AND ex.rn_d = 1
           ORDER BY en.user_id, en.session_seq""",

      // concurrency replay: the same sessions swept as +1/−(end+1)
      // deltas per (bucket, sec), grid carry via one window over the
      // bucket grid, within-bucket peak = carry + max(cum) (count
      // AFTER the second's removals — r11 ADVICE fix); the carry
      // plateau counts only when the first marker is past bucket start
      "sessions_concurrency" ->
        """WITH flagged AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
                   CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), numbered AS (
             SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged
           ), sess AS (
             SELECT date_diff('second', TIMESTAMP '1970-01-01', min(ts))
                 AS st,
               date_diff('second', TIMESTAMP '1970-01-01', max(ts)) AS en
             FROM numbered GROUP BY user_id, session_seq
           ), del AS (
             SELECT st AS sec, 1 AS d FROM sess
             UNION ALL SELECT en + 1, -1 FROM sess
           ), agg AS (
             SELECT sec - sec % 3600 AS bucket, sec,
               CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
                 AS pos,
               CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT)
                 AS neg
             FROM del GROUP BY 1, 2
           ), pb AS (
             SELECT bucket, CAST(sum(pos) AS BIGINT) AS n_started,
               CAST(max(cum) AS BIGINT) AS peak_off,
               CAST(sum(pos - neg) AS BIGINT) AS net,
               min(sec) AS first_sec
             FROM (SELECT *, sum(pos - neg) OVER (PARTITION BY bucket
                 ORDER BY sec ROWS UNBOUNDED PRECEDING) AS cum
               FROM agg)
             GROUP BY 1
           ), en2 AS (
             SELECT en - en % 3600 AS bucket, count(*) AS n_ended
             FROM sess GROUP BY 1
           ), grid AS (
             SELECT unnest(generate_series(
               (SELECT min(bucket) FROM pb),
               (SELECT max(bucket) FROM pb), 3600)) AS bucket
           ), j AS (
             SELECT g.bucket, coalesce(pb.n_started, 0) AS n_started,
               coalesce(pb.peak_off, 0) AS peak_off,
               coalesce(pb.net, 0) AS net,
               pb.first_sec AS first_sec,
               coalesce(en2.n_ended, 0) AS n_ended
             FROM grid g LEFT JOIN pb USING (bucket)
               LEFT JOIN en2 USING (bucket)
           ), c AS (
             SELECT *, CAST(sum(net) OVER (ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) - net AS BIGINT) AS carry
             FROM j)
           SELECT TIMESTAMP '1970-01-01' + bucket * INTERVAL 1 SECOND
               AS bucket_ts,
             carry AS carry_in,
             CASE WHEN first_sec IS NULL THEN carry
               WHEN first_sec > bucket
                 THEN greatest(carry, carry + peak_off)
               ELSE carry + peak_off END AS peak,
             CAST(n_started AS BIGINT) AS n_started,
             CAST(n_ended AS BIGINT) AS n_ended
           FROM c ORDER BY bucket_ts""",

      // date-spine replay: integer epoch-day arithmetic for iso_dow /
      // week_index (engine dayofweek conventions diverge), d+1 month
      // test for month-end
      "dim_date_spine" ->
        """WITH b AS (
             SELECT min(CAST(o_orderdate AS DATE)) AS lo,
               max(CAST(o_orderdate AS DATE)) AS hi
             FROM orders
           ), d AS (
             SELECT lo + CAST(unnest(generate_series(0,
               date_diff('day', lo, hi))) AS INT) AS d
             FROM b)
           SELECT CAST(d AS TIMESTAMP) AS day_ts,
             year(d) * 10000 + month(d) * 100 + day(d) AS date_key,
             year(d) AS year, quarter(d) AS quarter, month(d) AS month,
             day(d) AS day_of_month,
             (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1
               AS iso_dow,
             (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 >= 6
               AS is_weekend,
             month(d + 1) <> month(d) AS is_month_end,
             date_diff('day', DATE '1970-01-05',
               CAST(date_trunc('week', CAST(d AS TIMESTAMP)) AS DATE))
               // 7 AS week_index
           FROM d ORDER BY day_ts""",

      // definitional inequality overlap join over the same
      // session-building SQL as events_sessions (DuckDB IEJoin)
      "sessions_overlap" ->
        """WITH flagged AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w, CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), numbered AS (
             SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged
           ), sess AS (
             SELECT user_id, session_seq, min(ts) AS lo, max(ts) AS hi
             FROM numbered GROUP BY user_id, session_seq)
           SELECT a.user_id AS a_user_id, a.session_seq AS a_session_seq,
             b.user_id AS b_user_id, b.session_seq AS b_session_seq
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
           ORDER BY 1, 2, 3, 4""",

      "q18_large_orders" ->
        """SELECT c_name, o_custkey AS customer_id, o_orderkey AS order_id,
             o_orderdate AS order_date, o_totalprice AS total_price,
             CAST(total_qty AS DOUBLE) AS total_qty
           FROM orders
           JOIN (SELECT l_orderkey,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
                 FROM lineitem GROUP BY 1 HAVING total_qty > 250) big
             ON o_orderkey = big.l_orderkey
           JOIN customer ON o_custkey = c_custkey
           ORDER BY order_id""",

      "q13_custdist" ->
        """SELECT c_count, count(*) AS custdist FROM (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority NOT LIKE '1%'
             GROUP BY c_custkey)
           GROUP BY c_count
           ORDER BY custdist DESC, c_count DESC""",

      "events_rolling" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value
           FROM events ORDER BY user_id, ts, event_id""",

      "asof_last_view" ->
        """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             v.event_id AS view_event_id, CAST(v.ts AS TIMESTAMP) AS view_ts
           FROM (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
             ON p.user_id = v.user_id AND p.ts >= v.ts
           ORDER BY p.event_id""",

      "asof_last_view_tol" ->
        """SELECT event_id, user_id, ts,
             CASE WHEN ts - view_ts <= INTERVAL 1 HOUR THEN view_event_id END
               AS view_event_id,
             CASE WHEN ts - view_ts <= INTERVAL 1 HOUR THEN view_ts END
               AS view_ts
           FROM (
             SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               v.event_id AS view_event_id, CAST(v.ts AS TIMESTAMP) AS view_ts
             FROM (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase') p
             ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'view') v
               ON p.user_id = v.user_id AND p.ts >= v.ts)
           ORDER BY event_id""",

      "asof_next_error" ->
        """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             e.event_id AS err_event_id, CAST(e.ts AS TIMESTAMP) AS err_ts
           FROM (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'error') e
             ON p.user_id = e.user_id AND p.ts <= e.ts
           ORDER BY p.event_id""",

      "range_join_sessions" ->
        """WITH flagged AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w, CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), numbered AS (
             SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged
           ), sessions AS (
             SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end
             FROM numbered GROUP BY user_id, session_seq)
           SELECT e.user_id, s.session_seq, count(*) AS n_in_session
           FROM events e JOIN sessions s
             ON e.user_id = s.user_id
            AND CAST(e.ts AS TIMESTAMP) BETWEEN s.session_start AND s.session_end
           GROUP BY e.user_id, s.session_seq
           ORDER BY e.user_id, s.session_seq""",

      "band_join_price" ->
        """SELECT price_tier, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           FROM orders
           JOIN (VALUES ('tier_0_100k', 0, 100000),
                        ('tier_100_200k', 100000, 200000),
                        ('tier_200_300k', 200000, 300000),
                        ('tier_300k_plus', 300000, 1000000000000000)) b(price_tier, lo, hi)
             ON o_totalprice >= lo AND o_totalprice < hi
           GROUP BY price_tier ORDER BY price_tier""",

      "q4_returned_priority" ->
        """SELECT o_orderpriority, count(*) AS n_orders
           FROM orders
           WHERE EXISTS (SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      // definitional EXISTS/NOT-EXISTS form — the gate proves the
      // Spark side's single-aggregate rewrite (Analytics.scala)
      "q21_waiting_supplier" ->
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
           FROM supplier, lineitem l1, orders
           WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             AND o_orderstatus = 'F'
             AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             AND EXISTS (SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey
                 AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
               JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
               WHERE l3.l_orderkey = l1.l_orderkey
                 AND l3.l_suppkey <> l1.l_suppkey
                 AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
           GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",

      "q6_forecast_revenue" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
             AND l_quantity < 24""",

      "q7_volume_shipping" ->
        """SELECT supp_nation, cust_nation, l_year, CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01')
           GROUP BY supp_nation, cust_nation, l_year
           ORDER BY supp_nation, cust_nation, l_year""",

      "q8_market_share" ->
        """SELECT o_year, round(
             CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
             CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
           FROM (
             SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev,
               n2.n_name AS supp_nation
             FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
               AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
               AND o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'
               AND p_type = 'STANDARD')
           GROUP BY o_year ORDER BY o_year""",

      // adapted cost = 0.5 * retail per unit (no partsupp in the
      // schema) — stated in the operator doc, replayed here
      "q9_product_profit" ->
        """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
           FROM (
             SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * 0.5 AS amount
             FROM part, supplier, lineitem, orders, nation
             WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%red%')
           GROUP BY nation, o_year ORDER BY nation, o_year DESC""",

      // multiplicative fraction test (value*1000 > total): no engine
      // divides, so the threshold boundary is exact on both sides
      "q11_important_parts" ->
        """SELECT l_partkey, CAST(value_d AS DOUBLE) AS value FROM (
             SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS value_d
             FROM lineitem, supplier, nation, region
             WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
               AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
             GROUP BY l_partkey
             HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 1000 > (
               SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
               FROM lineitem, supplier, nation, region
               WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                 AND n_regionkey = r_regionkey AND r_name = 'EUROPE'))
           ORDER BY value DESC, l_partkey""",

      "q12_late_priority" ->
        """SELECT l_linestatus,
             CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS BIGINT) AS high_line_count,
             CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS BIGINT) AS low_line_count
           FROM orders, lineitem
           WHERE o_orderkey = l_orderkey
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_shipdate > o_orderdate + INTERVAL 30 DAY
           GROUP BY l_linestatus ORDER BY l_linestatus""",

      // scalar-max subquery; revenue stays decimal through the
      // equality so ties match exactly
      "q15_top_supplier" ->
        """WITH rev AS (
             SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_d
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey)
           SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_revenue
           FROM supplier, rev
           WHERE s_suppkey = l_suppkey AND total_d = (SELECT max(total_d) FROM rev)
           ORDER BY s_suppkey""",

      "q16_supplier_counts" ->
        """SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           FROM lineitem, part
           WHERE l_partkey = p_partkey
             AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
           GROUP BY p_brand, p_type, p_size
           ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

      // correlated form stated verbatim, multiplicatively (2*qty*cnt
      // < sum ⟺ qty < 0.5*avg) — the gate proves the decorrelation
      "q17_small_qty_revenue" ->
        """SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
           FROM lineitem l, part
           WHERE p_partkey = l.l_partkey
             AND p_brand = 'Brand#2' AND p_type = 'ECONOMY'
             AND CAST(l.l_quantity AS DECIMAL(12,2)) * 2 *
                 (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
               < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(12,2)))
                  FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)""",

      "q19_banded_revenue" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM lineitem, part
           WHERE p_partkey = l_partkey AND (
             (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20) OR
             (p_brand = 'Brand#15' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30) OR
             (p_brand = 'Brand#25' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40))""",

      // nested-IN form stated verbatim
      "q20_excess_shippers" ->
        """SELECT s_name, s_acctbal FROM supplier, nation, region
           WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'EUROPE'
             AND s_suppkey IN (
               SELECT l_suppkey FROM lineitem
               WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1997-01-01'
               GROUP BY l_partkey, l_suppkey
               HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 60)
           ORDER BY s_name""",

      // correlated-min form stated verbatim; "offer" = the supplier's
      // min line price for the part (no partsupp in the schema)
      "q2_min_cost_supplier" ->
        """WITH offers AS (
             SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
               min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
             FROM lineitem, part, supplier, nation, region
             WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
               AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
               AND r_name = 'EUROPE' AND p_type = 'LARGE'
               AND p_size BETWEEN 10 AND 15
             GROUP BY l_partkey, s_suppkey, s_name, s_acctbal, n_name)
           SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
             CAST(cost_d AS DOUBLE) AS cost
           FROM offers o
           WHERE cost_d = (SELECT min(cost_d) FROM offers o2
                           WHERE o2.l_partkey = o.l_partkey)
           ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""",

      "cube_revenue" ->
        """SELECT n_name, order_year,
             CAST(GROUPING(n_name, order_year) AS BIGINT) AS gid,
             CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n_name, year(o_orderdate) AS order_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey)
           GROUP BY CUBE (n_name, order_year)
           ORDER BY gid, n_name NULLS FIRST, order_year NULLS FIRST""",

      // spine = per-type generate_series over observed hour bounds;
      // forward fill = last_value IGNORE NULLS — states the Spark
      // computation verbatim
      "events_gapfill" ->
        """WITH h AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
               count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS sv
             FROM events GROUP BY 1, 2
           ), spine AS (
             SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
             FROM (SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
                   FROM h GROUP BY event_type)
           ), j AS (
             SELECT s.event_type, s.hour_ts, h.n, h.sv
             FROM spine s LEFT JOIN h
               ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts)
           SELECT event_type, hour_ts,
             coalesce(n, 0) AS n_events,
             CAST(last_value(sv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS filled_value
           FROM j ORDER BY event_type, hour_ts""",

      // r8 wave 5: linear interpolation — the prev/next observation
      // carry and the straight-line arithmetic stated verbatim
      // (epoch-second abscissa; IEEE double sub/div/mul/add in the
      // same order → bit-identical)
      "events_interpolate" ->
        """WITH h AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2
           ), spine AS (
             SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
             FROM (SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
                   FROM h GROUP BY event_type)
           ), j AS (
             SELECT s.event_type, s.hour_ts, h.v,
               CAST(epoch(s.hour_ts) AS BIGINT) AS hh
             FROM spine s LEFT JOIN h
               ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
           ), c AS (
             SELECT event_type, hour_ts, v, hh,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wn AS nh
             FROM j
             WINDOW wp AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           SELECT event_type, hour_ts,
             v IS NOT NULL AS observed,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) *
                    (CAST(hh - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
             END AS filled_value
           FROM c ORDER BY event_type, hour_ts""",

      // r8 wave 5: DAU + trailing-7d distinct actives — the bounded
      // 7x explode of the distinct user-day frame, replayed via a
      // 0..6 offset cross join
      "events_active_users" ->
        """WITH ud AS (
             SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
             FROM events
           ), dau AS (
             SELECT day, count(*) AS dau FROM ud GROUP BY 1
           ), covered AS (
             SELECT DISTINCT d2 AS day, user_id FROM (
               SELECT unnest(generate_series(ud.day, ud.day + INTERVAL 6 DAY,
                 INTERVAL 1 DAY)) AS d2, ud.user_id
               FROM ud)
           ), roll AS (
             SELECT day, count(*) AS rolling_actives FROM covered GROUP BY 1)
           SELECT d.day, d.dau, r.rolling_actives
           FROM dau d LEFT JOIN roll r ON d.day = r.day
           ORDER BY d.day""",

      // r8 wave 5: top event-type trigram paths — the lead() chain
      // replayed, (n desc, path) tie-break pins the cut
      "events_top_paths" ->
        """WITH t AS (
             SELECT event_type AS t0,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
           FROM t
           WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
           GROUP BY 1 ORDER BY n DESC, path LIMIT 25""",

      // r8 wave 5: interval-union coverage islands — running-max
      // island detection replayed over the same (lo, hi) sort
      "sessions_coverage" ->
        """WITH iv AS (
             SELECT event_type, CAST(ts AS TIMESTAMP) AS lo,
               CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS hi
             FROM events
           ), m AS (
             SELECT event_type, lo, hi,
               max(hi) OVER (PARTITION BY event_type ORDER BY lo, hi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             FROM iv WHERE hi >= lo
           ), fl AS (
             SELECT event_type, lo, hi,
               CASE WHEN pm IS NULL OR lo > pm THEN 1 ELSE 0 END AS ni
             FROM m
           ), num AS (
             SELECT event_type, lo, hi,
               CAST(sum(ni) OVER (PARTITION BY event_type ORDER BY lo, hi
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_seq
             FROM fl)
           SELECT event_type, island_seq,
             min(lo) AS island_start, max(hi) AS island_end,
             count(*) AS n_intervals,
             date_diff('second', min(lo), max(hi)) AS covered_sec
           FROM num GROUP BY 1, 2 ORDER BY 1, 2""",

      // r8 wave 5: MERGE INTO — the definitional FULL OUTER JOIN +
      // ordered CASE form (DuckDB 1.0 has no MERGE statement); clause
      // order and 3-valued condition guards stated verbatim
      "merge_into" ->
        """WITH t AS (
             SELECT * FROM orders WHERE o_orderkey % 3 <> 0
           ), s AS (
             SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice,
               o_orderdate, o_orderpriority
             FROM orders WHERE o_orderkey % 2 = 0
           ), j AS (
             SELECT t.o_orderkey AS tk, t.o_custkey AS tc,
               t.o_orderstatus AS tst, t.o_totalprice AS tp,
               t.o_orderdate AS td, t.o_orderpriority AS tpr,
               s.o_orderkey AS sk, s.o_custkey AS sc,
               s.o_orderstatus AS sst, s.o_totalprice AS sp,
               s.o_orderdate AS sd, s.o_orderpriority AS spr
             FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
           ), f AS (
             SELECT *,
               (tk IS NOT NULL AND sk IS NOT NULL) AS matched,
               (tk IS NULL AND sk IS NOT NULL) AS s_only,
               (tk IS NOT NULL AND sk IS NULL) AS t_only
             FROM j
           ), fired AS (
             SELECT *,
               (matched AND sp > 200000.0) AS upd,
               (matched AND NOT coalesce(sp > 200000.0, FALSE)
                 AND tst = 'F') AS del,
               (s_only AND sp > 150000.0) AS ins,
               (t_only AND tpr = '1-URGENT') AS retire
             FROM f)
           SELECT
             CASE WHEN ins THEN sk ELSE tk END AS o_orderkey,
             CASE WHEN ins THEN sc ELSE tc END AS o_custkey,
             CASE WHEN upd THEN 'U' WHEN ins THEN sst ELSE tst END AS o_orderstatus,
             CASE WHEN upd THEN sp WHEN ins THEN sp ELSE tp END AS o_totalprice,
             CASE WHEN ins THEN sd ELSE td END AS o_orderdate,
             CASE WHEN ins THEN spr ELSE tpr END AS o_orderpriority
           FROM fired
           WHERE (matched AND NOT del) OR (s_only AND ins)
              OR (t_only AND NOT retire)
           ORDER BY o_orderkey""",
  )
}
