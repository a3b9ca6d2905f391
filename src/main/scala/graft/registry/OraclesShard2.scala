package graft

import graft.EntryHelpers.CdcCutoff
import graft.OracleFragments._

/** Oracle-registry shard 2/6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard2 {
  val m: Map[String, String] = Map(
      // Versioned MERGE: version 1 = the pre-merge snapshot (time
      // travel must survive the merge commit), version 2 = the same
      // clause chain as merge_into
      // WAP replay: the published content can only be the clean
      // rows; the rejected candidate's nulled keys (%97 odd) are
      // exactly the rows missing from the odd half
      "versioned_wap" ->
        """SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(2 AS BIGINT) AS published_version
           FROM orders
           WHERE o_orderkey % 2 = 0 OR o_orderkey % 97 <> 0
           ORDER BY o_orderkey""",

      "versioned_merge_into" ->
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
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, CAST(1 AS BIGINT) AS version
           FROM t
           UNION ALL
           SELECT
             CASE WHEN ins THEN sk ELSE tk END AS o_orderkey,
             CASE WHEN ins THEN sc ELSE tc END AS o_custkey,
             CASE WHEN upd THEN 'U' WHEN ins THEN sst ELSE tst END AS o_orderstatus,
             CASE WHEN upd THEN sp WHEN ins THEN sp ELSE tp END AS o_totalprice,
             CASE WHEN ins THEN sd ELSE td END AS o_orderdate,
             CASE WHEN ins THEN spr ELSE tpr END AS o_orderpriority,
             CAST(2 AS BIGINT) AS version
           FROM fired
           WHERE (matched AND NOT del) OR (s_only AND ins)
              OR (t_only AND NOT retire)
           ORDER BY version, o_orderkey""",

      // r8 wave 5: frequent triples — the DEFINITIONAL unpruned
      // triple self-join with relative support; the implementation's
      // Apriori pruning must be invisible here
      "basket_triples" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey AS o, p_brand AS b
             FROM lineitem JOIN part ON l_partkey = p_partkey
           ), s AS (
             SELECT ceil(0.002 * count(DISTINCT o)) AS s FROM items)
           SELECT x.b AS brand_a, y.b AS brand_b, z.b AS brand_c,
             count(*) AS n_orders
           FROM items x
           JOIN items y ON x.o = y.o AND x.b < y.b
           JOIN items z ON y.o = z.o AND y.b < z.b
           GROUP BY 1, 2, 3
           HAVING count(*) >= (SELECT s FROM s)
           ORDER BY 1, 2, 3""",

      // r8 wave 5: inferred members — the dim plus placeholder rows
      // for fact keys the dim feed hasn't delivered
      "dim_late_arriving" ->
        """WITH dim AS (
             SELECT c_custkey, c_name, c_mktsegment, c_acctbal
             FROM customer WHERE c_custkey % 11 <> 0
           ), missing AS (
             SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM dim))
           SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
             FALSE AS is_inferred
           FROM dim
           UNION ALL
           SELECT c_custkey, 'UNKNOWN', 'UNKNOWN', 0.0, TRUE
           FROM missing
           ORDER BY c_custkey""",

      // r8 wave 5: Benford screen — leading digit from the pinned
      // decimal string (log10/floor boundary arithmetic differs
      // between engines; string extraction does not)
      "dq_benford" ->
        """WITH keyed AS (
             SELECT o_orderpriority,
               CAST(regexp_extract(
                 CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
                 '[1-9]') AS INTEGER) AS digit
             FROM orders
             WHERE regexp_extract(
               CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') <> ''
           ), counts AS (
             SELECT o_orderpriority, digit, count(*) AS n
             FROM keyed GROUP BY 1, 2)
           SELECT o_orderpriority, digit, n,
             round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
               PARTITION BY o_orderpriority) AS DOUBLE), 6) AS obs_share,
             round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
             round(abs(
               round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                 PARTITION BY o_orderpriority) AS DOUBLE), 6) -
               round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
           FROM counts
           ORDER BY o_orderpriority, digit""",

      // r8 wave 5: FD violations — determinant values with >1
      // distinct dependent
      "dq_fd_violations" ->
        """SELECT l_partkey,
             count(DISTINCT l_suppkey) AS n_dependent,
             count(*) AS n_rows,
             min(l_suppkey) AS dep_min, max(l_suppkey) AS dep_max
           FROM lineitem GROUP BY 1
           HAVING count(DISTINCT l_suppkey) > 1
           ORDER BY 1""",

      // integer month indices (y·12+m), decimal cumulative revenue,
      // one export division
      "cohort_ltv" ->
        """WITH first AS (
             SELECT o_custkey,
               year(min(o_orderdate)) * 12 + month(min(o_orderdate)) AS cm
             FROM orders GROUP BY 1
           ), sized AS (
             SELECT cm, count(*) AS n_customers FROM first GROUP BY 1
           ), facts AS (
             SELECT f.cm,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm
                 AS period_m,
               sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS revenue
             FROM orders o JOIN first f USING (o_custkey)
             GROUP BY 1, 2
           ), cum AS (
             SELECT *, sum(revenue) OVER (PARTITION BY cm ORDER BY period_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_revenue
             FROM facts)
           SELECT c.cm AS cohort_month, c.period_m, s.n_customers,
             CAST(c.revenue AS DOUBLE) AS revenue,
             CAST(c.cum_revenue AS DOUBLE) AS cum_revenue,
             round(CAST(c.cum_revenue AS DOUBLE) / s.n_customers, 6) AS ltv
           FROM cum c JOIN sized s USING (cm)
           ORDER BY cohort_month, period_m""",

      // ABC replay: the same 1e-4 integer units, identical ordered
      // windows, identical integer threshold cross-products
      // column-diff replay: the same deterministic mutation, one wide
      // conditional aggregate, bounded per-column union
      "cdc_column_diff" ->
        """WITH base AS (
             SELECT o_orderkey AS k, o_custkey AS c,
               CAST(o_totalprice AS DOUBLE) AS p, o_orderpriority AS pr
             FROM orders
           ), newer AS (
             SELECT k, c,
               CASE WHEN k % 10 = 0 THEN p + 1.0 ELSE p END AS p,
               CASE WHEN k % 13 = 0 THEN '9-RECLASSED' ELSE pr END AS pr
             FROM base WHERE k % 31 <> 0
             UNION ALL
             SELECT k + 900000000, c, p, pr FROM base WHERE k % 17 = 0
           ), j AS (
             SELECT b.k AS ok, n.k AS nk, b.c AS oc, n.c AS nc,
               b.p AS op, n.p AS np, b.pr AS opr, n.pr AS npr
             FROM base b FULL OUTER JOIN newer n ON b.k = n.k
           ), w AS (
             SELECT
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS m,
               CAST(sum(CASE WHEN nk IS NOT NULL AND ok IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS ad,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS rm,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND oc IS DISTINCT FROM nc THEN 1 ELSE 0 END) AS BIGINT)
                 AS chc,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND op IS DISTINCT FROM np THEN 1 ELSE 0 END) AS BIGINT)
                 AS chp,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND opr IS DISTINCT FROM npr THEN 1 ELSE 0 END) AS BIGINT)
                 AS chpr
             FROM j)
           SELECT column_name, n_changed, m AS n_matched,
             round(CASE WHEN m > 0 THEN CAST(n_changed AS DOUBLE)
               / CAST(m AS DOUBLE) END, 6) AS change_share,
             ad AS n_added, rm AS n_removed
           FROM (
             SELECT 'o_custkey' AS column_name, chc AS n_changed,
               m, ad, rm FROM w
             UNION ALL SELECT 'o_totalprice', chp, m, ad, rm FROM w
             UNION ALL SELECT 'o_orderpriority', chpr, m, ad, rm FROM w)
           ORDER BY column_name""",

      // balance-snapshot replay: integer month indexes, exact decimal
      // running sums, per-account grid, IGNORE NULLS carry-forward
      "fact_balance_snapshots" ->
        """WITH t AS (
             SELECT o_custkey AS a,
               (year(CAST(o_orderdate AS TIMESTAMP)) - 1970) * 12
                 + month(CAST(o_orderdate AS TIMESTAMP)) - 1 AS m,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amt
             FROM orders
           ), pm AS (
             SELECT a, m, sum(amt) AS dm FROM t GROUP BY 1, 2
           ), cum AS (
             SELECT a, m, sum(dm) OVER (PARTITION BY a ORDER BY m
               ROWS UNBOUNDED PRECEDING) AS bal
             FROM pm
           ), f AS (
             SELECT a, min(m) AS fm FROM pm GROUP BY 1
           ), grid AS (
             SELECT a, unnest(generate_series(fm,
               (SELECT max(m) FROM pm))) AS m
             FROM f
           ), c AS (
             SELECT g.a, g.m,
               last_value(cum.bal IGNORE NULLS) OVER (PARTITION BY g.a
                 ORDER BY g.m ROWS UNBOUNDED PRECEDING) AS bal
             FROM grid g LEFT JOIN cum ON cum.a = g.a AND cum.m = g.m)
           SELECT a AS o_custkey,
             CAST(DATE '1970-01-01' + CAST(m AS INT) * INTERVAL 1 MONTH
               AS TIMESTAMP) AS month_start,
             CAST(bal AS DOUBLE) AS balance
           FROM c ORDER BY o_custkey, month_start""",

      // WoW replay: integer Monday-week indexes, calendar-consecutive
      // guard, one round-6 division
      "events_wow_growth" ->
        """WITH w AS (
             SELECT event_type AS k,
               date_diff('day', DATE '1970-01-05',
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
                 // 7 AS wk,
               count(*) AS n
             FROM events GROUP BY 1, 2
           ), l AS (
             SELECT k, wk, n,
               lag(wk) OVER (PARTITION BY k ORDER BY wk) AS pwk,
               lag(n) OVER (PARTITION BY k ORDER BY wk) AS pn
             FROM w)
           SELECT k AS event_type,
             CAST(DATE '1970-01-05' + CAST(wk * 7 AS INT) AS TIMESTAMP)
               AS week_start,
             CAST(n AS BIGINT) AS n_events,
             CAST(CASE WHEN pwk IS NOT NULL AND wk - pwk = 1
               THEN n - pn END AS BIGINT) AS wow_delta,
             round(CASE WHEN pwk IS NOT NULL AND wk - pwk = 1 AND pn > 0
               THEN CAST(n - pn AS DOUBLE) / CAST(pn AS DOUBLE) END, 6)
               AS wow_pct
           FROM l ORDER BY event_type, week_start""",

      // XYZ replay: exact HUGEINT variance numerator, integer class
      // cuts (no float can flip a class), one double tree for cv
      "inventory_xyz" ->
        """WITH dem AS (
             SELECT l_partkey AS k,
               date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS p,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS v
             FROM lineitem GROUP BY 1, 2
           ), a AS (
             SELECT k, count(*) AS n, sum(v) AS sv, sum(v * v) AS qv
             FROM dem GROUP BY 1
           ), e AS (
             SELECT k, n, sv,
               CAST(n AS HUGEINT) * qv - sv * sv AS varnum,
               sv * sv AS sv2
             FROM a)
           SELECT k AS l_partkey, CAST(n AS BIGINT) AS n_periods,
             round(CASE WHEN sv > 0 THEN
               sqrt(CAST(varnum AS DOUBLE)) / CAST(sv AS DOUBLE) END, 6)
               AS cv,
             CASE WHEN varnum = 0 THEN 'X'
                  WHEN varnum * 4 < sv2 THEN 'X'
                  WHEN varnum < sv2 THEN 'Y' ELSE 'Z' END AS xyz_class
           FROM e ORDER BY l_partkey""",

      "abc_parts" ->
        """WITH u AS (
             SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000
                 AS BIGINT)) AS BIGINT) AS rev_u
             FROM lineitem GROUP BY 1
           ), j AS (
             SELECT p.p_brand, p.p_partkey, u.rev_u
             FROM u JOIN part p ON u.l_partkey = p.p_partkey
           ), w AS (
             SELECT p_brand, p_partkey, rev_u,
               CAST(row_number() OVER (PARTITION BY p_brand
                 ORDER BY rev_u DESC, p_partkey) AS BIGINT) AS rank,
               CAST(sum(rev_u) OVER (PARTITION BY p_brand
                 ORDER BY rev_u DESC, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(sum(rev_u) OVER (PARTITION BY p_brand) AS BIGINT)
                 AS tot
             FROM j)
           SELECT p_brand, p_partkey, rank, rev_u AS value,
             cum AS cum_value,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
           FROM w ORDER BY p_brand, rank""",

      // Gini replay: identical decimal rank sums, the same double
      // tree — ties rank-broken on custkey in both engines
      "revenue_gini" ->
        """WITH rev AS (
             SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
             FROM orders GROUP BY 1
           ), j AS (
             SELECT n.n_name AS nation, c.c_custkey AS id,
               CAST(r.rev AS DECIMAL(12,2)) AS x
             FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
           ), ix AS (
             SELECT nation, x, row_number() OVER (PARTITION BY nation
               ORDER BY x, id) AS i
             FROM j
           ), s AS (
             SELECT nation, count(*) AS n_units, sum(x) AS sx,
               sum(x * i) AS six
             FROM ix GROUP BY 1)
           SELECT nation, n_units, CAST(sx AS DOUBLE) AS total_value,
             round(CASE WHEN CAST(sx AS DOUBLE) > 0 THEN
               (2.0 * CAST(six AS DOUBLE)
                 - (CAST(n_units AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
               / (CAST(n_units AS DOUBLE) * CAST(sx AS DOUBLE)) END, 6)
               AS gini
           FROM s ORDER BY nation""",

      // per-edge orphan audit; synthetic TPC-H data should be clean —
      // the zero counts ARE the assertion
      "dq_referential" ->
        """SELECT 'orders.custkey->customer' AS relationship,
             count(*) AS n_child, count(DISTINCT o_custkey) AS n_keys,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphan_rows,
             count(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o_custkey END)
               AS n_orphan_keys
           FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o_custkey = c.c_custkey WHERE o_custkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.orderkey->orders',
             count(*), count(DISTINCT l_orderkey),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l_orderkey = o.o_orderkey WHERE l_orderkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.partkey->part',
             count(*), count(DISTINCT l_partkey),
             CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN p.p_partkey IS NULL THEN l_partkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             ON l_partkey = p.p_partkey WHERE l_partkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.suppkey->supplier',
             count(*), count(DISTINCT l_suppkey),
             CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN s.s_suppkey IS NULL THEN l_suppkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
             ON l_suppkey = s.s_suppkey WHERE l_suppkey IS NOT NULL
           ORDER BY relationship""",

      // the definitional dominance scan grades the sorted-window
      // frontier (≡ by the per-x-max + strictly-greater-x argument)
      "skyline_frontier" ->
        """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders r
           WHERE NOT EXISTS (
             SELECT 1 FROM orders s
             WHERE s.o_totalprice >= r.o_totalprice
               AND s.o_orderdate >= r.o_orderdate
               AND (s.o_totalprice > r.o_totalprice
                 OR s.o_orderdate > r.o_orderdate))
           ORDER BY o_orderkey""",

      // one row per proposed combo; the tuple count(DISTINCT (...))
      // replays Spark's struct-distinct exactly
      "dq_candidate_keys" ->
        """WITH n AS (SELECT count(*) AS n_rows FROM orders)
           SELECT columns, n_rows, n_distinct,
             round(n_distinct / CAST(n_rows AS DOUBLE), 6) AS uniqueness,
             n_distinct = n_rows AS is_key
           FROM (
             SELECT 'o_orderkey' AS columns, n_rows,
               (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct FROM n
             UNION ALL SELECT 'o_custkey', n_rows,
               (SELECT count(DISTINCT o_custkey) FROM orders) FROM n
             UNION ALL SELECT 'o_orderstatus', n_rows,
               (SELECT count(DISTINCT o_orderstatus) FROM orders) FROM n
             UNION ALL SELECT 'o_orderdate', n_rows,
               (SELECT count(DISTINCT o_orderdate) FROM orders) FROM n
             UNION ALL SELECT 'o_custkey,o_orderdate', n_rows,
               (SELECT count(DISTINCT (o_custkey, o_orderdate)) FROM orders) FROM n
             UNION ALL SELECT 'o_orderdate,o_orderstatus', n_rows,
               (SELECT count(DISTINCT (o_orderdate, o_orderstatus)) FROM orders) FROM n)
           ORDER BY columns""",

      "audience_overlap" ->
        """SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_users
           FROM (SELECT DISTINCT event_type, user_id FROM events) a
           JOIN (SELECT DISTINCT event_type, user_id FROM events) b
             ON a.user_id = b.user_id
           WHERE a.event_type < b.event_type
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // bin arithmetic stated verbatim (pure IEEE double: sub, div,
      // mul, floor — bit-identical cross-engine)
      "events_value_histogram" ->
        """WITH s AS (
             SELECT event_type, min(value) AS mn, max(value) AS mx
             FROM events GROUP BY 1)
           SELECT e.event_type,
             CASE WHEN s.mx > s.mn
               THEN CAST(least(19, floor((e.value - s.mn) / (s.mx - s.mn) * 20)) AS BIGINT)
               ELSE 0 END AS bin,
             count(*) AS n
           FROM events e JOIN s ON e.event_type = s.event_type
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // wide pivot melted back to long: every (user, type) cell
      // explicit, zeros included
      "events_pivot_melt" ->
        """SELECT user_id, t.event_type,
             CAST(count(*) FILTER (WHERE e.event_type = t.event_type) AS BIGINT) AS n_events
           FROM events e
           CROSS JOIN (VALUES ('click'), ('view'), ('purchase'),
             ('signup'), ('error')) AS t(event_type)
           GROUP BY user_id, t.event_type
           ORDER BY user_id, t.event_type""",

      "bloom_point_read" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders WHERE o_orderkey = 1234""",

      // exact interpolated percentiles (the dq_numeric_profile
      // machinery) + per-row clamp
      "events_winsorized" ->
        """WITH b AS (
             SELECT event_type, quantile_cont(value, 0.01) AS lo,
               quantile_cont(value, 0.99) AS hi
             FROM events GROUP BY 1)
           SELECT event_id, e.event_type, value,
             least(greatest(value, lo), hi) AS clipped
           FROM events e JOIN b ON e.event_type = b.event_type
           ORDER BY event_id""",

      "events_transitions" ->
        """WITH o AS (
             SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
             FROM events)
           SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
           FROM o WHERE next_type IS NOT NULL
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // Markov accuracy replay: same lead() bigrams, (count desc,
      // type asc) argmax, one division
      "events_markov_accuracy" ->
        """WITH o AS (
             SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
             FROM events
           ), c AS (
             SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
             FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
           ), p AS (
             SELECT from_type, to_type AS predicted_next, n AS n_correct,
               row_number() OVER (PARTITION BY from_type
                 ORDER BY n DESC, to_type) AS rn
             FROM c
           ), t AS (
             SELECT from_type, CAST(sum(n) AS BIGINT) AS n_transitions
             FROM c GROUP BY 1)
           SELECT t.from_type, t.n_transitions, p.predicted_next,
             p.n_correct,
             round(CAST(p.n_correct AS DOUBLE)
               / CAST(t.n_transitions AS DOUBLE), 6) AS accuracy
           FROM t JOIN p ON t.from_type = p.from_type AND p.rn = 1
           ORDER BY t.from_type""",

      // integral trailing-hour RANGE frame (date_diff = floor'd epoch
      // seconds, matching Spark's unix_timestamp truncation)
      "events_rolling_range" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id
               ORDER BY date_diff('second', TIMESTAMP '1970-01-01', CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_value
           FROM events ORDER BY user_id, event_id""",

      "events_value_deciles" ->
        """WITH d AS (
             SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS decile
             FROM events)
           SELECT event_type, decile, count(*) AS n_rows,
             min(value) AS lo, max(value) AS hi
           FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

      // the PLAIN join — bloom pruning must be invisible in the result
      "bloom_reduced_join" ->
        """SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem, supplier, nation, region
           WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
           GROUP BY n_name ORDER BY n_name""",

      "q22_no_orders" ->
        """SELECT c_mktsegment,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
           FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "rollup_revenue" ->
        """SELECT n_name, order_year,
             CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n_name, year(o_orderdate) AS order_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey)
           GROUP BY ROLLUP (n_name, order_year)
           ORDER BY n_name NULLS FIRST, order_year NULLS FIRST""",

      "segment_distincts" ->
        """SELECT c_mktsegment,
             count(DISTINCT c_nationkey) AS n_nations,
             count(*) AS n_customers
           FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "dq_profile" ->
        """SELECT column_name, n_rows, n_null, n_distinct, min_value, max_value FROM (
             SELECT 'o_orderstatus' AS column_name, count(*) AS n_rows,
               count(*) FILTER (WHERE o_orderstatus IS NULL) AS n_null,
               count(DISTINCT o_orderstatus) AS n_distinct,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_value FROM orders
             UNION ALL
             SELECT 'o_custkey', count(*),
               count(*) FILTER (WHERE o_custkey IS NULL),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
             UNION ALL
             SELECT 'o_totalprice', count(*),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
           ) ORDER BY column_name""",

      "cdc_incremental_filter" ->
        s"""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
           FROM events WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
           ORDER BY event_id""",

      "cdc_last_loaded" ->
        "SELECT max(CAST(ts AS TIMESTAMP)) AS last_ts FROM events",

      "cdc_dedup_latest" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      "cdc_upsert" ->
        """WITH latest AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
             WHERE rn = 1
           ), latest_p AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events WHERE event_type = 'purchase') t
             WHERE rn = 1)
           SELECT l.user_id AS user_id,
             CASE WHEN p.user_id IS NOT NULL THEN p.event_id ELSE l.event_id END AS event_id,
             CASE WHEN p.user_id IS NOT NULL THEN p.ts ELSE l.ts END AS ts,
             CASE WHEN p.user_id IS NOT NULL THEN p.event_type ELSE l.event_type END AS event_type,
             CASE WHEN p.user_id IS NOT NULL THEN p.value ELSE l.value END AS value
           FROM latest l LEFT JOIN latest_p p ON l.user_id = p.user_id
           ORDER BY user_id""",

      "cdc_snapshot_load" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment, TIMESTAMP '2026-08-12 00:00:00' AS snapshot_date
           FROM customer ORDER BY customer_id""",

      "scd2_history" ->
        """SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS valid_from,
             CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS TIMESTAMP) AS valid_to
           FROM events ORDER BY user_id, valid_from, event_id""",

      "scd2_current" ->
        """SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS valid_from
           FROM (SELECT *, lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS nxt FROM events)
           WHERE nxt IS NULL ORDER BY user_id""",

      "scd2_asof" ->
        s"""SELECT user_id, event_id, event_type, valid_from, valid_to FROM (
             SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS valid_from,
               CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS TIMESTAMP) AS valid_to
             FROM events)
           WHERE valid_from <= TIMESTAMP '$CdcCutoff'
             AND (valid_to IS NULL OR valid_to > TIMESTAMP '$CdcCutoff')
           ORDER BY user_id""",

      "dq_freshness" ->
        """SELECT max_loaded_at, lag_sec,
             CASE WHEN lag_sec IS NULL OR lag_sec > 2592000 THEN 'error'
                  WHEN lag_sec > 3600 THEN 'warn'
                  ELSE 'pass' END AS status
           FROM (
             SELECT max(CAST(ts AS TIMESTAMP)) AS max_loaded_at,
               CAST(epoch(TIMESTAMP '2024-04-01 00:00:00') AS BIGINT)
                 - CAST(epoch(max(CAST(ts AS TIMESTAMP))) AS BIGINT) AS lag_sec
             FROM events)""",

      // variance from Σn (long) and Σn² summed in DOUBLE (the long
      // square overflows at ~3e9-row days; doubles stay bit-exact
      // while Σn² < 2^53, true at any graded SF); z null under 2 days
      "dq_volume_anomaly" ->
        """WITH c AS (
             SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_ts,
               count(*) AS n_rows
             FROM events GROUP BY 1
           ), m AS (
             SELECT bucket_ts, n_rows,
               count(*) OVER () AS nn,
               CAST(sum(n_rows) OVER () AS DOUBLE) AS s1,
               sum(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) OVER () AS s2
             FROM c
           ), z AS (
             SELECT bucket_ts, n_rows,
               CASE WHEN nn < 2
                      OR (s2 - s1 * s1 / CAST(nn AS DOUBLE))
                         / CAST(greatest(nn - 1, 1) AS DOUBLE) <= 0.0 THEN NULL
                 ELSE round((CAST(n_rows AS DOUBLE) - s1 / CAST(nn AS DOUBLE))
                   / sqrt((s2 - s1 * s1 / CAST(nn AS DOUBLE))
                          / CAST(greatest(nn - 1, 1) AS DOUBLE)), 6) END AS z_score
             FROM m)
           SELECT bucket_ts, n_rows, z_score,
             coalesce(abs(z_score) > 3.0, false) AS is_anomaly
           FROM z ORDER BY bucket_ts""",

      // seasonal-naive anomaly (r9): dense hourly grid, trailing-7
      // same-hour-of-day moment sums — identical closed form to the
      // Spark side, round(6) per the cross-engine discipline
      "dq_seasonal_anomaly" ->
        """WITH c AS (
             SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
               count(*) AS n
             FROM events GROUP BY 1
           ), bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
           grid AS (
             SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
             FROM bounds
           ), dense AS (
             SELECT g.bucket_ts, coalesce(c.n, 0) AS n_rows
             FROM grid g LEFT JOIN c ON c.b = g.bucket_ts
           ), m AS (
             SELECT bucket_ts, n_rows,
               count(*) OVER w AS baseline_n,
               CAST(sum(n_rows) OVER w AS DOUBLE) AS s1,
               sum(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) OVER w AS s2
             FROM dense
             WINDOW w AS (PARTITION BY extract(hour FROM bucket_ts)
               ORDER BY bucket_ts
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           ), z AS (
             SELECT bucket_ts, n_rows, baseline_n,
               CASE WHEN baseline_n < 3
                      OR (s2 - s1 * s1 / CAST(baseline_n AS DOUBLE))
                         / CAST(greatest(baseline_n - 1, 1) AS DOUBLE) <= 0.0
                    THEN NULL
                 ELSE round((CAST(n_rows AS DOUBLE) - s1 / CAST(baseline_n AS DOUBLE))
                   / sqrt((s2 - s1 * s1 / CAST(baseline_n AS DOUBLE))
                          / CAST(greatest(baseline_n - 1, 1) AS DOUBLE)), 6) END AS z_score
             FROM m)
           SELECT bucket_ts, n_rows, baseline_n, z_score,
             coalesce(abs(z_score) > 2.0, false) AS is_anomaly
           FROM z ORDER BY bucket_ts""",

      "stg_customer" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      "stg_event_log" ->
        """SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS created_at,
             CASE WHEN event_type = 'error' THEN CAST(ts AS TIMESTAMP) END AS deleted_at
           FROM events ORDER BY event_id""",

      "stg_soft_delete" ->
        """SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS created_at,
             CAST(NULL AS TIMESTAMP) AS deleted_at
           FROM events WHERE event_type <> 'error' ORDER BY event_id""",

      "scd2_merge" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      // md5 row fingerprints recomputed in SQL; change = hash diff
      "scd2_merge_hashdiff" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment,
                    md5(concat_ws(chr(1),
                      coalesce(c_name, chr(0)),
                      coalesce(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), chr(0)),
                      coalesce(c_mktsegment, chr(0)))) AS row_hash
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment,
                    md5(concat_ws(chr(1),
                      coalesce(customer_name, chr(0)),
                      coalesce(CAST(CAST(account_balance AS DECIMAL(12,2)) AS VARCHAR), chr(0)),
                      coalesce(CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END, chr(0)))) AS row_hash
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.row_hash <> s2.row_hash)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  row_hash,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  row_hash,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      "reconcile_diff" ->
        """WITH src AS (
             SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
           tgt AS (
             SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN 'DRIFTED'
                    ELSE c_mktsegment END AS c_mktsegment,
               c_acctbal
             FROM customer WHERE c_custkey % 13 <> 0
             UNION ALL
             SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
             FROM customer WHERE c_custkey % 17 = 0)
           SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN s.c_custkey IS NULL THEN 'target_only'
                  WHEN t.c_custkey IS NULL THEN 'source_only'
                  WHEN s.c_mktsegment IS DISTINCT FROM t.c_mktsegment
                    OR s.c_acctbal IS DISTINCT FROM t.c_acctbal THEN 'mismatch'
                  ELSE 'match' END AS verdict,
             CASE WHEN s.c_custkey IS NULL OR t.c_custkey IS NULL THEN NULL
                  ELSE s.c_mktsegment IS DISTINCT FROM t.c_mktsegment END
               AS c_mktsegment_differs,
             CASE WHEN s.c_custkey IS NULL OR t.c_custkey IS NULL THEN NULL
                  ELSE s.c_acctbal IS DISTINCT FROM t.c_acctbal END
               AS c_acctbal_differs
           FROM src s FULL OUTER JOIN tgt t ON s.c_custkey = t.c_custkey
           ORDER BY c_custkey""",

      "scd2_merge_harddelete" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                         OR customer_id % 7 = 0
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      // r9 write-path grades: every oracle states the POST-maintenance
      // table content in plain SQL over the source tables
      "sink_upsert" ->
        """WITH base AS (
             SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             FROM orders)
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN TIMESTAMP '1999-12-31 00:00:00'
                  ELSE o_orderdate END AS o_orderdate
           FROM base
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderdate
           FROM base WHERE o_orderkey % 7 = 0
           ORDER BY o_orderkey""",

      // append accumulates: the whole table plus the %3 slice again
      "sink_jdbc_append" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0
           ORDER BY o_orderkey, o_custkey""",

      // partitioned incremental extract: the striped live-Derby read
      // must return exactly the watermark delta (stripes are a
      // PARALLELISM mechanism, never a filter — rows outside the
      // bounds land in edge stripes, so the content is bound-free)
      "source_jdbc_partitioned" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
           FROM orders
           WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
           ORDER BY o_orderkey""",

      // truncate+insert: only the second (post-cutoff) load survives
      "sink_jdbc_overwrite" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders
           WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
           ORDER BY o_orderkey""",

      // staged warehouse upsert: identical post-maintenance content
      // to the parquet-path sink_upsert — updates replace their keys,
      // new keys append
      "sink_jdbc_upsert" ->
        """WITH base AS (
             SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             FROM orders)
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN TIMESTAMP '1999-12-31 00:00:00'
                  ELSE o_orderdate END AS o_orderdate
           FROM base
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderdate
           FROM base WHERE o_orderkey % 7 = 0
           ORDER BY o_orderkey""",

      "sink_dynamic_overwrite" ->
        """SELECT o_orderkey, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderpriority <> '1-URGENT'
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2.0, o_orderpriority
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
           ORDER BY o_orderkey""",

      "cdc_full_snapshot" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      "incr_model_materialize" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value
           FROM events ORDER BY event_id""",

      "staged_load" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      // the contract verdict table, stated literally
      "schema_compat_report" ->
        """SELECT * FROM (VALUES
             ('event_id', 'bigint', 'bigint', 'unchanged', true),
             ('event_type', 'string', 'string', 'unchanged', true),
             ('props', CAST(NULL AS VARCHAR), 'string', 'added', true),
             ('ts', 'timestamp', CAST(NULL AS VARCHAR), 'removed', false),
             ('user_id', 'bigint', 'int', 'widened', true),
             ('value', 'double', 'string', 'changed', false)
           ) AS t("column", contract_type, incoming_type, change, compatible)
           ORDER BY "column"""",
  )
}
