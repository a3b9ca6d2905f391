package graft

import graft.EntryHelpers.CdcCutoff
import graft.OracleFragments._

/** Oracle-registry shard 3/6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard3 {
  val m: Map[String, String] = Map(
      // vacuum grades the HEAD content: v3 replaced the table with
      // the doubled-balance even-customer slice
      "versioned_vacuum" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_acctbal * 2 AS account_balance
           FROM customer WHERE c_custkey % 2 = 0
           ORDER BY customer_id""",

      "versioned_time_travel" ->
        """WITH base AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer)
           SELECT 'v1' AS version_tag, customer_id, customer_name,
                  account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS updated_at
           FROM base WHERE customer_id % 2 = 0
           UNION ALL
           SELECT 'v2', customer_id, customer_name,
                  CASE WHEN customer_id % 4 = 0 THEN account_balance + 1000
                       ELSE account_balance END,
                  market_segment,
                  CASE WHEN customer_id % 4 = 0
                       THEN TIMESTAMP '2026-02-01 00:00:00'
                       ELSE TIMESTAMP '2026-01-01 00:00:00' END
           FROM base WHERE customer_id % 2 = 0
           UNION ALL
           SELECT 'v2', customer_id, customer_name, account_balance,
                  market_segment, TIMESTAMP '2026-02-01 00:00:00'
           FROM base WHERE customer_id % 2 = 1 AND customer_id % 3 = 0
           ORDER BY version_tag, customer_id""",

      "bucketed_join" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "dag_run_mart" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_name || ' [' || c_mktsegment || ']' AS display_name,
             c_acctbal AS account_balance, c_mktsegment AS market_segment,
             n_name AS nation_name, r_name AS region_name
           FROM customer
           LEFT JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN region ON n_regionkey = r_regionkey
           ORDER BY customer_id""",

      // backfill equivalence stated directly: chunked day-partition
      // runs (plus one retried chunk) must reproduce the one-shot
      // full rebuild — the oracle IS that rebuild
      "pipeline_backfill" ->
        """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // two scheduler windows replayed directly: run 1 = the day-1
      // watermark slice, run 2 = the catch-up slice (three folded
      // daily ticks) plus the Sunday total row — per-run aggregates
      // over the two cutoffs stated as plain SQL
      "pipeline_schedule_replay" ->
        """WITH r1 AS (
             SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
             FROM orders
             WHERE o_orderdate <= TIMESTAMP '1995-06-30 00:00:00'
             GROUP BY o_orderpriority
           ), r2 AS (
             SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
             FROM orders
             WHERE o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
             GROUP BY o_orderpriority)
           SELECT o_orderpriority, n, revenue, CAST(1 AS BIGINT) AS run_seq
           FROM r1
           UNION ALL
           SELECT o_orderpriority, n, revenue, CAST(2 AS BIGINT) FROM r2
           UNION ALL
           SELECT '__TOTAL__', CAST(sum(n) AS BIGINT),
             CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE),
             CAST(2 AS BIGINT)
           FROM r2
           ORDER BY run_seq, o_orderpriority""",

      // the fold converges to the change-log window construction:
      // union the four states, keep rows whose attributes differ from
      // the key's previous state, valid_to = next change time
      "scd2_mergeall_fold" ->
        """WITH s0 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           snaps AS (
             SELECT customer_id, customer_name, account_balance,
                    market_segment,
                    TIMESTAMP '2026-01-01 00:00:00' AS vt FROM s0
             UNION ALL
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-02-01 00:00:00' FROM s0
             UNION ALL
             SELECT customer_id, customer_name,
                    CASE WHEN customer_id % 3 = 0 THEN account_balance + 100
                         ELSE account_balance END,
                    CASE WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-03-01 00:00:00' FROM s0
             UNION ALL
             SELECT customer_id, customer_name,
                    CASE WHEN customer_id % 3 = 0 THEN account_balance + 100
                         ELSE account_balance END,
                    CASE WHEN customer_id % 7 = 0 THEN 'SEG_T3'
                         WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-04-01 00:00:00' FROM s0),
           marked AS (
             SELECT *,
               lag(market_segment) OVER w AS p_seg,
               lag(account_balance) OVER w AS p_bal,
               lag(customer_name) OVER w AS p_name
             FROM snaps WINDOW w AS (PARTITION BY customer_id ORDER BY vt)),
           versions AS (
             SELECT customer_id, customer_name, account_balance,
                    market_segment, vt
             FROM marked
             WHERE p_seg IS NULL OR market_segment <> p_seg
                OR account_balance <> p_bal OR customer_name <> p_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  vt AS valid_from,
                  lead(vt) OVER (PARTITION BY customer_id ORDER BY vt)
                    AS valid_to
           FROM versions
           ORDER BY customer_id, valid_from""",

      // the two-day pipeline replay: the day-2 snapshot is the day-1
      // source after a segment UPDATE (%10) and hard DELETEs (%7) —
      // deterministic id arithmetic, so the SCD2 fold replays as SQL;
      // the Derby extract round trip is value-preserving; the two
      // staged event loads are provably the whole events table
      // (watermark = max loaded ts), so n_events is a plain rollup
      "pipeline_day_replay" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_nationkey AS nation_id, c_acctbal AS account_balance,
                    c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, nation_id, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name),
           hist AS (
             SELECT customer_id, customer_name, nation_id, account_balance,
                    market_segment,
                    TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                    CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                           OR customer_id % 7 = 0
                         THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
             FROM s1
             UNION ALL
             SELECT customer_id, customer_name, nation_id, account_balance,
                    market_segment,
                    TIMESTAMP '2026-02-01 00:00:00', NULL
             FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)),
           fct AS (
             SELECT o_custkey AS customer_id,
                    count(DISTINCT o_orderkey) AS n_orders,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                      AS revenue
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             GROUP BY o_custkey),
           ev AS (
             SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
           SELECT h.customer_id, h.customer_name, h.account_balance,
                  h.market_segment, n.n_name AS nation_name,
                  r.r_name AS region_name, h.valid_from, h.valid_to,
                  coalesce(f.n_orders, 0) AS n_orders,
                  coalesce(f.revenue, 0.0) AS revenue,
                  coalesce(e.n_events, 0) AS n_events
           FROM hist h
           LEFT JOIN nation n ON h.nation_id = n.n_nationkey
           LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
           LEFT JOIN fct f ON h.customer_id = f.customer_id
           LEFT JOIN ev e ON h.customer_id = e.user_id
           ORDER BY h.customer_id, h.valid_from""",

      // the gate's Benford screen over the day-2 current rows: the
      // replay's surviving customers are pure id arithmetic, so the
      // digit table is replayable without the pipeline
      "pipeline_day_replay_dq" ->
        """WITH s2 AS (
             SELECT c_acctbal AS account_balance
             FROM customer WHERE c_custkey % 7 <> 0),
           keyed AS (
             SELECT CAST(regexp_extract(
               CAST(CAST(abs(account_balance) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') AS INTEGER) AS digit
             FROM s2
             WHERE regexp_extract(
               CAST(CAST(abs(account_balance) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') <> ''
           ), counts AS (
             SELECT digit, count(*) AS n FROM keyed GROUP BY 1)
           SELECT digit, n,
             round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
               AS obs_share,
             round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
             round(abs(
               round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6) -
               round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
           FROM counts ORDER BY digit""",

      "range_join_rewrite" ->
        """WITH days AS (
             SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start
             FROM events)
           SELECT day_start, count(*) AS n_events
           FROM events e JOIN days d
             ON CAST(e.ts AS TIMESTAMP) >= d.day_start
            AND CAST(e.ts AS TIMESTAMP)
                  <= d.day_start + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND
           GROUP BY day_start ORDER BY day_start""",

      "stream_cdc_apply" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      // the JDBC warehouse table after bootstrap + merge + a skipped
      // poisoned redelivery must equal the same latest-per-user
      // recompute — an applied poison row or double-applied batch
      // shows up as extra/shifted rows
      "stream_cdc_jdbc_exactly_once" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      // the streaming window agg must converge to the batch rollup
      "stream_hourly_counts" ->
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // lag-islands replay of session_window: break at gap >= 30 min
      // (Spark merges only strictly-overlapping windows), session end
      // = last event + gap
      "stream_session_windows" ->
        """WITH e AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
           ), m AS (
             SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), sess AS (
             SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
             FROM m)
           SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM sess GROUP BY user_id, sid
           ORDER BY user_id, session_start""",

      // token arithmetic replayed: substr(md5(salt||key),1,16)
      "pii_pseudonymized_join" ->
        """WITH ct AS (
             SELECT substr(md5('tenant-a' || CAST(c_custkey AS VARCHAR)), 1, 16)
               AS token, c_mktsegment FROM customer
           ), ot AS (
             SELECT substr(md5('tenant-a' || CAST(o_custkey AS VARCHAR)), 1, 16)
               AS token FROM orders)
           SELECT c_mktsegment, count(*) AS n_orders,
             count(DISTINCT token) AS n_customers,
             min(token) AS sample_token
           FROM ct JOIN ot USING (token)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      // the definitional scan grades the whole index → intersect →
      // verify path (≡ by the no-false-negative trigram pigeonhole)
      "doc_substring_search" ->
        """SELECT doc_id FROM documents
           WHERE contains(text, 'data group') ORDER BY doc_id""",

      // the definitional padded-text position scan (counts EVERY
      // occurrence, overlapping included — regex/replace tricks
      // can't) grades the anchor-vote positional intersect; shared by
      // the fresh-build and maintained-index forms, which are
      // row-identical by the per-doc postings argument
      "doc_phrase_search" -> phraseSearchOracleSql,
      "doc_phrase_search_incr" -> phraseSearchOracleSql,

      // per-phrase every-offset scan union grades the one-pass
      // multi-phrase probe (overlaps counted, token first positions)
      "doc_multi_phrase" ->
        """WITH pats AS (
             SELECT * FROM (VALUES (' table table '), (' value table '),
               (' fast sort key '), (' quantum leap ')) p(pp)
           ), d AS (
             SELECT doc_id,
               ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' ' AS p
             FROM documents
           ), m AS (
             SELECT trim(pp) AS pattern, doc_id, i.gs AS cpos, d.p
             FROM d CROSS JOIN pats,
               LATERAL (SELECT unnest(generate_series(1, length(d.p))) AS gs) i
             WHERE substr(d.p, i.gs, length(pp)) = pp
           )
           SELECT pattern, doc_id, count(*) AS n_matches,
             min(length(substr(p, 1, cpos))
                 - length(replace(substr(p, 1, cpos), ' ', ''))) AS first_pos
           FROM m GROUP BY 1, 2 ORDER BY pattern, doc_id""",

      // per-pattern scan union grades the one-pass batch probe
      "doc_multi_search" ->
        """SELECT p.pattern, d.doc_id
           FROM documents d CROSS JOIN (VALUES
             ('data group'), ('window dup'), ('sort merge part'),
             ('spark group')) p(pattern)
           WHERE contains(d.text, p.pattern)
           ORDER BY p.pattern, d.doc_id""",

      // prunedRead ≡ the plain filtered read — ordinary SQL grades
      // the whole clustered-write → stats → file-skip path
      "clustered_prune_read" ->
        """SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           FROM orders
           WHERE o_totalprice BETWEEN 50000.0 AND 100000.0
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      "zorder_prune_read" ->
        """SELECT count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
           FROM lineitem
           WHERE l_partkey BETWEEN 100 AND 400
             AND l_suppkey BETWEEN 10 AND 40""",

      // maintenance must never change the row set: both the compacted
      // and the re-clustered orders table equal the plain source scan
      "sink_compact" ->
        """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
           FROM orders ORDER BY o_orderkey""",
      "sink_clustered_write" ->
        """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
           FROM orders ORDER BY o_orderkey""",

      // VALUES-literal oracle (zero data): the crafted file's
      // deterministic split — good rows parse, bad rows keep raw text
      // roundtrip oracles: the parquet table verbatim — equality
      // proves the format paths are lossless
      "source_orc_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",
      "source_csv_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",
      "source_jsonl_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",

      "source_quarantine" ->
        """SELECT * FROM (VALUES
             ('good', CAST(1 AS BIGINT), CAST('alpha' AS VARCHAR), CAST(10 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('good', CAST(2 AS BIGINT), CAST('beta' AS VARCHAR), CAST(20 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('good', CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(40 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('quarantine', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST('{"id": "x", "name": "gamma", "qty": 3}' AS VARCHAR)),
             ('quarantine', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST('this is not json' AS VARCHAR)))
             AS t(kind, id, name, qty, raw_record)
           ORDER BY kind, coalesce(raw_record, ''), coalesce(id, -1)""",

      // the salted machinery must be invisible: plain inner join
      "skew_salted_join" ->
        """SELECT e.event_id, e.user_id, c.c_name AS customer_name,
             c.c_mktsegment AS market_segment, e.value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           ORDER BY e.event_id""",

      // redelivered input deduped back to exactly-once = the raw table
      "stream_dedup" ->
        """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
           FROM events ORDER BY event_id""",

      "cdc_snapshot_diff" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  change_type FROM (
             SELECT coalesce(n.customer_id, o.customer_id) AS customer_id,
               CASE WHEN n.customer_id IS NOT NULL THEN n.customer_name
                    ELSE o.customer_name END AS customer_name,
               CASE WHEN n.customer_id IS NOT NULL THEN n.account_balance
                    ELSE o.account_balance END AS account_balance,
               CASE WHEN n.customer_id IS NOT NULL THEN n.market_segment
                    ELSE o.market_segment END AS market_segment,
               CASE WHEN o.customer_id IS NULL THEN 'insert'
                    WHEN n.customer_id IS NULL THEN 'delete'
                    WHEN o.customer_name IS DISTINCT FROM n.customer_name
                      OR o.account_balance IS DISTINCT FROM n.account_balance
                      OR o.market_segment IS DISTINCT FROM n.market_segment
                    THEN 'update' END AS change_type
             FROM s1 o FULL OUTER JOIN s2 n ON o.customer_id = n.customer_id)
           WHERE change_type IS NOT NULL
           ORDER BY customer_id""",

      "events_pivot" ->
        """SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'view') AS view,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
           FROM events GROUP BY user_id ORDER BY user_id""",

      "flatten_props" ->
        """SELECT event_id, user_id,
             event_type AS attrs_event_type, value AS attrs_value,
             CAST(json_extract(props, '$.k') AS INT) AS props_k
           FROM events ORDER BY event_id""",

      "schema_evolution" ->
        s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             CASE WHEN CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
                  THEN value END AS value
           FROM events ORDER BY event_id""",

      "stg_events" ->
        s"""SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS created_at
           FROM events
           WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
           ORDER BY event_id""",

      "skew_salted_agg" ->
        """SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             count(*) AS n_rows,
             min(user_id) AS min_user, max(user_id) AS max_user
           FROM events GROUP BY event_type ORDER BY event_type""",

      "dim_customer" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_name || ' [' || c_mktsegment || ']' AS display_name,
             c_acctbal AS account_balance, c_mktsegment AS market_segment,
             n_name AS nation_name, r_name AS region_name
           FROM customer
           LEFT JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN region ON n_regionkey = r_regionkey
           ORDER BY customer_id""",

      "dim_order" ->
        """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
             o_orderstatus AS order_status, o_totalprice AS total_price,
             o_orderdate AS order_date, o_orderpriority AS order_priority,
             c_name AS customer_name, c_mktsegment AS market_segment,
             n_name AS nation_name
           FROM orders
           LEFT JOIN customer ON o_custkey = c_custkey
           LEFT JOIN nation ON c_nationkey = n_nationkey
           ORDER BY order_id""",

      "fact_lineitem" ->
        """SELECT l_orderkey AS order_id, l_linenumber AS line_number,
             l_partkey AS part_id, l_suppkey AS supplier_id,
             l_quantity AS quantity, l_extendedprice AS extended_price,
             l_discount AS discount, l_shipdate AS ship_date,
             o_custkey AS customer_id, o_orderstatus AS order_status,
             o_orderdate AS order_date,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           FROM lineitem
           LEFT JOIN orders ON l_orderkey = o_orderkey
           ORDER BY order_id, line_number""",

      // lineage of the static model graph: topology + all-succeeded
      // run replayed as literals
      "pipeline_lineage" ->
        """SELECT * FROM (VALUES
             ('dim_customer', 'marts', 2, 'stg_customer',
              'dim_order,fact_lineitem', 'succeeded', CAST(NULL AS VARCHAR)),
             ('dim_order', 'marts', 3, 'dim_customer',
              'fact_lineitem', 'succeeded', CAST(NULL AS VARCHAR)),
             ('dq_checks', 'quality', 5, 'fact_lineitem',
              '', 'succeeded', CAST(NULL AS VARCHAR)),
             ('extract_raw', 'sources', 0, '',
              'stg_customer,stg_events', 'succeeded', CAST(NULL AS VARCHAR)),
             ('fact_lineitem', 'marts', 4, 'dim_customer,dim_order',
              'dq_checks', 'succeeded', CAST(NULL AS VARCHAR)),
             ('stg_customer', 'staging', 1, 'extract_raw',
              'dim_customer', 'succeeded', CAST(NULL AS VARCHAR)),
             ('stg_events', 'staging', 1, 'extract_raw',
              '', 'succeeded', CAST(NULL AS VARCHAR))
           ) AS t(node_name, group_name, level, deps, dependents,
                  status, root_cause)
           ORDER BY node_name""",

      // routing outcome stated literally: prod carries the full
      // mart under its fixed schema, dev only its slice under the
      // per-developer namespace, the dropped CI schemas nothing
      "namespace_routing" ->
        """WITH m AS (
             SELECT o_orderpriority, count(*) AS n_orders
             FROM orders GROUP BY 1)
           SELECT 'analytics_mart' AS env_schema, o_orderpriority, n_orders
           FROM m
           UNION ALL
           SELECT 'ada', o_orderpriority, n_orders
           FROM m WHERE o_orderpriority = '1-URGENT'
           ORDER BY env_schema, o_orderpriority""",

      // the catalog is schema metadata — replayed literally
      "pipeline_catalog" ->
        """SELECT * FROM (VALUES
             ('dim_customer', 'marts', 2, 0, 'customer_id', 'bigint', true),
             ('dim_customer', 'marts', 2, 1, 'customer_name', 'string', true),
             ('dim_customer', 'marts', 2, 2, 'display_name', 'string', true),
             ('dim_customer', 'marts', 2, 3, 'account_balance', 'double', true),
             ('dim_customer', 'marts', 2, 4, 'market_segment', 'string', true),
             ('dim_customer', 'marts', 2, 5, 'nation_name', 'string', true),
             ('dim_customer', 'marts', 2, 6, 'region_name', 'string', true),
             ('dim_order', 'marts', 3, 0, 'customer_id', 'bigint', true),
             ('dim_order', 'marts', 3, 1, 'order_id', 'bigint', true),
             ('dim_order', 'marts', 3, 2, 'order_status', 'string', true),
             ('dim_order', 'marts', 3, 3, 'total_price', 'double', true),
             ('dim_order', 'marts', 3, 4, 'order_date', 'timestamp_ntz', true),
             ('dim_order', 'marts', 3, 5, 'order_priority', 'string', true),
             ('dim_order', 'marts', 3, 6, 'customer_name', 'string', true),
             ('dim_order', 'marts', 3, 7, 'market_segment', 'string', true),
             ('dim_order', 'marts', 3, 8, 'nation_name', 'string', true),
             ('fact_lineitem', 'marts', 4, 0, 'order_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 1, 'line_number', 'int', true),
             ('fact_lineitem', 'marts', 4, 2, 'part_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 3, 'supplier_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 4, 'quantity', 'double', true),
             ('fact_lineitem', 'marts', 4, 5, 'extended_price', 'double', true),
             ('fact_lineitem', 'marts', 4, 6, 'discount', 'double', true),
             ('fact_lineitem', 'marts', 4, 7, 'ship_date', 'timestamp_ntz', true),
             ('fact_lineitem', 'marts', 4, 8, 'customer_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 9, 'order_status', 'string', true),
             ('fact_lineitem', 'marts', 4, 10, 'order_date', 'timestamp_ntz', true),
             ('fact_lineitem', 'marts', 4, 11, 'revenue', 'double', true),
             ('stg_customer', 'staging', 1, 0, 'customer_id', 'bigint', true),
             ('stg_customer', 'staging', 1, 1, 'customer_name', 'string', true),
             ('stg_customer', 'staging', 1, 2, 'nation_id', 'int', true),
             ('stg_customer', 'staging', 1, 3, 'account_balance', 'double', true),
             ('stg_customer', 'staging', 1, 4, 'market_segment', 'string', true)
           ) AS t(node_name, group_name, level, ordinal, column_name,
                  data_type, nullable)
           ORDER BY node_name, ordinal""",

      "dq_checks" ->
        """SELECT check_name, violations FROM (
             SELECT 'not_null_o_orderkey' AS check_name,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
             UNION ALL
             SELECT 'unique_o_orderkey',
               count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
             UNION ALL
             SELECT 'accepted_values_o_orderstatus',
               count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O','F','P')) FROM orders
             UNION ALL
             SELECT 'not_null_l_orderkey',
               count(*) FILTER (WHERE l_orderkey IS NULL) FROM lineitem
             UNION ALL
             SELECT 'accepted_values_l_returnflag',
               count(*) FILTER (WHERE l_returnflag IS NOT NULL
                 AND l_returnflag NOT IN ('A','N','R')) FROM lineitem
             UNION ALL
             SELECT 'relationships_l_orderkey', count(*) FROM (
               SELECT DISTINCT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL
                 AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) v
           ) ORDER BY check_name""",

      "dq_failing_rows" ->
        """SELECT * FROM (
             SELECT 'accepted_values_l_returnflag' AS check_name,
                    l_orderkey, l_linenumber
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
             UNION ALL
             SELECT 'not_null_l_orderkey', l_orderkey, l_linenumber
             FROM lineitem WHERE l_orderkey IS NULL
             UNION ALL
             SELECT 'unique_l_orderkey', l.l_orderkey, l.l_linenumber
             FROM lineitem l JOIN (
               SELECT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL
               GROUP BY 1 HAVING count(*) > 1) d USING (l_orderkey)
           ) ORDER BY check_name, l_orderkey, l_linenumber""",

      "dq_checks_status" ->
        """SELECT check_name, violations,
             CASE WHEN violations > 100 THEN 'error'
                  WHEN violations > 0 THEN 'warn'
                  ELSE 'pass' END AS status
           FROM (
             SELECT 'not_null_o_orderkey' AS check_name,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
             UNION ALL
             SELECT 'unique_o_orderkey',
               count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
             UNION ALL
             SELECT 'accepted_values_o_orderstatus',
               count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O','F')) FROM orders
           ) ORDER BY check_name""",

      "doc_token_count" ->
        s"""SELECT doc_id,
             $nWordsSql AS n_tokens_ws,
             CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(text, '[A-Za-z0-9]+'),
                 w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
               + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               AS BIGINT) AS n_tokens_bpe
           FROM documents ORDER BY doc_id""",

      "doc_quality" ->
        s"""SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             $nWordsSql AS n_words,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / nullif(CAST(length(text) AS BIGINT), 0) AS punct_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / nullif(CAST(length(text) AS BIGINT), 0) AS digit_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
               / nullif($nWordsSql, 0) AS avg_word_len,
             CAST(${stopHits(s"string_split($norm, ' ')", functions.Text.StopwordsEn)} AS DOUBLE)
               / nullif($nWordsSql, 0) AS stopword_ratio
           FROM documents ORDER BY doc_id""",

      // TextRank replay: per-doc unrolled integer PageRank rounds
      "doc_keywords" -> textRankSql(6, 5),

      // readability replay: the same three regex run-counts, the
      // same two double trees
      "doc_readability" ->
        """WITH c AS (
             SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
                 AS n_words,
               greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                 AS BIGINT), 1) AS n_sentences,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                 AS BIGINT) AS n_syllables
             FROM documents)
           SELECT doc_id, n_words, n_sentences, n_syllables,
             round(CASE WHEN n_words > 0 THEN
               0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               - 15.59 END, 6) AS fk_grade,
             round(CASE WHEN n_words > 0 THEN
               206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               END, 6) AS flesch_ease
           FROM c ORDER BY doc_id""",

      // moment-sum variance replay (the volumeAnomaly portability
      // argument); round(6) guards the cross-engine double sums
      "doc_quality_normalized" ->
        s"""WITH q AS (
             SELECT doc_id, source,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           st AS (
             SELECT source, count(*) AS n, sum(score) AS s1,
               sum(score * score) AS s2, min(score) AS mn, max(score) AS mx
             FROM q GROUP BY source)
           SELECT doc_id, q.source,
             CASE WHEN n < 2 OR (s2/n - (s1/n)*(s1/n)) <= 0 THEN NULL
               ELSE round((score - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)), 6)
             END AS score_z,
             CASE WHEN mx = mn THEN NULL
               ELSE round((score - mn) / (mx - mn), 6) END AS score_minmax
           FROM q JOIN st ON q.source = st.source ORDER BY doc_id""",

      // the operator's bucketed per-group scale path vs the naive
      // per-group rank window
      "doc_quality_top_frac" ->
        s"""WITH q AS (
             SELECT doc_id, source,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           r AS (
             SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY score DESC, doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS n
             FROM q)
           SELECT doc_id, source FROM r
           WHERE rnk <= CAST(ceil(0.3 * n) AS BIGINT) ORDER BY doc_id""",

      // the operator's bucketed scale path vs the naive global
      // running-sum window (monotone cum ⟹ WHERE cum <= budget IS the
      // maximal prefix)
      "corpus_select_budget" ->
        s"""WITH q AS (
             SELECT doc_id, $nWordsSql AS n_words,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           c AS (
             SELECT doc_id, n_words,
               sum(n_words) OVER (ORDER BY score DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM q)
           SELECT doc_id, n_words FROM c WHERE cum <= 15000
           ORDER BY doc_id""",

      // full DSIR replay: md5-slice bucket hashing, add-α smoothed
      // bucket log-ratios, per-doc dot product, top-k on the ROUNDED
      // score — every stage is portable arithmetic
      "select_dsir" ->
        s"""WITH w AS (
             SELECT doc_id, lang != 'en' AS cand,
               unnest(string_split($norm, ' ')) AS term FROM documents
           ), f AS (
             SELECT doc_id, cand,
               CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % 64 AS bucket
             FROM w WHERE length(term) > 0
           ), s AS (
             SELECT bucket,
               sum(CASE WHEN cand THEN 0 ELSE 1 END) AS t_b,
               sum(CASE WHEN cand THEN 1 ELSE 0 END) AS r_b
             FROM f GROUP BY bucket
           ), st AS (
             SELECT bucket,
               ln((t_b + 0.5) / ((SELECT sum(t_b) FROM s) + 32.0))
               - ln((r_b + 0.5) / ((SELECT sum(r_b) FROM s) + 32.0)) AS delta
             FROM s
           ), c AS (
             SELECT doc_id, bucket, count(*) AS c FROM f WHERE cand GROUP BY 1, 2
           ), sc AS (
             SELECT doc_id, round(sum(c * delta), 4) AS score,
               CAST(sum(c) AS BIGINT) AS n_tokens
             FROM c JOIN st USING (bucket) GROUP BY doc_id)
           SELECT doc_id, score, n_tokens, rank FROM (
             SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      "doc_lang_id" ->
        s"""SELECT doc_id, $langPredCaseSql AS lang_pred
            FROM ($langPredBaseSql)
            ORDER BY doc_id""",

      // the heuristic's evaluation harness: predicted vs labeled
      // language, grouped — integer counts, the same prediction SQL
      "lang_id_confusion" ->
        s"""WITH pred AS (
              SELECT doc_id, $langPredCaseSql AS lang_pred
              FROM ($langPredBaseSql))
            SELECT d.lang, p.lang_pred, count(*) AS n_docs
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
            ORDER BY d.lang, p.lang_pred""",

      "multimodal_features" ->
        """WITH idx AS (
             SELECT doc_id, hex(encode(text)) AS hx,
                    unnest(generate_series(1, octet_length(encode(text)))) AS i
             FROM documents),
           ent AS (
             SELECT doc_id, round(entropy(substring(hx, 2*i - 1, 2)), 6) AS byte_entropy
             FROM idx GROUP BY doc_id)
           SELECT d.doc_id AS media_id,
                  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
                  coalesce(e.byte_entropy, 0.0) AS byte_entropy
           FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
           ORDER BY media_id""",

      "sample_split" ->
        """SELECT doc_id,
             CASE WHEN doc_id % 100 < 80 THEN 'train'
                  WHEN doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM documents ORDER BY doc_id""",

      // the REAL hash path: xxHash64 itself replayed in SQL, then the
      // same pmod-bucket label chain (thresholds round(f·1e6))
      "sample_split_hash" ->
        s"""SELECT doc_id,
             CASE WHEN ((h % 1000000) + 1000000) % 1000000 < 800000 THEN 'train'
                  WHEN ((h % 1000000) + 1000000) % 1000000 < 900000 THEN 'val'
                  ELSE 'test' END AS split
           FROM (${xxhash64LongSql("SELECT doc_id FROM documents", "doc_id", 42L)})
           ORDER BY doc_id""",

      // ranks the FULL stratum by the replayed xxHash64, so the
      // two-phase candidate pruning is graded against the naive form
      "sample_stratified_n" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // ξ replay: (h >> 11) & (2^53−1) is the 53-bit logical shift on
      // the signed hash; ·2⁻⁵³ exact; /w correctly rounded — the
      // ranking matches Spark bit-for-bit
      "sample_weighted_n" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 200 ORDER BY rank""",

      // per-stratum ξ ranking replay
      "sample_weighted_n_stratum" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 50 ORDER BY lang, rank""",

      // streaming state ≡ the batch per-stratum PPS operator over
      // everything seen — same ranking replay, no n_chars column in
      // the streamed output
      "stream_weighted_sample" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 50 ORDER BY lang, rank""",

      // fold ≡ full run (associative idempotent reduction) — same
      // oracle as sample_weighted_n
      "sample_weighted_n_incr" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 200 ORDER BY rank""",

      // every event picks the SCD2 interval covering its OWN ts
      // (half-open, zero-width same-ts intervals match neither side)
      "stream_enrich_asof" ->
        """WITH h AS (
             SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS vf,
               CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS TIMESTAMP) AS vt
             FROM events)
           SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             h.event_id AS version_id, h.event_type AS state_at_event
           FROM events e LEFT JOIN h ON e.user_id = h.user_id
             AND h.vf <= CAST(e.ts AS TIMESTAMP)
             AND (h.vt IS NULL OR CAST(e.ts AS TIMESTAMP) < h.vt)
           ORDER BY e.event_id""",

      // stream-stream interval join: every (purchase, view-within-6h-
      // before) pair on the same user, stated directly as the
      // interval self-join the streaming state machine must equal
      "stream_correlate" ->
        """SELECT l.user_id, l.event_id AS purchase_id,
             CAST(l.ts AS TIMESTAMP) AS purchase_ts,
             r.event_id AS view_id, CAST(r.ts AS TIMESTAMP) AS view_ts
           FROM events l JOIN events r ON l.user_id = r.user_id
             AND r.ts >= l.ts - INTERVAL 6 HOUR AND r.ts <= l.ts
           WHERE l.event_type = 'purchase' AND r.event_type = 'view'
           ORDER BY purchase_id, view_id""",

      // streaming state ≡ batch operator over everything seen: the
      // same full-corpus ranking replay grades the stream's final view
      "stream_stratified_sample" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // fold ≡ full: the incremental form is graded by the same
      // full-corpus ranking replay
      "sample_stratified_n_incr" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // naive per-group rank-window replay of the 256-bucket scale
      // path; pos = (r−0.5)/n is one exact subtraction + one
      // correctly-rounded division → bit-identical doubles
      "corpus_interleave" ->
        s"""WITH r AS (
             SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS n
             FROM (${xxhash64LongSql("SELECT doc_id, source FROM documents",
                      "doc_id", 42L, Seq("source"))})
           ), p AS (
             SELECT doc_id, source,
               (CAST(r AS DOUBLE) - 0.5) / CAST(n AS DOUBLE) AS pos FROM r)
           SELECT doc_id, source, pos,
             row_number() OVER (ORDER BY pos, source, doc_id) AS seq
           FROM p ORDER BY seq""",

      // the writer's manifest replayed: pmod(xxhash64(id, 42), 8)
      // shard assignment, per-shard counts and hash ranges
      "corpus_shards" ->
        s"""SELECT CAST(shard AS INTEGER) AS shard,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(h) AS min_hash, max(h) AS max_hash
           FROM (SELECT ((h % 8) + 8) % 8 AS shard, h
                 FROM (${xxhash64LongSql("SELECT doc_id FROM documents",
                          "doc_id", 42L)}))
           GROUP BY shard ORDER BY shard""",

      "corpus_top_terms" ->
        s"""WITH words AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term
             FROM documents)
           SELECT term, tf, doc_freq FROM (
             SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
             FROM words WHERE length(term) > 0 GROUP BY term)
           ORDER BY tf DESC, term LIMIT 100""",

      "doc_repetition" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS w FROM documents
           ), f AS (
             SELECT doc_id, w, count(*) AS c FROM w
             WHERE length(w) > 0 GROUP BY doc_id, w)
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             count(*) AS n_distinct_words,
             round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_word_frac
           FROM f GROUP BY doc_id ORDER BY doc_id""",
  )
}
