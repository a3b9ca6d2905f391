package graft

/** Oracle-registry shard 9 — the r14 session-2 oracles (OraclesShard8
  * sits at the RegistrySpec 1200-line ceiling). DuckDB SQL VERBATIM;
  * [[SparkEntry.oracleSql]] composes the shards. */
private[graft] object OraclesShard9 {

  /** The card-number synthesis shared by both Luhn keys: base15 from
    * the doc_id, check digit from the same mod-10 sum the validator
    * runs, a valid formatted plant every 3rd doc, an invalid twin
    * (+5 on the check digit) every 5th, a 12-digit non-candidate
    * every 7th. `textExpr` lets the redact key strip natural digits
    * first while the scan key keeps them.
    */
  private def cardSynthSql(textExpr: String): String =
    s"""WITH s AS (
         SELECT doc_id, $textExpr AS text,
           lpad(CAST(doc_id AS VARCHAR), 15, '4') AS base15
         FROM documents
       ), c AS (
         SELECT doc_id, text, base15,
           list_sum(list_transform(range(1, 16), i ->
             CASE WHEN i % 2 = 1 THEN
               CASE WHEN 2 * CAST(substr(base15, i, 1) AS INT) > 9
                 THEN 2 * CAST(substr(base15, i, 1) AS INT) - 9
                 ELSE 2 * CAST(substr(base15, i, 1) AS INT) END
             ELSE CAST(substr(base15, i, 1) AS INT) END)) AS card_sum
         FROM s
       ), v AS (
         SELECT doc_id, text,
           base15 || CAST((10 - card_sum % 10) % 10 AS VARCHAR) AS valid16
         FROM c
       ), t AS (
         SELECT doc_id,
           substr(valid16, 1, 4) || ' ' || substr(valid16, 5, 4) || ' '
             || substr(valid16, 9, 4) || ' ' || substr(valid16, 13, 4)
             AS fmt,
           text
           || CASE WHEN doc_id % 3 = 0 THEN ' pay '
                || substr(valid16, 1, 4) || ' ' || substr(valid16, 5, 4)
                || ' ' || substr(valid16, 9, 4) || ' '
                || substr(valid16, 13, 4)
              ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' ref '
                || substr(valid16, 1, 15)
                || CAST((CAST(substr(valid16, 16, 1) AS INT) + 5) % 10
                     AS VARCHAR)
              ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' acct '
                || lpad(CAST(doc_id AS VARCHAR), 12, '9')
              ELSE '' END AS synth
         FROM v
       )"""

  /** Greedy BPE application of the pinned merge table as a chain of
    * separator-wrapped replaces (see the corpus_bpe_encode_fixed
    * query's scaladoc for why replace() ≡ the greedy fold): the
    * chain is DERIVED from [[QueriesShard8.FixedBpeMerges]] so the
    * two engines can never pin different tables. */
  private def fixedBpeFoldSql: String =
    QueriesShard8.FixedBpeMerges.foldLeft(
      """e'\x1f' || array_to_string(""" +
        """list_append(string_split(w, ''), '</w>'), e'\x1f\x1f') || e'\x1f'""") {
      case (acc, (l, r)) =>
        s"replace($acc, e'\\x1f$l\\x1f\\x1f$r\\x1f', e'\\x1f$l$r\\x1f')"
    }

  val m: Map[String, String] = Map(
    // fixed-table BPE encode replay: normalize → word cells → per
    // distinct word the wrapped greedy replace chain → token count =
    // wrapper-separator count / 2 → per-doc rollup
    "corpus_bpe_encode_fixed" ->
      s"""WITH w0 AS (
           SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
           FROM documents
         ), cells AS MATERIALIZED (
           SELECT doc_id, w, count(*) AS c FROM w0 WHERE length(w) > 0
           GROUP BY 1, 2
         ), enc AS (
           SELECT w, $fixedBpeFoldSql AS s
           FROM (SELECT DISTINCT w FROM cells)
         ), wt AS (
           SELECT w,
             (length(s) - length(replace(s, e'\\x1f', ''))) // 2 AS wt
           FROM enc)
         SELECT c.doc_id, CAST(sum(c.c) AS BIGINT) AS n_words,
           CAST(sum(c.c * t.wt) AS BIGINT) AS n_bpe_tokens
         FROM cells c JOIN wt t USING (w)
         GROUP BY 1 ORDER BY doc_id""",
    // Luhn scan replay: every maximal [0-9](?:[ -]?[0-9])* run,
    // separator-stripped; candidate = 13..19 digits; valid = mod-10
    // sum over right-to-left alternating doubled-folded digits = 0
    "pii_luhn_scan" ->
      s"""${cardSynthSql("coalesce(text, '')")}, runs AS (
           SELECT doc_id,
             list_transform(
               regexp_extract_all(synth, '[0-9](?:[ -]?[0-9])*'),
               r -> regexp_replace(r, '[ -]', '', 'g')) AS ds
           FROM t
         )
         SELECT doc_id,
           CAST(length(list_filter(ds,
             x -> length(x) BETWEEN 13 AND 19)) AS BIGINT) AS n_candidates,
           CAST(length(list_filter(ds,
             x -> length(x) BETWEEN 13 AND 19
               AND list_sum(list_transform(range(1, length(x) + 1), i ->
                 CASE WHEN (length(x) - i) % 2 = 1 THEN
                   CASE WHEN 2 * CAST(substr(x, i, 1) AS INT) > 9
                     THEN 2 * CAST(substr(x, i, 1) AS INT) - 9
                     ELSE 2 * CAST(substr(x, i, 1) AS INT) END
                 ELSE CAST(substr(x, i, 1) AS INT) END)) % 10 = 0))
             AS BIGINT) AS n_valid
         FROM runs ORDER BY doc_id""",

    // redaction replay on the digit-stripped corpus: the planted
    // formatted card is the ONLY Luhn-valid run, so replace() is the
    // exact redaction; the invalid twin and the 12-digit run survive
    "doc_card_redact" ->
      s"""${cardSynthSql(
             "regexp_replace(coalesce(text, ''), '[0-9]', '', 'g')")}
         SELECT doc_id,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_cards,
           CASE WHEN doc_id % 3 = 0 THEN replace(synth, fmt, '<CARD>')
             ELSE synth END AS text_redacted
         FROM t ORDER BY doc_id""",

    // delta-method ratio metric replay: per-(type, user) exact
    // micro-unit numerator + event count, HUGEINT moments per
    // variant, then the identical double tree (ratio, Taylor
    // variance, z) rounded once
    "ab_ratio_delta" ->
      """WITH u AS (
           SELECT event_type, user_id, (user_id % 2 = 1) AS isa,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))) * 1000000, 0)
               AS BIGINT) AS x6,
             count(*) AS y
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2, 3
         ), g AS (
           SELECT event_type,
             sum(CASE WHEN isa THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN isa THEN CAST(x6 AS HUGEINT) ELSE 0 END) AS sxa,
             sum(CASE WHEN NOT isa THEN CAST(x6 AS HUGEINT) ELSE 0 END) AS sxb,
             sum(CASE WHEN isa THEN CAST(x6 AS HUGEINT) * x6 ELSE 0 END)
               AS sxxa,
             sum(CASE WHEN NOT isa THEN CAST(x6 AS HUGEINT) * x6 ELSE 0 END)
               AS sxxb,
             sum(CASE WHEN isa THEN y ELSE 0 END) AS sya,
             sum(CASE WHEN NOT isa THEN y ELSE 0 END) AS syb,
             sum(CASE WHEN isa THEN y * y ELSE 0 END) AS syya,
             sum(CASE WHEN NOT isa THEN y * y ELSE 0 END) AS syyb,
             sum(CASE WHEN isa THEN CAST(x6 AS HUGEINT) * y ELSE 0 END)
               AS sxya,
             sum(CASE WHEN NOT isa THEN CAST(x6 AS HUGEINT) * y ELSE 0 END)
               AS sxyb
           FROM u GROUP BY 1
           HAVING sum(CASE WHEN isa THEN 1 ELSE 0 END) >= 2
             AND sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) >= 2
         ), r AS (
           SELECT event_type, n_a, n_b,
             CAST(sxa AS DOUBLE) / 1000000.0 / CAST(sya AS DOUBLE) AS ra,
             CAST(sxb AS DOUBLE) / 1000000.0 / CAST(syb AS DOUBLE) AS rb,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             sxa, sxb, sxxa, sxxb, sya, syb, syya, syyb, sxya, sxyb
           FROM g
         ), v AS (
           SELECT event_type, n_a, n_b, ra, rb,
             ((CAST(sxxa AS DOUBLE) / 1e12
                 - (CAST(sxa AS DOUBLE) / 1e6) * (CAST(sxa AS DOUBLE) / 1e6)
                   / na) / (na - 1.0)
               - 2.0 * ra * ((CAST(sxya AS DOUBLE) / 1e6
                 - (CAST(sxa AS DOUBLE) / 1e6) * CAST(sya AS DOUBLE) / na)
                   / (na - 1.0))
               + ra * ra * ((CAST(syya AS DOUBLE)
                 - CAST(sya AS DOUBLE) * CAST(sya AS DOUBLE) / na)
                   / (na - 1.0)))
               / (na * (CAST(sya AS DOUBLE) / na)
                 * (CAST(sya AS DOUBLE) / na)) AS va,
             ((CAST(sxxb AS DOUBLE) / 1e12
                 - (CAST(sxb AS DOUBLE) / 1e6) * (CAST(sxb AS DOUBLE) / 1e6)
                   / nb) / (nb - 1.0)
               - 2.0 * rb * ((CAST(sxyb AS DOUBLE) / 1e6
                 - (CAST(sxb AS DOUBLE) / 1e6) * CAST(syb AS DOUBLE) / nb)
                   / (nb - 1.0))
               + rb * rb * ((CAST(syyb AS DOUBLE)
                 - CAST(syb AS DOUBLE) * CAST(syb AS DOUBLE) / nb)
                   / (nb - 1.0)))
               / (nb * (CAST(syb AS DOUBLE) / nb)
                 * (CAST(syb AS DOUBLE) / nb)) AS vb
           FROM r)
         SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
           round(ra - rb, 6) AS diff,
           round(sqrt(va + vb), 6) AS se,
           round(CASE WHEN va + vb > 0 THEN (ra - rb) / sqrt(va + vb) END, 6)
             AS z
         FROM v ORDER BY event_type""",

    // CCF replay: hourly counts on the generate_series spine, lag
    // pairs by hour-index equi-join, exact HUGEINT moments, the same
    // Pearson tree
    "events_xcorr" ->
      """WITH f AS (
           SELECT CAST(ts AS TIMESTAMP) AS ts, event_type
           FROM events WHERE event_type IN ('view', 'purchase')
         ), h AS (
           SELECT date_trunc('hour', ts) AS hour_ts,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           FROM f GROUP BY 1
         ), bounds AS (SELECT min(hour_ts) AS mn, max(hour_ts) AS mx FROM h
         ), spine AS (
           SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
           FROM bounds
         ), s AS (
           SELECT CAST(epoch(spine.hour_ts) // 3600 AS BIGINT) AS k,
             coalesce(x, 0) AS x, coalesce(y, 0) AS y
           FROM spine LEFT JOIN h USING (hour_ts)
         ), l AS (SELECT unnest(range(0, 7)) AS lag
         ), p AS (
           SELECT l.lag, a.x, b.y
           FROM l CROSS JOIN s a JOIN s b ON b.k = a.k + l.lag
         ), g AS (
           SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
           FROM p GROUP BY 1 HAVING count(*) >= 2
         ), c AS (
           SELECT lag, n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cnum,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cdx,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cdy
           FROM g)
         SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
           round(CASE WHEN cdx > 0 AND cdy > 0
             THEN cnum / sqrt(cdx * cdy) END, 6) AS r
         FROM c ORDER BY lag""",

    // schema evolution replay: even keys landed narrow (v1), odd keys
    // wide (v2) — the merged head must null-fill v1's added column
    "versioned_schema_evolution" ->
      """SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END
             AS o_orderstatus
         FROM orders ORDER BY o_orderkey""",

    // CSN power-law MLE replay on the shared co-purchase degree CTE:
    // tail = deg >= 4, per-node ln(d/3.5) as rounded 1e-6 integers,
    // alpha = 1 + n_tail / (sum6/1e6)
    "graph_powerlaw_fit" ->
      """WITH li AS (
           SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
           WHERE l_partkey % 4 = 0
         ), e AS (
           SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
         ), dd AS (
           SELECT a AS src FROM e UNION ALL SELECT b AS src FROM e
         ), dgr AS (
           SELECT src, CAST(count(*) AS BIGINT) AS d FROM dd GROUP BY src
         ), f AS (
           SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(CASE WHEN d >= 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tail,
             sum(CASE WHEN d >= 4 THEN CAST(round(
                 ln(CAST(d AS DOUBLE) / 3.5) * 1000000.0) AS BIGINT)
               ELSE 0 END) AS s6
           FROM dgr)
         SELECT n_nodes, n_tail, CAST(4 AS BIGINT) AS d_min,
           round(1.0 + CAST(n_tail AS DOUBLE)
             / (CAST(s6 AS DOUBLE) / 1000000.0), 6) AS alpha
         FROM f WHERE n_tail > 0 AND s6 > 0""",

    // the dialect layer's contract IS the SQL text it generates —
    // every statement stated verbatim (the source_quarantine VALUES
    // discipline); the live Derby execution path is graded separately
    // by sink_jdbc_upsert
    "sink_jdbc_dialect_matrix" ->
      """SELECT * FROM (VALUES
           ('ansi', CAST(1 AS BIGINT), 'prep',
            'CREATE INDEX stg_orders_kix ON stg_orders ("o_orderkey", "o_tag")',
            TRUE),
           ('ansi', CAST(2 AS BIGINT), 'merge',
            'DELETE FROM t_orders WHERE ("o_orderkey", "o_tag") IN (SELECT "o_orderkey", "o_tag" FROM stg_orders)',
            TRUE),
           ('ansi', CAST(3 AS BIGINT), 'merge',
            'INSERT INTO t_orders ("o_orderkey", "o_tag", "o_val") SELECT "o_orderkey", "o_tag", "o_val" FROM stg_orders',
            TRUE),
           ('clickhouse', CAST(1 AS BIGINT), 'merge',
            'ALTER TABLE t_orders DELETE WHERE (`o_orderkey`, `o_tag`) IN (SELECT `o_orderkey`, `o_tag` FROM stg_orders) SETTINGS mutations_sync = 1',
            FALSE),
           ('clickhouse', CAST(2 AS BIGINT), 'merge',
            'INSERT INTO t_orders (`o_orderkey`, `o_tag`, `o_val`) SELECT `o_orderkey`, `o_tag`, `o_val` FROM stg_orders',
            FALSE),
           ('derby', CAST(1 AS BIGINT), 'prep',
            'CREATE INDEX stg_orders_kix ON stg_orders ("o_orderkey")',
            TRUE),
           ('derby', CAST(2 AS BIGINT), 'merge',
            'DELETE FROM t_orders WHERE EXISTS (SELECT 1 FROM stg_orders WHERE stg_orders."o_orderkey" = t_orders."o_orderkey" AND CAST(stg_orders."o_tag" AS VARCHAR(32672)) = CAST(t_orders."o_tag" AS VARCHAR(32672)))',
            TRUE),
           ('derby', CAST(3 AS BIGINT), 'merge',
            'INSERT INTO t_orders ("o_orderkey", "o_tag", "o_val") SELECT "o_orderkey", "o_tag", "o_val" FROM stg_orders',
            TRUE))
           AS t(dialect, stmt_no, kind, sql_text, transactional)
         ORDER BY dialect, stmt_no""",

    // join-cardinality identity replay: |A ⋈ B| = Σ f_A·f_B over the
    // key histograms; NULL keys counted apart, never matched
    "dq_join_cardinality" ->
      """WITH lh AS (
           SELECT user_id AS k, count(*) AS fl FROM events
           WHERE user_id IS NOT NULL GROUP BY 1
         ), rh AS (
           SELECT c_custkey AS k, count(*) AS fr FROM customer
           WHERE c_custkey IS NOT NULL GROUP BY 1
         ), j AS (
           SELECT coalesce(sum(fl * fr), 0) AS est_rows,
             coalesce(max(fl * fr), 0) AS max_key_fanout,
             count(*) AS d_common
           FROM lh JOIN rh USING (k)
         ), lt AS (
           SELECT count(*) AS n_left, count(user_id) AS nn_l FROM events
         ), rt AS (
           SELECT count(*) AS n_right, count(c_custkey) AS nn_r
           FROM customer
         ), dl AS (SELECT count(*) AS d_left FROM lh
         ), dr AS (SELECT count(*) AS d_right FROM rh)
         SELECT CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(n_left - nn_l AS BIGINT) AS n_null_left,
           CAST(n_right - nn_r AS BIGINT) AS n_null_right,
           CAST(d_left AS BIGINT) AS d_left,
           CAST(d_right AS BIGINT) AS d_right,
           CAST(d_common AS BIGINT) AS d_common,
           CAST(est_rows AS BIGINT) AS est_rows,
           CAST(max_key_fanout AS BIGINT) AS max_key_fanout
         FROM lt, rt, dl, dr, j""",

    // within-doc keep-first line dedup replay: parallel unnest zips
    // (line, ordinal); keep-first = group-min ordinal; order restored
    // by string_agg ORDER BY
    "doc_line_dedup" ->
      s"""$lineSynthSql, lines AS (
           SELECT doc_id,
             unnest(str_split(synth, chr(10))) AS line,
             unnest(range(1, length(str_split(synth, chr(10))) + 1)) AS i
           FROM ts
         ), keep AS (
           SELECT doc_id, line, min(i) AS i FROM lines GROUP BY 1, 2
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_unique,
             string_agg(line, chr(10) ORDER BY i) AS text_dedup
           FROM keep GROUP BY doc_id)
         SELECT ts.doc_id,
           CAST(length(str_split(ts.synth, chr(10))) AS BIGINT) AS n_lines,
           agg.n_unique, agg.text_dedup
         FROM ts JOIN agg USING (doc_id) ORDER BY doc_id""",

    // C4 line-rule replay: terminal punctuation + >= 3 words, per
    // line, order preserved
    "doc_c4_line_clean" ->
      s"""$lineSynthSql, k AS (
           SELECT doc_id, synth,
             list_filter(str_split(synth, chr(10)),
               x -> regexp_matches(trim(x), '[.!?"]$$')
                 AND length(regexp_extract_all(trim(x), '\\S+')) >= 3)
               AS kept
           FROM ts)
         SELECT doc_id,
           CAST(length(str_split(synth, chr(10))) AS BIGINT) AS n_lines,
           CAST(length(kept) AS BIGINT) AS n_kept,
           coalesce(array_to_string(kept, chr(10)), '') AS text_clean
         FROM k ORDER BY doc_id""",

    // NFC replay: utf8proc's nfc_normalize vs the JDK Normalizer —
    // two independent Unicode implementations; the plant constant is
    // interpolated from EntryHelpers.NfcPlant so the bytes cannot
    // diverge between the key and this twin
    "doc_unicode_normalize" ->
      s"""WITH t AS (
           SELECT doc_id,
             coalesce(text, '') || '${graft.EntryHelpers.NfcPlant}' AS synth
           FROM documents)
         SELECT doc_id, synth <> nfc_normalize(synth) AS changed,
           nfc_normalize(synth) AS text_nfc
         FROM t ORDER BY doc_id""",

    // timestamp-strategy replay: versioned iff %10==0 (strictly-newer
    // updated_at) AND present in the extract (%7<>0); the %10==5
    // attribute flap under an unchanged timestamp must NOT version
    "scd2_merge_timestamp" ->
      """WITH s1 AS (
           SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_mktsegment AS market_segment,
             TIMESTAMP '2026-01-01 00:00:00' AS updated_at
           FROM customer
         ), v AS (
           SELECT customer_id FROM s1
           WHERE customer_id % 10 = 0 AND customer_id % 7 <> 0)
         SELECT customer_id, customer_name, market_segment, updated_at,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
           CASE WHEN customer_id IN (SELECT customer_id FROM v)
             THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
         FROM s1
         UNION ALL
         SELECT customer_id, customer_name, 'CHANGED',
           TIMESTAMP '2026-01-15 00:00:00',
           TIMESTAMP '2026-02-01 00:00:00', NULL
         FROM s1 WHERE customer_id IN (SELECT customer_id FROM v)
         ORDER BY customer_id, valid_from""",

    // proximity replay: tokenize exactly like positionalFrame
    // (lower/trim/space-collapse, 1-based positions), then the
    // DEFINITIONAL pair join with the ordered window predicate
    "doc_proximity_search" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS p
           FROM documents
         ), tok AS (
           SELECT doc_id,
             unnest(str_split(p, ' ')) AS term,
             unnest(range(1, length(str_split(p, ' ')) + 1)) AS pos
           FROM d
         ), a AS (SELECT doc_id, pos AS p1 FROM tok WHERE term = 'table'
         ), b AS (SELECT doc_id, pos AS p2 FROM tok WHERE term = 'scan'
         ), m AS (
           SELECT a.doc_id, p1, p2 FROM a JOIN b ON a.doc_id = b.doc_id
           WHERE p2 > p1 AND p2 - p1 <= 5)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p1) AS BIGINT) AS first_pos
         FROM m GROUP BY doc_id ORDER BY doc_id""",

    // the streamed three-batch fold (bootstrap, day-2, redelivered
    // day-2) must equal the clean two-fold history: versioned iff
    // %10==0 (strictly-newer updated_at); the %10==5 flap and the
    // whole redelivered batch are no-ops
    "stream_scd2_apply" ->
      """WITH s1 AS (
           SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_mktsegment AS market_segment,
             TIMESTAMP '2026-01-01 00:00:00' AS updated_at
           FROM customer
         ), v AS (
           SELECT customer_id FROM s1 WHERE customer_id % 10 = 0)
         SELECT customer_id, customer_name, market_segment, updated_at,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
           CASE WHEN customer_id IN (SELECT customer_id FROM v)
             THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
         FROM s1
         UNION ALL
         SELECT customer_id, customer_name, 'CHANGED',
           TIMESTAMP '2026-01-15 00:00:00',
           TIMESTAMP '2026-02-01 00:00:00', NULL
         FROM s1 WHERE customer_id IN (SELECT customer_id FROM v)
         ORDER BY customer_id, valid_from""",

    // file pruning must be invisible: the stats-pruned versioned
    // read ≡ the plain BETWEEN filter
    "versioned_prune_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
         FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
         ORDER BY o_orderkey""",
  )

  /** The line-ified synthesis shared by the line-level curation keys:
    * sentence breaks → newlines, the doc's own first line planted
    * twice at the tail. */
  private def lineSynthSql: String =
    """WITH t AS (
         SELECT doc_id,
           replace(coalesce(text, ''), '. ', '.' || chr(10)) AS l
         FROM documents
       ), ts AS (
         SELECT doc_id,
           l || chr(10) || str_split(l, chr(10))[1]
             || chr(10) || str_split(l, chr(10))[1] AS synth
         FROM t
       )"""
}
