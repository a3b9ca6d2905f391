package graft

import graft.OracleFragments._

/** Oracle-registry shard 4/6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard4 {
  val m: Map[String, String] = Map(
      "doc_quality_filter" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS w FROM documents
           ), f AS (
             SELECT doc_id, w, count(*) AS c FROM w
             WHERE length(w) > 0 GROUP BY doc_id, w
           ), m AS (
             SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               count(*) / CAST(sum(c) AS DOUBLE) AS distinct_ratio,
               max(c) / CAST(sum(c) AS DOUBLE) AS top_word_frac
             FROM f GROUP BY doc_id)
           SELECT doc_id, n_words,
             CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_words > 1000 THEN 'too_long'
                  WHEN distinct_ratio < 0.4 THEN 'low_diversity'
                  WHEN top_word_frac > 0.12 THEN 'repetitive'
                  ELSE 'keep' END AS reason,
             (CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_words > 1000 THEN 'too_long'
                  WHEN distinct_ratio < 0.4 THEN 'low_diversity'
                  WHEN top_word_frac > 0.12 THEN 'repetitive'
                  ELSE 'keep' END) = 'keep' AS keep
           FROM m ORDER BY doc_id""",

      // segment-level dedup (r9): 20-word windows, keep-first by
      // (doc_id, seg_no); DuckDB marks winners with a row_number
      // window ≡ Spark's min(struct) per segment hash
      "dedup_segments" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), marked AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
             FROM segs)
           SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1) AS text_dedup,
             count(*) AS n_segments,
             count(*) FILTER (WHERE rn = 1) AS n_kept
           FROM marked GROUP BY doc_id ORDER BY doc_id""",

      // the streaming segment gate: because batches split on
      // ascending doc_id and keep-first orders by (doc_id, seg_no),
      // the gate's accumulated corpus equals the full-corpus batch
      // run restricted to docs that kept at least one segment
      "stream_segdedup_gate" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), marked AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
             FROM segs)
           SELECT doc_id, text, n_segments, n_kept FROM (
             SELECT doc_id,
               string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1) AS text,
               count(*) AS n_segments,
               count(*) FILTER (WHERE rn = 1) AS n_kept
             FROM marked GROUP BY doc_id)
           WHERE text IS NOT NULL ORDER BY doc_id""",

      // incremental segment dedup (r9): the index is the first
      // half's distinct segments; batch winners must also be unseen
      "dedup_segments_incr" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), idx AS (
             SELECT DISTINCT seg FROM segs WHERE doc_id < 250
           ), nb AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn,
               seg IN (SELECT seg FROM idx) AS seen
             FROM segs WHERE doc_id >= 250)
           SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_no)
               FILTER (WHERE rn = 1 AND NOT seen) AS text_dedup,
             count(*) AS n_segments,
             count(*) FILTER (WHERE rn = 1 AND NOT seen) AS n_kept
           FROM nb GROUP BY doc_id ORDER BY doc_id""",

      // Zipf OLS fit (r9): same closed-form sums as Text.zipfFit —
      // identical formula both engines, round(6) absorbs sum order
      "corpus_zipf" ->
        s"""WITH words AS (
             SELECT unnest(string_split($norm, ' ')) AS term FROM documents
           ), tf AS (
             SELECT term, count(*) AS tf FROM words
             WHERE length(term) > 0 GROUP BY term
           ), top AS (
             SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT 100
           ), ranked AS (
             SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, term) AS DOUBLE)) AS x,
                    ln(CAST(tf AS DOUBLE)) AS y
             FROM top
           ), s AS (
             SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
             FROM ranked)
           SELECT CAST(n AS BIGINT) AS n_terms,
             round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept,
             round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                   / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
           FROM s""",

      "doc_tfidf" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents
           ), wf AS (
             SELECT doc_id, term FROM w WHERE length(term) > 0
           ), tf AS (
             SELECT doc_id, term, count(*) AS tf FROM wf GROUP BY doc_id, term
           ), df AS (
             SELECT term, count(DISTINCT doc_id) AS doc_freq FROM wf GROUP BY term)
           SELECT doc_id, term, tf, doc_freq,
             round(tf * ln((SELECT count(*) FROM documents)
               / CAST(doc_freq AS DOUBLE)), 6) AS tfidf
           FROM tf JOIN df USING (term)
           ORDER BY doc_id, term""",

      // BM25 replay: the same left-to-right IEEE arithmetic as the
      // Spark scorer (exact-integer sums, correctly-rounded divisions,
      // fixed term order), ranked on the ROUNDED score
      // PMI replay: same integer counts, the same multiply/divide
      // tree under one ln, rank on the rounded score
      "corpus_collocations" ->
        s"""WITH d AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), toks AS (
             SELECT unnest(ws) AS term FROM d
           ), uni AS (
             SELECT term, count(*) AS c FROM toks
             WHERE length(term) > 0 GROUP BY 1
           ), nt AS (SELECT sum(c) AS n_tok FROM uni
           ), pq AS (
             SELECT unnest([ws[i] || ' ' || ws[i+1]
               for i in range(1, len(ws))]) AS p
             FROM d WHERE len(ws) >= 2
           ), bi0 AS (
             SELECT string_split(p, ' ')[1] AS term_a,
               string_split(p, ' ')[2] AS term_b, count(*) AS n_pair
             FROM pq GROUP BY 1, 2
           ), nb AS (SELECT sum(n_pair) AS n_big FROM bi0
           ), sc AS (
             SELECT term_a, term_b, n_pair,
               round(ln((n_pair * CAST(n_tok AS DOUBLE) * n_tok)
                 / (CAST(n_big AS DOUBLE) * ca.c * cb.c)), 6) AS pmi
             FROM bi0
             CROSS JOIN nt CROSS JOIN nb
             JOIN uni ca ON ca.term = bi0.term_a
             JOIN uni cb ON cb.term = bi0.term_b
             WHERE n_pair >= 5)
           SELECT term_a, term_b, CAST(n_pair AS BIGINT) AS n_pair, pmi
           FROM sc
           QUALIFY row_number() OVER (ORDER BY pmi DESC, term_a, term_b) <= 50
           ORDER BY pmi DESC, term_a, term_b""",

      // shared by the full-scan and maintained-index forms: per-doc
      // index rows + integer stat adds make the index answer exactly
      // like a re-scan
      "corpus_bm25_topk" -> bm25TopkOracleSql,
      "search_ndcg" -> ndcgOracleSql,
      "corpus_bm25_incr" -> bm25TopkOracleSql,

      "doc_surprisal" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents
           ), wf AS (
             SELECT doc_id, term FROM w WHERE length(term) > 0
           ), tf AS (
             SELECT doc_id, term, count(*) AS tf FROM wf GROUP BY 1, 2
           ), ct AS (
             SELECT term, count(*) AS c_t FROM wf GROUP BY term
           ), tot AS (SELECT sum(c_t) AS c_total FROM ct)
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
             round(sum(tf * ln(c_t / c_total)) / sum(tf), 4) AS avg_logprob
           FROM tf JOIN ct USING (term), tot
           GROUP BY doc_id ORDER BY doc_id""",

      // n-gram repetition: occurrence-share of the top gram and of
      // all grams occurring ≥2× (position-order grams, dupes kept)
      "doc_ngram_repetition" ->
        s"""WITH ex AS (
             SELECT doc_id, unnest(grams) AS g
             FROM (${gramsSql(3, distinct = false)})
           ), c AS (
             SELECT doc_id, g, count(*) AS c FROM ex GROUP BY 1, 2)
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_ngram_frac,
             round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
               / CAST(sum(c) AS DOUBLE), 6) AS dup_ngram_frac
           FROM c GROUP BY doc_id ORDER BY doc_id""",

      // bigram conditional surprisal: p(b|a) = C(a,b)/C(a,·) over
      // bigram-start counts, avg ln p per doc, round(4)
      "doc_bigram_surprisal" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), b0 AS (
             SELECT doc_id,
               unnest([struct_pack(a := ws[i+1], b := ws[i+2])
                       for i in range(0, len(ws) - 1)]) AS bg
             FROM w WHERE len(ws) >= 2
           ), bi AS (
             SELECT doc_id, bg.a AS a, bg.b AS b FROM b0
           ), tf AS (
             SELECT doc_id, a, b, count(*) AS tf FROM bi GROUP BY 1, 2, 3
           ), cab AS (
             SELECT a, b, count(*) AS c_ab FROM bi GROUP BY 1, 2
           ), ca AS (
             SELECT a, count(*) AS c_a FROM bi GROUP BY 1)
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             round(sum(tf * ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)))
               / CAST(sum(tf) AS DOUBLE), 4) AS avg_logprob
           FROM tf JOIN cab USING (a, b) JOIN ca USING (a)
           GROUP BY doc_id ORDER BY doc_id""",

      // the REAL hash mix: quota thresholds (round(min(1,q/n)·1e6))
      // against the replayed-xxHash64 bucket — full rows
      "sample_mix" ->
        s"""WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents),
           w(r, mix_source, wt) AS (VALUES
             (0, 'web', 0.6), (1, 'code', 0.3), (2, 'books', 0.1)),
           n AS (SELECT r, count(*) AS n FROM d GROUP BY r),
           tw AS (SELECT CAST(0.6 AS DOUBLE) + CAST(0.3 AS DOUBLE)
                         + CAST(0.1 AS DOUBLE) AS tw),
           p AS (SELECT w.r, w.mix_source,
                   CAST(round(least(1.0,
                     300.0 * CAST(wt AS DOUBLE) / tw / n) * 1000000) AS BIGINT) AS thresh
                 FROM w JOIN n USING (r), tw),
           hx AS (${xxhash64LongSql(
                     "SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents",
                     "doc_id", 42L, keep = Seq("r"))})
           SELECT doc_id, mix_source FROM hx JOIN p USING (r)
           WHERE ((h % 1000000) + 1000000) % 1000000 < thresh
           ORDER BY doc_id""",

      // the hash-path temperature resample: w=power(n,0.5) thresholds
      // (the sample_temperature arithmetic at buckets=1e6) against the
      // replayed-xxHash64 bucket
      "sample_temperature_hash" ->
        s"""WITH d AS (
             SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
             FROM documents
           ), s AS (
             SELECT len_bucket, count(*) AS n, power(count(*), 0.5) AS w
             FROM d GROUP BY len_bucket
           ), t AS (SELECT sum(w) AS tw FROM s),
           p AS (
             SELECT len_bucket,
               CAST(round(least(1.0, 200.0 * w / tw / n) * 1000000) AS BIGINT) AS thresh
             FROM s, t),
           hx AS (${xxhash64LongSql(
                     """SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
                        FROM documents""",
                     "doc_id", 42L, keep = Seq("len_bucket"))})
           SELECT doc_id, len_bucket FROM hx JOIN p USING (len_bucket)
           WHERE ((h % 1000000) + 1000000) % 1000000 < thresh
           ORDER BY doc_id""",

      // the mix twin replicates the whole quota arithmetic in SQL:
      // quota=T·w/Σw, thresh=round(min(1,quota/n)·buckets), keep iff
      // doc_id % buckets < thresh (weights cast to DOUBLE so the SQL
      // arithmetic is the same IEEE sequence Spark runs)
      "sample_mix_mod" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents),
           w(r, mix_source, wt) AS (VALUES
             (0, 'web', 0.6), (1, 'code', 0.3), (2, 'books', 0.1)),
           n AS (SELECT r, count(*) AS n FROM d GROUP BY r),
           -- Σw summed left-to-right in DOUBLE, exactly as Scala's
           -- Seq.sum folds it (0.6+0.3+0.1 is NOT 1.0 in IEEE doubles)
           tw AS (SELECT CAST(0.6 AS DOUBLE) + CAST(0.3 AS DOUBLE)
                         + CAST(0.1 AS DOUBLE) AS tw),
           p AS (SELECT w.r, w.mix_source,
                   CAST(round(least(1.0,
                     300.0 * CAST(wt AS DOUBLE) / tw / n) * 100) AS BIGINT) AS thresh
                 FROM w JOIN n USING (r), tw)
           SELECT doc_id, mix_source FROM d JOIN p USING (r)
           WHERE doc_id % 100 < thresh ORDER BY doc_id""",

      // the modulo twin replicates the whole threshold arithmetic in
      // SQL: w=power(n,alpha), thresh=round(min(1,T*w/tw/n)*buckets),
      // keep iff doc_id % buckets < thresh
      "sample_temperature" ->
        """WITH d AS (
             SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
             FROM documents
           ), s AS (
             SELECT len_bucket, count(*) AS n, power(count(*), 0.5) AS w
             FROM d GROUP BY len_bucket
           ), t AS (SELECT sum(w) AS tw FROM s),
           p AS (
             SELECT len_bucket,
               CAST(round(least(1.0, 200.0 * w / tw / n) * 100) AS BIGINT) AS thresh
             FROM s, t)
           SELECT doc_id, len_bucket FROM d JOIN p USING (len_bucket)
           WHERE doc_id % 100 < thresh ORDER BY doc_id""",

      // same seeded text, same RE2-compatible patterns, 'g' = replace
      // all (Spark's regexp_replace default)
      "doc_pii_redact" ->
        """WITH seeded AS (
             SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com see https://ex.org/p/'
                    || CAST(doc_id AS VARCHAR) || ' from 10.1.2.3' AS text
             FROM documents)
           SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS redacted,
             CAST(length(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(length(regexp_extract_all(text,
               'https?://[^\s]+')) AS BIGINT) AS n_urls,
             CAST(length(regexp_extract_all(text,
               '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips
           FROM seeded ORDER BY doc_id""",

      // the column-level scan: same patterns, same seeded corpus;
      // one UNION-ALL arm per (column, kind)
      "pii_column_scan" -> {
        val kinds = Seq(
          "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
          "url" -> """https?://[^\s]+""",
          "ipv4" -> """([0-9]{1,3}\.){3}[0-9]{1,3}""")
        val arms = for {
          c <- Seq("text", "lang", "source"); (k, p) <- kinds
        } yield
          s"""SELECT '$c' AS column_name, '$k' AS pii_kind,
                count(*) AS n_rows,
                CAST(sum(CASE WHEN len(regexp_extract_all($c, '$p')) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_hit,
                CAST(sum(len(regexp_extract_all($c, '$p'))) AS BIGINT) AS n_hits
              FROM seeded"""
        s"""WITH seeded AS (
             SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com see https://ex.org/p/'
                    || CAST(doc_id AS VARCHAR) || ' from 10.1.2.3' AS text,
               lang, source
             FROM documents)
           SELECT * FROM (${arms.mkString(" UNION ALL ")})
           ORDER BY column_name, pii_kind"""
      },

      // k-anonymity replay: class sizes + distinct-sensitive floors,
      // integer throughout, one risk_share division
      // t-closeness replay: observed cells only (absent values via
      // the 1 − Σp_g algebra), rounded-6/1e6-scaled terms, integer
      // class sums, the t comparison on the ROUNDED distance
      "dq_t_closeness" ->
        """WITH c AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000.0) AS INT) AS v
             FROM customer
           ), cells AS (
             SELECT c_nationkey, c_mktsegment, v, count(*) AS cc
             FROM c GROUP BY 1, 2, 3
           ), g AS (
             SELECT v, CAST(sum(cc) AS BIGINT) AS gg FROM cells GROUP BY 1
           ), nn AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM cells
           ), sz AS (
             SELECT c_nationkey, c_mktsegment, CAST(sum(cc) AS BIGINT)
               AS nc
             FROM cells GROUP BY 1, 2
           ), terms AS (
             SELECT cells.c_nationkey, cells.c_mktsegment, sz.nc,
               CAST(round((abs(CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)
                 - CAST(gg AS DOUBLE) / CAST(n AS DOUBLE))
                 - CAST(gg AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
                 AS BIGINT) AS t6
             FROM cells
             JOIN g ON cells.v IS NOT DISTINCT FROM g.v
             JOIN sz
               ON cells.c_nationkey IS NOT DISTINCT FROM sz.c_nationkey
               AND cells.c_mktsegment IS NOT DISTINCT FROM sz.c_mktsegment
             CROSS JOIN nn
           ), a AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(min(nc) AS BIGINT) AS n_rows,
               CAST(CAST(sum(t6) + 1000000 AS BIGINT) AS DOUBLE)
                 / 2000000.0 AS tv_distance
             FROM terms GROUP BY 1, 2)
           SELECT c_nationkey, c_mktsegment, n_rows, tv_distance,
             tv_distance <= 0.2 AS is_t_close
           FROM a ORDER BY c_nationkey, c_mktsegment""",

      "pii_k_anonymity" ->
        """WITH cls AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l
             FROM customer GROUP BY 1, 2
           ), a AS (
             SELECT CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(n) AS BIGINT) AS min_class_size,
               CAST(coalesce(sum(CASE WHEN n < 10 THEN n ELSE 0 END), 0)
                 AS BIGINT) AS risk_rows,
               CAST(min(l) AS BIGINT) AS l_min
             FROM cls)
           SELECT n_rows, n_classes, min_class_size, risk_rows, l_min,
             round(CAST(risk_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
               AS risk_share,
             min_class_size >= 10 AS is_k_anonymous
           FROM a""",

      "dq_numeric_profile" ->
        """SELECT column_name, n_rows, n_null, min_value, max_value, p50, p90 FROM (
             SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
               count(*) FILTER (WHERE o_custkey IS NULL) AS n_null,
               CAST(min(o_custkey) AS DOUBLE) AS min_value,
               CAST(max(o_custkey) AS DOUBLE) AS max_value,
               quantile_cont(CAST(o_custkey AS DOUBLE), 0.5) AS p50,
               quantile_cont(CAST(o_custkey AS DOUBLE), 0.9) AS p90
             FROM orders
             UNION ALL
             SELECT 'o_totalprice', count(*),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9)
             FROM orders
           ) ORDER BY column_name""",

      "decontamination" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_t AS (
             SELECT doc_id AS train_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 <> 0
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), pairs AS (
             SELECT eval_id, train_id, count(*) AS n_common
             FROM sh_e JOIN sh_t USING (gram)
             GROUP BY eval_id, train_id
             HAVING count(*) >= 3)
           SELECT eval_id, worst_train_id, n_common FROM (
             SELECT eval_id, train_id AS worst_train_id, n_common,
               row_number() OVER (PARTITION BY eval_id
                 ORDER BY n_common DESC, train_id DESC) AS rn
             FROM pairs)
           WHERE rn = 1 ORDER BY eval_id""",

      // the direction-flipped delta form: per BATCH doc (train docs
      // with id >= 250), worst offending eval doc
      "decontamination_incr" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_b AS (
             SELECT doc_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 <> 0 AND doc_id >= 250
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), pairs AS (
             SELECT b.doc_id, eval_id, count(*) AS n_common
             FROM sh_b b JOIN sh_e USING (gram)
             GROUP BY b.doc_id, eval_id
             HAVING count(*) >= 3)
           SELECT doc_id, worst_eval_id, n_common FROM (
             SELECT doc_id, eval_id AS worst_eval_id, n_common,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY n_common DESC, eval_id DESC) AS rn
             FROM pairs)
           WHERE rn = 1 ORDER BY doc_id""",

      // the streaming gate's corpus: the eval index is static and
      // flagging is per-doc, so the result is batch-split invariant —
      // train docs minus any sharing >= 3 trigrams with an eval doc
      // the gate verdict is per-doc ⇒ the streamed two-day + replay
      // run equals one batch filter over the padded normalized text
      "stream_phrase_gate" ->
        """SELECT doc_id, text FROM (
             SELECT doc_id, text,
               ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' ' AS p
             FROM documents)
           WHERE NOT contains(p, ' table table ')
             AND NOT contains(p, ' value table ')
           ORDER BY doc_id""",

      "stream_decontam_gate" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_b AS (
             SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 10 <> 0
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), bad AS (
             SELECT DISTINCT doc_id FROM (
               SELECT b.doc_id, eval_id, count(*) AS n_common
               FROM sh_b b JOIN sh_e USING (gram)
               GROUP BY b.doc_id, eval_id
               HAVING count(*) >= 3))
           SELECT doc_id, text FROM documents
           WHERE doc_id % 10 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM bad)
           ORDER BY doc_id""",

      "curation_pipeline" ->
        s"""WITH quality AS (
             SELECT doc_id, text FROM documents
             WHERE $nWordsSql >= 5
               AND ${stopHits(s"string_split($norm, ' ')", functions.Text.StopwordsEn)} > 0
           ), keepers AS (
             SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5($norm)
           ), survivors AS (
             SELECT q.doc_id, q.text FROM quality q
             JOIN keepers k ON q.doc_id = k.doc_id
           ), sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM survivors)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh
           ), losers AS (
             SELECT DISTINCT id_b AS doc_id FROM (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(count(*) AS DOUBLE)
                   / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
               FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
               GROUP BY a.id, b.id, a.cnt, b.cnt)
             WHERE jaccard >= 0.5
           )
           SELECT s.doc_id,
             CASE WHEN s.doc_id % 100 < 80 THEN 'train'
                  WHEN s.doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM survivors s
           WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
           ORDER BY s.doc_id""",

      // chunking replayed: same last-start ceil arithmetic, same
      // 1-based inclusive slice bounds, same min(window, n-start)
      // chunk length
      "doc_chunk" ->
        """WITH w AS (
             SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
             FROM documents
           ), n AS (
             SELECT doc_id, ts, len(ts) AS n FROM w
           ), c AS (
             SELECT doc_id, ts, n, unnest(range(0,
               CASE WHEN n <= 32 THEN 1
                    ELSE CAST(ceil(CAST(n - 32 AS DOUBLE) / 24) AS INT) + 1
               END)) AS chunk_id
             FROM n)
           SELECT doc_id, chunk_id,
             array_to_string(
               ts[chunk_id*24 + 1 : chunk_id*24 + least(32, n - chunk_id*24)],
               ' ') AS chunk_text,
             least(32, n - chunk_id*24) AS n_tokens
           FROM c ORDER BY doc_id, chunk_id""",

      // md5-slice of the normalized text — both engines hash the same
      // UTF-8 bytes, so the full-row fingerprint grades bit-exact
      "doc_fingerprint_md5" ->
        s"""SELECT doc_id,
             ${md5Hash60Sql(norm)} AS fingerprint
           FROM documents ORDER BY doc_id""",

      // winnowing replayed end-to-end: k=5 gram sequence (duplicates
      // kept, position order), w=4 window minima, distinct sort
      "doc_winnow_md5" ->
        s"""SELECT doc_id, unnest(sel) AS fingerprint
           FROM (${winnowSql(5, 4)})
           ORDER BY doc_id, fingerprint""",

      // sharedRuns replayed: winnow fingerprint sets → document
      // frequency cap (df ≤ 200) → pair shared-fingerprint counts
      "doc_shared_runs_md5" ->
        s"""WITH fp AS (
             SELECT doc_id, unnest(sel) AS fp FROM (${winnowSql(5, 4)})
           ), kept AS (
             SELECT * FROM fp WHERE fp IN (
               SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 200))
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 1
           ORDER BY id_a, id_b""",

      // the incremental twin: merged-df cap + same fingerprints ⇒
      // the delta path equals the full run restricted to pairs whose
      // later doc is in the batch (id_b ≥ cut)
      "doc_shared_runs_incr_md5" ->
        s"""WITH fp AS (
             SELECT doc_id, unnest(sel) AS fp FROM (${winnowSql(5, 4)})
           ), kept AS (
             SELECT * FROM fp WHERE fp IN (
               SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 200))
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
             AND b.doc_id >= 250
           GROUP BY 1, 2 HAVING count(*) >= 1
           ORDER BY id_a, id_b""",

      "dedup_exact" ->
        s"""SELECT md5($norm) AS content_hash,
             min(doc_id) AS keeper_id, count(*) AS n_copies
           FROM documents GROUP BY 1 ORDER BY content_hash""",

      "dedup_exact_incremental" ->
        s"""WITH ex AS (
             SELECT DISTINCT md5($norm) AS content_hash
             FROM documents WHERE doc_id < 250
           ), nb AS (
             SELECT md5($norm) AS content_hash, doc_id
             FROM documents WHERE doc_id >= 250)
           SELECT content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
           FROM nb WHERE content_hash NOT IN (SELECT content_hash FROM ex)
           GROUP BY 1 ORDER BY content_hash""",

      // the oracle is the definition: a quadratic levenshtein join
      // over the same seeded corpus (the custkey cap in the query
      // bounds it); length-band prefilter only cuts oracle runtime
      "dedup_edit_distance" ->
        """WITH seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.s, c.s) AS INTEGER) AS dist
           FROM corpus a JOIN corpus c
             ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
           WHERE levenshtein(a.s, c.s) <= 2
           ORDER BY id_a, id_b""",

      // recursive closure over the definitional levenshtein pair join
      "dedup_edit_clusters" ->
        """WITH RECURSIVE seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0
           ), pairs AS (
             SELECT a.id AS id_a, c.id AS id_b
             FROM corpus a JOIN corpus c
               ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
             WHERE levenshtein(a.s, c.s) <= 2
           ), edges AS (
             SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs
           ), reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.id
           )
           SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",

      // the full quadratic join restricted to batch-touching pairs
      // (batch = the mutated ids ≥ 10M) — the delta path must equal it
      "dedup_edit_distance_incr" ->
        """WITH seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.s, c.s) AS INTEGER) AS dist
           FROM corpus a JOIN corpus c
             ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
           WHERE levenshtein(a.s, c.s) <= 2
             AND (a.id >= 10000000 OR c.id >= 10000000)
           ORDER BY id_a, id_b""",

      "dedup_rate_report" ->
        s"""SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             count(*) AS n_distinct,
             CAST(sum(c) - count(*) AS BIGINT) AS dup_docs,
             round((sum(c) - count(*)) / CAST(sum(c) AS DOUBLE), 6) AS dup_rate
           FROM (SELECT source, md5($norm) AS h, count(*) AS c
                 FROM documents GROUP BY 1, 2)
           GROUP BY source ORDER BY source""",

      "dedup_ngram_jaccard" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh)
           SELECT id_a, id_b, jaccard FROM (
             SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS DOUBLE)
                 / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
             FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
             GROUP BY a.id, b.id, a.cnt, b.cnt)
           WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

      // the incremental twin: exact merged-df semantics ⇒ the delta
      // path equals the full pipeline restricted to id_b ≥ cut
      "dedup_ngram_jaccard_incr" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh)
           SELECT id_a, id_b, jaccard FROM (
             SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS DOUBLE)
                 / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
             FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
               AND b.id >= 250
             GROUP BY a.id, b.id, a.cnt, b.cnt)
           WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

      // the full MinHash-LSH pipeline replayed: md5-slice shingle
      // hash, Kirsch–Mitzenmacher h1/h2 (h2 = xxhash64(h1') replayed
      // via the xxHash64 chain), 32 min-signature slots, 16 2-row
      // bands (tuple equality ≡ Spark's band-bucket hash equality),
      // exact-Jaccard rescore on the distinct shingle sets
      "dedup_minhash_md5" -> minhashMd5Sql(pairWhere = ""),

      // the incremental twin: identical hashes + banding ⇒ the delta
      // path's output is EXACTLY the full run's pairs that touch the
      // batch (id_b ≥ cut) — so the oracle is the same pipeline with
      // that one restriction
      "dedup_minhash_incr_md5" ->
        minhashMd5Sql(pairWhere = "AND c.doc_id >= 250"),

      // the two-day group-store run: day 1 emits pairs whose later
      // doc is in [200,350), day 2 those ≥ 350 — together exactly
      // the full run's pairs with id_b ≥ 200
      "dedup_minhash_vg_md5" ->
        minhashMd5Sql(pairWhere = "AND c.doc_id >= 200"),

      // the streaming ingest gate's two-stage semantics (NOT the
      // batch pairs-losers run): day-1 losers come from pairs wholly
      // inside day 1; day-2 losers from pairs whose earlier side
      // SURVIVED day 1 (gated-out docs never enter the index) or is
      // intra-day-2; the corpus is everything never a loser
      "stream_neardup_gate" ->
        s"""WITH pairs AS (SELECT id_a, id_b FROM (${minhashMd5Sql("")})),
             l1 AS (SELECT DISTINCT id_b FROM pairs WHERE id_b < 250),
             l2 AS (SELECT DISTINCT p.id_b FROM pairs p
                    WHERE p.id_b >= 250
                      AND (p.id_a >= 250
                           OR p.id_a NOT IN (SELECT id_b FROM l1)))
           SELECT doc_id, text FROM documents
           WHERE doc_id NOT IN (SELECT id_b FROM l1)
             AND doc_id NOT IN (SELECT id_b FROM l2)
           ORDER BY doc_id""",

      // SimHash replayed: per-bit votes over the md5-slice shingle
      // hashes, majority signature, 4×16-bit pigeonhole blocks,
      // hamming ≤ 3 verify via bit_count(xor)
      "dedup_simhash_md5" -> simhashMd5Sql(pairWhere = ""),

      // the incremental twin: same signatures + same blocks ⇒ the
      // delta path equals the full run restricted to id_b ≥ cut
      "dedup_simhash_incr_md5" ->
        simhashMd5Sql(pairWhere = "AND c.doc_id >= 250"),

      // containment replay on gram STRINGS (the engine's xxhash64
      // longs are a w.h.p.-collision-free stand-in — the
      // dedup_ngram_jaccard precedent)
      "doc_containment" ->
        s"""WITH g AS (
             SELECT doc_id, unnest(grams) AS gram
             FROM (${gramsSql(3, distinct = true)})
           ), q AS (
             SELECT doc_id AS query_id, gram FROM g WHERE doc_id IN (0, 1, 2)
           ), qs AS (
             SELECT query_id, count(*) AS qn FROM q GROUP BY 1
           ), j AS (
             SELECT q.query_id, g.doc_id, count(*) AS n_common
             FROM g JOIN q USING (gram) WHERE g.doc_id != q.query_id
             GROUP BY 1, 2)
           SELECT query_id, doc_id, n_common,
             round(n_common / CAST(qn AS DOUBLE), 6) AS containment
           FROM j JOIN qs USING (query_id)
           WHERE round(n_common / CAST(qn AS DOUBLE), 6) >= 0.02
           ORDER BY query_id, doc_id""",

      // same block key, same threshold — plain SQL replays the whole
      // candidate pass (levenshtein is engine-agnostic: edit distance
      // is a unique integer)
      "er_fuzzy_pairs" ->
        """WITH b AS (
             SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS blk FROM part
             WHERE p_partkey % 4 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.name, c.name) AS INT) AS dist
           FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
           WHERE levenshtein(a.name, c.name) <= 2
           ORDER BY id_a, id_b""",

      // golden-record replay: same pairs → recursive-reachability
      // components → per-attribute survivorship with identical
      // tie-breaks (len desc/value asc, cnt desc/value asc)
      "er_golden_record" ->
        """WITH RECURSIVE b AS (
             SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS blk FROM part
             WHERE p_partkey % 4 = 0
           ), pairs AS (
             SELECT a.id AS id_a, c.id AS id_b
             FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
             WHERE levenshtein(a.name, c.name) <= 2
           ), edges AS (
             SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs
           ), reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.id
           ), cmp AS (
             SELECT id, min(r) AS comp FROM reach GROUP BY id
           ), m AS (
             SELECT coalesce(c.comp, p.p_partkey) AS comp, p.*
             FROM part p LEFT JOIN cmp c ON p.p_partkey = c.id
             WHERE p.p_partkey % 4 = 0
           ), sz AS (
             SELECT comp, CAST(count(*) AS BIGINT) AS n_members
             FROM m GROUP BY 1 HAVING count(*) >= 2
           ), nm AS (
             SELECT comp, p_name FROM (
               SELECT comp, p_name, row_number() OVER (PARTITION BY comp
                 ORDER BY length(p_name) DESC, p_name) AS rn FROM m)
             WHERE rn = 1
           ), br AS (
             SELECT comp, p_brand FROM (
               SELECT comp, p_brand, row_number() OVER (PARTITION BY comp
                 ORDER BY cnt DESC, p_brand) AS rn
               FROM (SELECT comp, p_brand, count(*) AS cnt
                     FROM m GROUP BY 1, 2))
             WHERE rn = 1
           ), ty AS (
             SELECT comp, p_type FROM (
               SELECT comp, p_type, row_number() OVER (PARTITION BY comp
                 ORDER BY cnt DESC, p_type) AS rn
               FROM (SELECT comp, p_type, count(*) AS cnt
                     FROM m GROUP BY 1, 2))
             WHERE rn = 1
           ), ag AS (
             SELECT comp, max(p_size) AS p_size,
               min(p_retailprice) AS p_retailprice
             FROM m GROUP BY 1)
           SELECT sz.comp, sz.n_members, nm.p_name, br.p_brand, ty.p_type,
             ag.p_size, ag.p_retailprice
           FROM sz JOIN nm USING (comp) JOIN br USING (comp)
             JOIN ty USING (comp) JOIN ag USING (comp)
           ORDER BY comp""",

      // vault hub replay: md5 business-key hashes, min source tag
      "dv_hub_customer" ->
        """WITH u AS (
             SELECT c_custkey AS custkey, 'crm' AS src FROM customer
             UNION ALL SELECT o_custkey, 'orders' FROM orders
           ), h AS (
             SELECT custkey, min(src) AS record_source FROM u GROUP BY 1)
           SELECT md5(concat_ws('||', CAST(custkey AS VARCHAR))) AS hub_key,
             custkey, record_source, 'L1' AS load_id
           FROM h ORDER BY custkey""",

      // vault link replay: distinct relationship instances, hash of
      // all keys plus each side's hub key
      "dv_link_order_customer" ->
        """WITH dt AS (SELECT DISTINCT o_orderkey, o_custkey FROM orders)
           SELECT md5(concat_ws('||', CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR))) AS link_key,
             md5(concat_ws('||', CAST(o_orderkey AS VARCHAR))) AS hub_a_key,
             md5(concat_ws('||', CAST(o_custkey AS VARCHAR))) AS hub_b_key,
             o_orderkey, o_custkey, 'orders' AS record_source,
             'L1' AS load_id
           FROM dt ORDER BY o_orderkey""",

      // vault satellite-delta replay: hash_diff anti-join — only the
      // modified attribute states land
      "dv_satellite_delta" ->
        """WITH cur AS (
             SELECT DISTINCT
               md5(concat_ws('||', CAST(c_custkey AS VARCHAR))) AS hub_key,
               md5(concat_ws('||', c_mktsegment,
                 CAST(c_nationkey AS VARCHAR))) AS hash_diff
             FROM customer
           ), b2 AS (
             SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN 'X-' || c_mktsegment
                 ELSE c_mktsegment END AS c_mktsegment,
               c_nationkey
             FROM customer
           ), st AS (
             SELECT DISTINCT
               md5(concat_ws('||', CAST(c_custkey AS VARCHAR))) AS hub_key,
               md5(concat_ws('||', c_mktsegment,
                 CAST(c_nationkey AS VARCHAR))) AS hash_diff,
               c_mktsegment, c_nationkey
             FROM b2)
           SELECT st.hub_key, st.hash_diff, st.c_mktsegment,
             st.c_nationkey, 'crm' AS record_source, 'L2' AS load_id
           FROM st LEFT JOIN cur ON st.hub_key = cur.hub_key
             AND st.hash_diff = cur.hash_diff
           WHERE cur.hub_key IS NULL
           ORDER BY st.hub_key""",

      "dedup_components" ->
        s"""WITH RECURSIVE sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh
           ), pairs AS (
             SELECT id_a, id_b FROM (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(count(*) AS DOUBLE)
                   / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
               FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
               GROUP BY a.id, b.id, a.cnt, b.cnt)
             WHERE jaccard >= 0.5
           ), edges AS (
             SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs
           ), reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.id
           )
           SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",
  )
}
