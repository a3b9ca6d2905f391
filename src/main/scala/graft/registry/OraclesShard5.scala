package graft

import graft.OracleFragments._

/** Oracle-registry shard 5/6 — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard5 {
  val m: Map[String, String] = Map(
      // leakage-safe split: same cluster ⇒ same split; the recursive
      // components CTE is the dedup_components oracle re-used as the
      // split key (coalesced to the doc's own id)
      "sample_split_leakage_safe" ->
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
           ), comps AS (
             SELECT id, min(r) AS comp FROM reach GROUP BY id
           )
           SELECT d.doc_id,
             CASE WHEN gk % 100 < 80 THEN 'train'
                  WHEN gk % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM (SELECT doc_id, coalesce(c.comp, doc_id) AS gk
                 FROM documents LEFT JOIN comps c ON doc_id = c.id) d
           ORDER BY d.doc_id""",

      // keep-best-per-cluster: longest doc wins, lowest id on ties;
      // same components CTE
      "dedup_keep_best" ->
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
           ), comps AS (
             SELECT id, min(r) AS comp FROM reach GROUP BY id
           ), withc AS (
             SELECT doc_id, $nWordsSql AS n_words,
                    coalesce(c.comp, doc_id) AS comp
             FROM documents LEFT JOIN comps c ON doc_id = c.id
           )
           SELECT comp, doc_id AS keeper_id, n_words FROM (
             SELECT comp, doc_id, n_words,
               row_number() OVER (PARTITION BY comp
                 ORDER BY n_words DESC, doc_id) AS rn
             FROM withc)
           WHERE rn = 1 ORDER BY comp""",

      "dedup_embedding" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
           SELECT id_a, id_b, cosine FROM (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(generate_series(1, len(a.v)),
                 i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
             FROM e a JOIN e b ON a.vec_id < b.vec_id)
           WHERE cosine >= 0.45 ORDER BY id_a, id_b""",

      // the LSH scale path, FULLY replicated: same hyperplanes (as
      // literals), same sign-bit buckets, same candidate join +
      // distinct, same cosine rescoring and tie-breaks — measured
      // bit-exact vs Spark at sf0.01 and sf0.1
      "dedup_embedding_lsh" ->
        s"""WITH ${lshBucketsCte(tables = 12, planes = 4)},
           cand AS (
             SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
             FROM b a JOIN b c ON a.t = c.t AND a.bucket = c.bucket AND a.vec_id < c.vec_id),
           scored AS (
             SELECT id_a, id_b,
               list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(y.v, x -> x * x)))) AS cosine
             FROM cand JOIN e x ON cand.id_a = x.vec_id
                       JOIN e y ON cand.id_b = y.vec_id)
           SELECT id_a, id_b, cosine FROM scored
           WHERE cosine >= 0.45 ORDER BY id_a, id_b""",

      // the incremental twin: same planes + buckets ⇒ the delta path
      // equals the full run restricted to id_b ≥ cut
      "dedup_embedding_incr" ->
        s"""WITH ${lshBucketsCte(tables = 12, planes = 4)},
           cand AS (
             SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
             FROM b a JOIN b c ON a.t = c.t AND a.bucket = c.bucket
               AND a.vec_id < c.vec_id AND c.vec_id >= 250),
           scored AS (
             SELECT id_a, id_b,
               list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(y.v, x -> x * x)))) AS cosine
             FROM cand JOIN e x ON cand.id_a = x.vec_id
                       JOIN e y ON cand.id_b = y.vec_id)
           SELECT id_a, id_b, cosine FROM scored
           WHERE cosine >= 0.45 ORDER BY id_a, id_b""",

      "ann_lsh_topk" ->
        s"""WITH ${lshBucketsCte(tables = 4, planes = 8)},
           cand AS (
             SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
             FROM b cb JOIN b qb ON cb.t = qb.t AND cb.bucket = qb.bucket
             WHERE qb.vec_id < 5 AND cb.vec_id <> qb.vec_id),
           scored AS (
             SELECT query_id, neighbor_id,
               list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * q.v[i]))
               / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.v, x -> x * x)))) AS cosine
             FROM cand JOIN e c ON cand.neighbor_id = c.vec_id
                       JOIN e q ON cand.query_id = q.vec_id)
           SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
             SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn FROM scored)
           WHERE rn <= 10 ORDER BY query_id, rank""",

      // IVF mechanics end-to-end: deterministic first-16 centroids,
      // squared-L2 argmin assignment (dist ties to the lower cell),
      // nprobe=4 probe ranking, cell-local scoring, two-phase top-k —
      // the same -2·dot+|c|² arithmetic Spark's codegen'd chain runs
      // shared by the full-corpus and incremental-index forms: fixed
      // centroids make per-row assignment deterministic, so the
      // appended index answers queries identically to a full rebuild
      "ann_ivf_topk" -> ivfTopkOracleSql,
      "ann_ivf_incr_topk" -> ivfTopkOracleSql,

      // k-NN weak labeling: exact top-10 neighbors then an integer
      // majority vote, ties to the lowest label
      // shared by the batch form and the streaming door (static seed
      // corpus => batch-split-invariant predictions)
      "ann_knn_label" -> knnLabelOracleSql,
      "stream_knn_label" -> knnLabelOracleSql,

      "ann_brute_topk" ->
        """WITH q AS (SELECT vec_id AS query_id,
               CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
           c AS (SELECT vec_id AS neighbor_id,
               CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
           scored AS (
             SELECT query_id, neighbor_id,
               list_sum(list_transform(generate_series(1, len(cv)),
                 i -> cv[i] * qv[i]))
               / (sqrt(list_sum(list_transform(cv, x -> x * x)))
                  * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cosine
             FROM c, q WHERE neighbor_id <> query_id)
           SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
             SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn
             FROM scored)
           WHERE rn <= 10 ORDER BY query_id, rank""",

      // PQ replay: normalize → per-subspace argmin code assignment
      // against the first-16 codebooks → ADC table lookups summed in
      // j-order (list(val ORDER BY j) then list_sum ≡ Spark's
      // sequential fold) → candidate cut at 40 → exact-cosine rerank
      "ann_pq_topk" ->
        """WITH nrmv AS (
             SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
               x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS nv
             FROM (SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                       x -> x * x))) AS nrm FROM embeddings)
           ), cb AS (
             SELECT vec_id AS c, j, list_transform(generate_series(1, 16),
               i -> nv[j * 16 + i]) AS cv
             FROM nrmv CROSS JOIN generate_series(0, 3) t(j) WHERE vec_id < 16
           ), cbs AS (
             SELECT c, j, cv,
               list_sum(list_transform(cv, x -> x * x)) AS cc FROM cb
           ), ad AS (
             SELECT n.vec_id, b.j, b.c,
               -2 * list_sum(list_transform(generate_series(1, 16),
                 i -> n.nv[b.j * 16 + i] * b.cv[i])) + b.cc AS dist
             FROM nrmv n CROSS JOIN cbs b
           ), codes AS (
             SELECT vec_id, j, c FROM (
               SELECT vec_id, j, c, row_number() OVER (
                 PARTITION BY vec_id, j ORDER BY dist, c) AS r FROM ad)
             WHERE r = 1
           ), pairv AS (
             SELECT q.vec_id AS query_id, k.vec_id AS neighbor_id, k.j,
               list_sum(list_transform(generate_series(1, 16),
                 i -> q.nv[k.j * 16 + i] * b.cv[i])) AS val
             FROM codes k JOIN cbs b ON k.j = b.j AND k.c = b.c
             CROSS JOIN (SELECT vec_id, nv FROM nrmv WHERE vec_id < 5) q
             WHERE k.vec_id <> q.vec_id
           ), scored AS (
             SELECT query_id, neighbor_id,
               list_sum(list(val ORDER BY j)) AS qscore
             FROM pairv GROUP BY query_id, neighbor_id
           ), cand AS (
             SELECT query_id, neighbor_id FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qscore DESC, neighbor_id) AS rn FROM scored)
             WHERE rn <= 40
           ), q2 AS (
             SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 5
           ), c2 AS (
             SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings
           ), rer AS (
             SELECT cand.query_id, cand.neighbor_id,
               list_sum(list_transform(generate_series(1, len(cv)),
                 i -> cv[i] * qv[i]))
               / (sqrt(list_sum(list_transform(cv, x -> x * x)))
                  * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cosine
             FROM cand JOIN c2 USING (neighbor_id) JOIN q2 USING (query_id))
           SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
             SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn FROM rer)
           WHERE rn <= 10 ORDER BY query_id, rank""",

      // int8 SQ replay: per-dim min/max → the identical clamp/round
      // code arithmetic (exact integer-valued doubles throughout) →
      // integer-dot candidate cut at 40 → exact-cosine rerank. The
      // corpus dimension (64) is fixed in the testdata, as the LSH
      // plane replay already assumes
      "ann_sq8_topk" ->
        """WITH nrmv AS (
             SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
               x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS nv
             FROM (SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                       x -> x * x))) AS nrm FROM embeddings)
           ), mm AS (
             SELECT i, min(nv[i]) AS lo, max(nv[i]) AS hi
             FROM nrmv, generate_series(1, 64) t(i) GROUP BY i
           ), arrs AS (
             SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM mm
           ), codes AS (
             SELECT vec_id, list_transform(generate_series(1, 64),
               i -> CASE WHEN his[i] = los[i] THEN -128
                    ELSE CAST(least(255, greatest(0,
                      round((nv[i] - los[i])
                        / (his[i] - los[i]) * 255))) AS BIGINT) - 128 END) AS code
             FROM nrmv, arrs
           ), qc AS (
             SELECT vec_id AS query_id, code AS qcode FROM codes WHERE vec_id < 5
           ), scored AS (
             SELECT query_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(qcode[i] * code[i] AS DOUBLE))) AS BIGINT) AS qdot
             FROM codes c, qc WHERE c.vec_id <> query_id
           ), cand AS (
             SELECT query_id, neighbor_id FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qdot DESC, neighbor_id) AS rn FROM scored)
             WHERE rn <= 40
           ), q2 AS (
             SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 5
           ), c2 AS (
             SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings
           ), rer AS (
             SELECT cand.query_id, cand.neighbor_id,
               list_sum(list_transform(generate_series(1, len(cv)),
                 i -> cv[i] * qv[i]))
               / (sqrt(list_sum(list_transform(cv, x -> x * x)))
                  * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cosine
             FROM cand JOIN c2 USING (neighbor_id) JOIN q2 USING (query_id))
           SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
             SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn FROM rer)
           WHERE rn <= 10 ORDER BY query_id, rank""",

      // ---- r8 wave 4 ----
      // the distributed two-phase numbering must equal the
      // single-window definitional form verbatim
      "surrogate_keys" ->
        """SELECT o_orderkey, o_orderdate,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS sk
           FROM orders ORDER BY sk""",

      // full recompute over ALL events — the incremental fold must be
      // indistinguishable from it (decimal sums make the partial-merge
      // arithmetic exact; avg = one double division, round(6))
      "mv_incremental" ->
        """SELECT user_id, event_type, count(*) AS n_rows,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(value) AS min_value, max(value) AS max_value,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS avg_value
           FROM events GROUP BY user_id, event_type
           ORDER BY user_id, event_type""",

      // fact recompute over the original events table — the
      // state-answered rewrite must be indistinguishable from it
      "mv_rewrite" ->
        """SELECT event_type, count(*) AS n_rows,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(value) AS min_value, max(value) AS max_value
           FROM events WHERE event_type <> '__none__'
           GROUP BY event_type ORDER BY event_type""",

      // both versions' contents replayed from the same base table,
      // then the keyed null-safe diff (IS DISTINCT FROM ≡ Spark <=>)
      "versioned_change_feed" ->
        """WITH v1 AS (
             SELECT c_custkey, c_name, c_acctbal FROM customer
             WHERE c_custkey % 10 <> 3
           ), v2 AS (
             SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal
             FROM customer WHERE c_custkey % 10 <> 7
           ), d AS (
             SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
               CASE WHEN a.c_custkey IS NULL THEN 'insert'
                    WHEN b.c_custkey IS NULL THEN 'delete'
                    WHEN (a.c_name IS DISTINCT FROM b.c_name)
                      OR (a.c_acctbal IS DISTINCT FROM b.c_acctbal)
                    THEN 'update' END AS change_type,
               CASE WHEN b.c_custkey IS NULL THEN a.c_name
                    ELSE b.c_name END AS c_name,
               CASE WHEN b.c_custkey IS NULL THEN a.c_acctbal
                    ELSE b.c_acctbal END AS c_acctbal
             FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
           SELECT * FROM d WHERE change_type IS NOT NULL
           ORDER BY c_custkey""",

      // med/mad via the same interpolated percentile the dq profiles
      // grade; the outlier flag compares round(6) on both sides
      "events_mad_outliers" ->
        """WITH med AS (
             SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY event_type
           ), dev AS (
             SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
             FROM events e JOIN med m USING (event_type)
           ), mad AS (
             SELECT event_type, quantile_cont(dev, 0.5) AS mad
             FROM dev GROUP BY event_type)
           SELECT d.event_type, round(max(d.med), 6) AS med,
             round(max(m.mad), 6) AS mad,
             CAST(sum(CASE WHEN round(d.dev, 6) > round(3.0 * m.mad, 6)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             count(*) AS n_rows
           FROM dev d JOIN mad m USING (event_type)
           GROUP BY d.event_type ORDER BY d.event_type""",

      // the same interleaved carry: touches publish (ts, id), IGNORE
      // NULLS last_value carries them to each purchase; date_diff from
      // the epoch = unix_timestamp's floored seconds
      "events_attribution" ->
        """WITH e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
             FROM events
             WHERE event_type IN ('click', 'view', 'purchase')
           ), c AS (
             SELECT user_id, event_id, ts, is_conv,
               last_value(CASE WHEN is_conv = 0 THEN ts END IGNORE NULLS)
                 OVER w AS t_ts,
               last_value(CASE WHEN is_conv = 0 THEN event_id END IGNORE NULLS)
                 OVER w AS t_id
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_conv, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           SELECT user_id, event_id AS conv_id, ts AS conv_ts,
             CASE WHEN date_diff('second', TIMESTAMP '1970-01-01', ts)
                 - date_diff('second', TIMESTAMP '1970-01-01', t_ts) <= 604800
               THEN t_id END AS touch_id,
             CASE WHEN date_diff('second', TIMESTAMP '1970-01-01', ts)
                 - date_diff('second', TIMESTAMP '1970-01-01', t_ts) <= 604800
               THEN t_ts END AS touch_ts
           FROM c WHERE is_conv = 1 ORDER BY conv_id""",

      // linear multi-touch: per-conversion equal split over the 50
      // most recent in-window touches, credit rounded once per row
      "events_attribution_linear" ->
        """WITH t AS (
             SELECT user_id, event_id AS touch_id,
               CAST(ts AS TIMESTAMP) AS touch_ts
             FROM events WHERE event_type IN ('click', 'view')
           ), c AS (
             SELECT user_id, event_id AS conv_id,
               CAST(ts AS TIMESTAMP) AS conv_ts
             FROM events WHERE event_type = 'purchase'
           ), j AS (
             SELECT c.user_id, conv_id, conv_ts, touch_id, touch_ts
             FROM c JOIN t USING (user_id)
             WHERE touch_ts <= conv_ts
               AND date_diff('second', TIMESTAMP '1970-01-01', conv_ts)
                 - date_diff('second', TIMESTAMP '1970-01-01', touch_ts)
                 <= 604800
           ), k AS (
             SELECT *, row_number() OVER (PARTITION BY conv_id
               ORDER BY touch_ts DESC, touch_id DESC) AS r
             FROM j)
           SELECT user_id, conv_id, conv_ts, touch_id, touch_ts,
             round(1.0 / (count(*) OVER (PARTITION BY conv_id)), 6) AS credit
           FROM k WHERE r <= 50
           ORDER BY conv_id, touch_id""",

      // U-shaped: positions computed over the capped set; the middle
      // weight is written as the SAME double expression Spark folds
      // (1.0 - 0.4 - 0.4), so rounding sees identical inputs
      "events_attribution_ushape" ->
        """WITH t AS (
             SELECT user_id, event_id AS touch_id,
               CAST(ts AS TIMESTAMP) AS touch_ts
             FROM events WHERE event_type IN ('click', 'view')
           ), c AS (
             SELECT user_id, event_id AS conv_id,
               CAST(ts AS TIMESTAMP) AS conv_ts
             FROM events WHERE event_type = 'purchase'
           ), j AS (
             SELECT c.user_id, conv_id, conv_ts, touch_id, touch_ts
             FROM c JOIN t USING (user_id)
             WHERE touch_ts <= conv_ts
               AND date_diff('second', TIMESTAMP '1970-01-01', conv_ts)
                 - date_diff('second', TIMESTAMP '1970-01-01', touch_ts)
                 <= 604800
           ), k AS (
             SELECT *, row_number() OVER (PARTITION BY conv_id
               ORDER BY touch_ts DESC, touch_id DESC) AS r
             FROM j
           ), f AS (
             SELECT * FROM k WHERE r <= 50
           ), p AS (
             SELECT *, row_number() OVER (PARTITION BY conv_id
                 ORDER BY touch_ts ASC, touch_id ASC) AS pos,
               count(*) OVER (PARTITION BY conv_id) AS n
             FROM f)
           SELECT user_id, conv_id, conv_ts, touch_id, touch_ts,
             round(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
               WHEN pos = 1 THEN 0.4 WHEN pos = n THEN 0.4
               ELSE (1.0 - 0.4 - 0.4) / (n - 2) END, 6) AS credit
           FROM p ORDER BY conv_id, touch_id""",

      // α=0.5 depth-16 lag chain, literals written as exact decimal
      // expansions of 2⁻ᵏ; left-to-right adds in both engines
      "events_decay" -> {
        val terms = (0 until 16).map { k =>
          val p = new java.math.BigDecimal(math.pow(0.5, k)).toPlainString
          s"coalesce(lag(value, $k) OVER w, 0.0) * $p"
        }.mkString("\n               + ")
        s"""WITH e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
             FROM events)
           SELECT user_id, event_id, ts, value,
             $terms AS decayed_value
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY user_id, ts, event_id"""
      },

      // per-value counts → cumulative CDFs → max gap; identical
      // divisions, round(6) on the one reported double
      "dq_drift_ks" ->
        """WITH g AS (
             SELECT value AS v,
               CAST(sum(CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
               CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cc
             FROM events GROUP BY value
           ), t AS (
             SELECT CAST(sum(cr) AS BIGINT) AS nr,
               CAST(sum(cc) AS BIGINT) AS nc FROM g
           ), c AS (
             SELECT
               CAST(sum(cr) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS fr,
               CAST(sum(cc) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS fc
             FROM g)
           SELECT nr AS n_ref, nc AS n_cur,
             round(max(abs(fr / CAST(nr AS DOUBLE)
               - fc / CAST(nc AS DOUBLE))), 6) AS ks_d
           FROM c, t GROUP BY nr, nc""",

      // tokenization, tf/df, Lucene-shifted idf, the k1/b norm and the
      // round(4) score all replayed; same (score desc, id) cut
      "doc_bm25_search" -> {
        val normSql = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
        s"""WITH words AS (
             SELECT doc_id AS id, unnest(string_split($normSql, ' ')) AS term
             FROM documents
           ), w AS (SELECT id, term FROM words WHERE length(term) > 0
           ), lens AS (SELECT id, count(*) AS dl FROM w GROUP BY id
           ), stats AS (
             SELECT count(*) AS n,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens
           ), tf AS (
             SELECT id, term, count(*) AS tf FROM w
             WHERE term IN ('window', 'join', 'scan') GROUP BY id, term
           ), df AS (SELECT term, count(*) AS df FROM tf GROUP BY term
           ), scored AS (
             SELECT tf.id,
               ln((CAST(n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                 / (CAST(df.df AS DOUBLE) + 0.5) + 1)
               * (CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (1 - 0.75 + 0.75 * CAST(lens.dl AS DOUBLE) / avgdl))
                 AS contrib
             FROM tf JOIN df USING (term) JOIN lens USING (id), stats)
           SELECT id, round(sum(contrib), 4) AS score,
             count(*) AS n_terms
           FROM scored GROUP BY id
           ORDER BY score DESC, id LIMIT 20"""
      },

      // the expected provenance, stated literally: the gate proves
      // the Catalyst plan walk reports exactly these dependencies
      "pipeline_column_lineage" ->
        """SELECT * FROM (VALUES
             ('customer_id', 'orders', 'o_custkey'),
             ('discount', 'lineitem', 'l_discount'),
             ('extended_price', 'lineitem', 'l_extendedprice'),
             ('line_number', 'lineitem', 'l_linenumber'),
             ('order_date', 'orders', 'o_orderdate'),
             ('order_id', 'lineitem', 'l_orderkey'),
             ('order_status', 'orders', 'o_orderstatus'),
             ('part_id', 'lineitem', 'l_partkey'),
             ('quantity', 'lineitem', 'l_quantity'),
             ('revenue', 'lineitem', 'l_discount'),
             ('revenue', 'lineitem', 'l_extendedprice'),
             ('ship_date', 'lineitem', 'l_shipdate'),
             ('supplier_id', 'lineitem', 'l_suppkey'))
           AS t("column", source_table, source_column)
           ORDER BY "column", source_table, source_column""",

      // canonical co-purchase edges, a<b<c closed-triple count, and
      // the Σd(d−1)/2 wedge denominator
      "graph_triangles" ->
        """WITH li AS (
             SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             WHERE l_partkey % 4 = 0
           ), e AS (
             SELECT DISTINCT x.pk AS a, y.pk AS b
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
           ), deg AS (
             SELECT n, count(*) AS d FROM (
               SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
             GROUP BY n
           ), tri AS (
             SELECT count(*) AS t
             FROM e e1 JOIN e e2 ON e1.b = e2.a
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
           ), st AS (
             SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d) / 2 AS BIGINT) AS n_edges,
               CAST(sum(d * (d - 1) / 2) AS DOUBLE) AS wedges
             FROM deg)
           SELECT n_nodes, n_edges, CAST(t AS BIGINT) AS n_triangles,
             CASE WHEN wedges > 0
               THEN round(3.0 * CAST(t AS DOUBLE) / wedges, 6)
               ELSE 0.0 END AS clustering_coef
           FROM st, tri""",

      // link-prediction replay: same wedge-pair counts, same degree
      // frame, one integer division, rank on the rounded score
      "graph_link_predict" ->
        """WITH li AS (
             SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             WHERE l_partkey % 4 = 0
           ), e AS (
             SELECT DISTINCT x.pk AS a, y.pk AS b
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
           ), adj AS (
             SELECT a AS n, b AS nbr FROM e
             UNION ALL SELECT b AS n, a AS nbr FROM e
           ), deg AS (
             SELECT n, count(*) AS d FROM adj GROUP BY n
           ), w AS (
             SELECT x.n AS u, y.n AS v, count(*) AS common
             FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.n < y.n
             GROUP BY 1, 2
           ), cand AS (
             SELECT w.* FROM w WHERE NOT EXISTS (
               SELECT 1 FROM e WHERE e.a = w.u AND e.b = w.v)
           ), sc AS (
             SELECT u, v, common,
               round(common / CAST(du.d + dv.d - common AS DOUBLE), 6)
                 AS jaccard
             FROM cand JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v)
           SELECT u, v, CAST(common AS BIGINT) AS common, jaccard,
             CAST(rank AS INT) AS rank
           FROM (SELECT *, row_number()
               OVER (ORDER BY jaccard DESC, u, v) AS rank FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      // Adamic–Adar replay: per-center 1/ln(deg) terms rounded-6 and
      // 1e6-scaled, summed as order-free integers per pair
      "graph_adamic_adar" ->
        """WITH li AS (
             SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             WHERE l_partkey % 4 = 0
           ), e AS (
             SELECT DISTINCT x.pk AS a, y.pk AS b
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
           ), adj AS (
             SELECT a AS n, b AS nbr FROM e
             UNION ALL SELECT b AS n, a AS nbr FROM e
           ), deg AS (
             SELECT n, count(*) AS d FROM adj GROUP BY n
           ), adjd AS (
             SELECT adj.n, adj.nbr,
               CAST(round(1.0 / ln(CAST(deg.d AS DOUBLE)) * 1000000.0)
                 AS BIGINT) AS t6
             FROM adj JOIN deg ON deg.n = adj.nbr
           ), w AS (
             SELECT x.n AS u, y.n AS v, count(*) AS common,
               CAST(sum(x.t6) AS BIGINT) AS s6
             FROM adjd x JOIN adjd y ON x.nbr = y.nbr AND x.n < y.n
             GROUP BY 1, 2
           ), cand AS (
             SELECT w.* FROM w WHERE NOT EXISTS (
               SELECT 1 FROM e WHERE e.a = w.u AND e.b = w.v)
           ), sc AS (
             SELECT u, v, common,
               round(CAST(s6 AS DOUBLE) / 1000000.0, 6) AS aa_score
             FROM cand)
           SELECT u, v, CAST(common AS BIGINT) AS common, aa_score,
             CAST(rank AS INT) AS rank
           FROM (SELECT *, row_number()
               OVER (ORDER BY aa_score DESC, u, v) AS rank FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      // integer fixed-point PageRank: 10 unrolled rounds of the exact
      // long recurrence (see pageRankFixedSql) — iterative, yet
      // hash-green because every op is order-free integer arithmetic
      "graph_pagerank_fixed" -> pageRankFixedSql(10),

      // integer fixed-point HITS: 8 unrolled (authority, hub) rounds,
      // each phase max-normalized with `//` — order-free integers
      "graph_hits" -> hitsFixedSql(8, 50),

      // weighted and personalized fixed-point twins — same integer
      // portability, weights / seed-teleport replayed in BIGINT
      "graph_pagerank_weighted" -> pageRankFixedWeightedSql(10),
      "graph_ppr" -> pprFixedSql(10),

      // synchronous k-core peeling unrolled past its fixed point
      "graph_kcore" -> kCoreSql(16, 8),

      // synchronous label propagation, 6 unrolled rounds: integer
      // votes + total-order tie-break make the iterative operator
      // hash-green (r10)
      "graph_communities" -> labelPropagationSql(6),

      // BFS replay: the same 6 relaxation rounds, integer hops
      "graph_bfs_distance" -> bfsDistanceSql(6),
      // weighted Bellman-Ford rounds — the same unrolled discipline
      // with affinity-derived integer edge costs
      "graph_sssp_weighted" -> ssspWeightedSql(6),

      // degree assortativity: exact BIGINT sufficient statistics,
      // Pearson evaluated once in double with operands cast FIRST —
      // the identical IEEE expression the Spark side runs
      "graph_assortativity" -> (graphEdgesCte +
        """, p AS (
             SELECT dd.src, d1.deg AS dx, d2.deg AS dy
             FROM dd JOIN dgr d1 ON dd.src = d1.src
               JOIN dgr d2 ON dd.dst = d2.src
           ), st AS (
             SELECT CAST(count(DISTINCT src) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(dx) AS BIGINT) AS sx,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               CAST(sum(dx * dy) AS BIGINT) AS sxy
             FROM p)
           SELECT n AS n_nodes, CAST(m / 2 AS BIGINT) AS n_edges,
             round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS assortativity
           FROM st"""),

      // Holt level+trend recurrence replayed row-by-row: the
      // recursive term restates the level expression inside the trend
      // (same IEEE ops in the same order as the fold)
      "events_holt_winters" ->
        """WITH RECURSIVE e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events
           ), r AS (
             SELECT user_id, event_id, ts, value, rn,
               value AS level, CAST(0.0 AS DOUBLE) AS trend
             FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.event_id, e.ts, e.value, e.rn,
               0.5 * e.value + 0.5 * (r.level + r.trend) AS level,
               0.5 * ((0.5 * e.value + 0.5 * (r.level + r.trend))
                 - r.level) + 0.5 * r.trend AS trend
             FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
           SELECT user_id, event_id, ts, value, level, trend FROM r
           ORDER BY user_id, event_id""",

      // full Holt-Winters (level+trend+seasonal) over per-type hourly
      // volumes: the seasonal ring rides the recursion as 24 columns;
      // the streaming twin must equal the batch fold bit-for-bit
      "events_holt_winters_seasonal" -> holtWintersSeasonalSql(24),
      "stream_holt_winters_seasonal" -> holtWintersSeasonalSql(24),

      // the delete+insert replay: day-1 slice, watermark delta off
      // its max(ts), keys in the delta replaced wholesale
      "incr_model_delete_insert" ->
        """WITH ev AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value FROM events
           ), t0 AS (
             SELECT * FROM ev WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
           ), src AS (
             SELECT user_id, event_id,
               CASE WHEN event_id % 97 = 0
                 THEN ts + INTERVAL 30 DAY ELSE ts END AS ts,
               event_type,
               CASE WHEN event_id % 97 = 0
                 THEN value + 1000.0 ELSE value END AS value
             FROM ev
           ), lastw AS (SELECT max(ts) AS m FROM t0
           ), delta AS (
             SELECT src.* FROM src, lastw WHERE src.ts > lastw.m
           ), final AS (
             SELECT user_id, event_id, ts, event_type, value FROM t0
             WHERE event_id NOT IN (SELECT event_id FROM delta)
             UNION ALL
             SELECT user_id, event_id, ts, event_type, value FROM delta)
           SELECT event_id, ts, user_id, event_type, value
           FROM final ORDER BY event_id""",

      // JS divergence over Laplace-smoothed category shares; the
      // identical (p+q)/2 midpoint and ½p·ln + ½q·ln expression order
      "dq_drift_js" ->
        """WITH ref AS (
             SELECT event_type AS c FROM events
             WHERE event_id % 5 <> 0 AND event_type IS NOT NULL
           ), cur AS (
             SELECT event_type AS c FROM events
             WHERE event_id % 5 = 0 AND event_type IS NOT NULL
           ), cr AS (SELECT c, CAST(count(*) AS BIGINT) AS nr FROM ref GROUP BY c
           ), cc AS (SELECT c, CAST(count(*) AS BIGINT) AS nc FROM cur GROUP BY c
           ), d AS (
             SELECT coalesce(cr.c, cc.c) AS category,
               coalesce(nr, 0) AS n_ref, coalesce(nc, 0) AS n_cur
             FROM cr FULL OUTER JOIN cc ON cr.c = cc.c
           ), f AS (
             SELECT category, n_ref, n_cur,
               CAST(n_ref + 1 AS DOUBLE)
                 / CAST(sum(n_ref) OVER () + count(*) OVER () AS DOUBLE) AS p,
               CAST(n_cur + 1 AS DOUBLE)
                 / CAST(sum(n_cur) OVER () + count(*) OVER () AS DOUBLE) AS q
             FROM d)
           SELECT category, n_ref, n_cur,
             round(p, 6) AS ref_frac, round(q, 6) AS cur_frac,
             round(0.5 * p * ln(p / ((p + q) / 2.0))
               + 0.5 * q * ln(q / ((p + q) / 2.0)), 6) AS js_contrib,
             round(sum(0.5 * p * ln(p / ((p + q) / 2.0))
               + 0.5 * q * ln(q / ((p + q) / 2.0))) OVER (), 6) AS js
           FROM f ORDER BY category""",

      // top-k heavy join keys: exact counts, exact-long cumulative
      // sums, one rounded division per share
      "dq_key_skew" ->
        """WITH c AS (
             SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
             FROM lineitem GROUP BY l_suppkey
           ), t AS (
             SELECT key, n, CAST(row_number() OVER (
               ORDER BY n DESC, key) AS BIGINT) AS rank
             FROM c QUALIFY rank <= 50
           ), tot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lineitem)
           SELECT rank, key, n,
             round(CAST(n AS DOUBLE) / CAST(m AS DOUBLE), 6) AS share,
             round(CAST(sum(n) OVER (ORDER BY n DESC, key
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(m AS DOUBLE), 6) AS cum_share
           FROM t, tot ORDER BY rank""",

      // ordered-subsequence containment via occurrence statistics:
      // (a,b) ⇔ minpos(a) < maxpos(b); (a,b,c) ⇔ some b-position
      // strictly between minpos(a) and maxpos(c) — correct for
      // repeated symbols because positions are distinct integers
      "events_frequent_seqs" ->
        """WITH pos AS MATERIALIZED (
             SELECT user_id AS u, event_type AS t,
               CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS BIGINT) AS p
             FROM events
           ), occ AS MATERIALIZED (
             SELECT u, t, min(p) AS minp, max(p) AS maxp
             FROM pos GROUP BY u, t
           ), nu AS (SELECT count(DISTINCT u) AS n FROM occ
           ), f2 AS MATERIALIZED (
             SELECT a.t AS p1, b.t AS p2, CAST(count(*) AS BIGINT) AS support
             FROM occ a JOIN occ b ON a.u = b.u AND a.minp < b.maxp
             GROUP BY a.t, b.t
             HAVING count(*) >= (SELECT ceil(0.2 * n) FROM nu)
           ), cand AS (
             SELECT x.p1 AS a, x.p2 AS b, y.p2 AS c
             FROM f2 x JOIN f2 y ON x.p2 = y.p1
           ), f3 AS (
             SELECT q.a, q.b, q.c, CAST(count(*) AS BIGINT) AS support
             FROM (
               SELECT oa.u, cand.a, cand.b, cand.c
               FROM occ oa JOIN cand ON oa.t = cand.a
                 JOIN occ oc ON oc.u = oa.u AND oc.t = cand.c
               WHERE EXISTS (
                 SELECT 1 FROM pos pb
                 WHERE pb.u = oa.u AND pb.t = cand.b
                   AND pb.p > oa.minp AND pb.p < oc.maxp)) q
             GROUP BY q.a, q.b, q.c
             HAVING count(*) >= (SELECT ceil(0.2 * n) FROM nu))
           SELECT CAST(2 AS BIGINT) AS len, p1, p2,
             CAST(NULL AS VARCHAR) AS p3, support FROM f2
           UNION ALL
           SELECT CAST(3 AS BIGINT), a, b, c, support FROM f3
           ORDER BY len, p1, p2, p3""",

      // EWMA band recurrence: breach judged against the PRIOR row's
      // state, mean/variance updated after — same op order as the fold
      "events_ewma_band" ->
        """WITH RECURSIVE e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events
           ), r AS (
             SELECT user_id, event_id, ts, value, rn,
               value AS ew_mean, CAST(0.0 AS DOUBLE) AS ew_var,
               false AS breach
             FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.event_id, e.ts, e.value, e.rn,
               0.5 * e.value + 0.5 * r.ew_mean AS ew_mean,
               0.5 * ((e.value - r.ew_mean) * (e.value - r.ew_mean))
                 + 0.5 * r.ew_var AS ew_var,
               (r.ew_var > 0.0 AND
                 abs(e.value - r.ew_mean) > 3.0 * sqrt(r.ew_var)) AS breach
             FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
           SELECT user_id, event_id, ts, value, ew_mean, ew_var, breach
           FROM r ORDER BY user_id, event_id""",

      // Theil-Sen: pairwise slopes over the 200 most-recent points
      // per user (the cap is part of the semantics), median via the
      // same interpolated quantile the MAD oracle grades, round(6)
      "events_theilsen" ->
        """WITH pts AS (
             SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events
             QUALIFY rn <= 200
           ), s AS (
             SELECT a.user_id,
               (b.value - a.value)
                 / (CAST(b.us - a.us AS DOUBLE) / 1000000.0) AS slope
             FROM pts a JOIN pts b
               ON a.user_id = b.user_id AND a.us < b.us
           ), agg AS (
             SELECT user_id, round(quantile_cont(slope, 0.5), 6) + 0.0 AS trend,
               CAST(count(*) AS BIGINT) AS n_pairs
             FROM s GROUP BY user_id
           ), np AS (
             SELECT user_id, CAST(count(*) AS BIGINT) AS n_points
             FROM pts GROUP BY user_id)
           SELECT agg.user_id, np.n_points, agg.n_pairs, agg.trend
           FROM agg JOIN np ON agg.user_id = np.user_id
           ORDER BY agg.user_id""",

      // two-sided CUSUM recurrence: kUp = 125, kDn = 75 pre-folded
      // (one subtraction per step, mirroring the driver-side fold)
      "events_cusum" ->
        """WITH RECURSIVE e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events
           ), r AS (
             SELECT user_id, event_id, ts, value, rn,
               greatest(0.0, 0.0 + (value - 125.0)) AS cusum_pos,
               greatest(0.0, 0.0 + (75.0 - value)) AS cusum_neg
             FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.event_id, e.ts, e.value, e.rn,
               greatest(0.0, r.cusum_pos + (e.value - 125.0)) AS cusum_pos,
               greatest(0.0, r.cusum_neg + (75.0 - e.value)) AS cusum_neg
             FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
           SELECT user_id, event_id, ts, value, cusum_pos, cusum_neg,
             (cusum_pos > 200.0 OR cusum_neg > 200.0) AS breach
           FROM r ORDER BY user_id, event_id""",

      // rank-fraction lookup replay: same pr division, same
      // half-away round, same (value, id)-ordered global sequence
      "quality_quantile_norm" ->
        """WITH g AS (
             SELECT n_chars AS gv,
               row_number() OVER (ORDER BY n_chars, doc_id) AS gi
             FROM documents
           ), n AS (SELECT count(*) AS nn FROM documents
           ), w AS (
             SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS ng
             FROM documents
           ), ix AS (
             SELECT doc_id, source, n_chars,
               1 + CAST(round(
                 (CASE WHEN ng > 1
                   THEN CAST(rn - 1 AS DOUBLE) / CAST(ng - 1 AS DOUBLE)
                   ELSE 0.0 END) * CAST(nn - 1 AS DOUBLE), 0) AS BIGINT)
                 AS gi
             FROM w CROSS JOIN n)
           SELECT doc_id, source, n_chars, g.gv AS norm_value
           FROM ix JOIN g USING (gi) ORDER BY doc_id""",

      // pooled-variance z replay: four integer sums, the same
      // division/sqrt tree
      "ab_proportions" ->
        """WITH u AS (
             SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted,
               user_id % 2 AS variant
             FROM events GROUP BY user_id
           ), s AS (
             SELECT
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_t,
               CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_c
             FROM u
           ), p AS (
             SELECT *, (CAST(conv_t AS DOUBLE) + conv_c)
               / (CAST(n_t AS DOUBLE) + n_c) AS pp
             FROM s)
           SELECT n_t, conv_t, n_c, conv_c,
             round(CAST(conv_t AS DOUBLE) / n_t, 6) AS rate_t,
             round(CAST(conv_c AS DOUBLE) / n_c, 6) AS rate_c,
             round(CASE WHEN pp > 0 AND pp < 1 THEN
               (CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
               / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)))
               END, 6) AS z
           FROM p""",

      // AUC replay: the mannWhitney doubled-rank arithmetic
      // normalized to U/(n+ n-)
      "model_auc" ->
        """WITH u AS (
             SELECT user_id, count(*) AS s,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS y,
               user_id % 2 AS k
             FROM events GROUP BY user_id
           ), rk AS (
             SELECT k, y,
               CAST(2 * (rank() OVER (PARTITION BY k ORDER BY s) - 1)
                 + count(*) OVER (PARTITION BY k, s) + 1 AS BIGINT) AS r2
             FROM u
           ), a AS (
             SELECT k, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
                 AS rp2
             FROM rk GROUP BY 1)
           SELECT k AS cohort, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
             round(CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
               CAST(rp2 - n_pos * (n_pos + 1) AS DOUBLE)
               / (2.0 * CAST(n_pos AS DOUBLE)
                 * CAST(n - n_pos AS DOUBLE)) END, 6) AS auc
           FROM a ORDER BY cohort""",
  )
}
