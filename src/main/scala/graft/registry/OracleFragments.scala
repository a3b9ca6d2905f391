package graft

import graft.operators.Similarity

/** Shared DuckDB SQL fragments and generators for the oracle shards —
  * split out of SparkEntry (r11 verdict ask #8), bodies verbatim. */
private[graft] object OracleFragments {
  /** Splitmix-derived LSH hyperplanes replayed as SQL literals
    * ([[Similarity.planeVec]] verbatim, truncated to the corpus
    * dimension): the LSH/IVF oracles replicate the EXACT bucket and
    * argmin arithmetic, so the candidate sets match bit-for-bit.
    * Safe because the decisions are sign bits / argmins with measured
    * margins ≥3e-6 at sf0.01 and sf0.1 — six orders of magnitude
    * above any cross-engine double-accumulation difference (both
    * engines sum the same 64 doubles in index order).
    */
  /** Shared DuckDB CTE prefix: the pk-sampled co-purchase edge list
    * (mirrors [[coPurchaseEdges]]) plus the symmetric directed form
    * and per-node degrees.
    */
  val graphEdgesCte: String =
    """WITH li AS (
         SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         WHERE l_partkey % 4 = 0
       ), e AS MATERIALIZED (
         SELECT DISTINCT x.pk AS a, y.pk AS b
         FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
       ), dd AS MATERIALIZED (
         SELECT a AS src, b AS dst FROM e
         UNION ALL SELECT b AS src, a AS dst FROM e
       ), dgr AS MATERIALIZED (
         SELECT src, CAST(count(*) AS BIGINT) AS deg FROM dd GROUP BY src
       )"""

  /** Unrolled integer fixed-point PageRank (DuckDB BIGINT `//`
    * replays Spark's `div` exactly; every round is integer-exact and
    * order-free, so the iterative operator hash-grades end to end).
    * Must mirror [[graft.operators.Graph.pageRankFixedPoint]]:
    * scale 1e12, damping 85/100, base = (15·S div 100) div n.
    */
  /** Unrolled integer fixed-point HITS (see [[graft.operators.Graph
    * .hitsFixedPoint]]): per round, authority = in-sum of hub scores
    * then hub = out-sum of authority scores, each phase
    * max-normalized with `//` — order-free integer arithmetic, so
    * the iterative operator hash-greens.
    */
  def hitsFixedSql(iterations: Int, topK: Int): String = {
    val iters = (1 to iterations).map { i =>
      s""", ar$i AS MATERIALIZED (
           SELECT ed.dst AS node, CAST(sum(h.s) AS BIGINT) AS raw
           FROM ed JOIN h${i - 1} h ON ed.src = h.node GROUP BY 1
         ), a$i AS MATERIALIZED (
           SELECT node, CAST((raw * 1000000)
             // (SELECT max(raw) FROM ar$i) AS BIGINT) AS s
           FROM ar$i
         ), hr$i AS MATERIALIZED (
           SELECT ed.src AS node, CAST(sum(a.s) AS BIGINT) AS raw
           FROM ed JOIN a$i a ON ed.dst = a.node GROUP BY 1
         ), h$i AS MATERIALIZED (
           SELECT node, CAST((raw * 1000000)
             // (SELECT max(raw) FROM hr$i) AS BIGINT) AS s
           FROM hr$i)"""
    }.mkString
    s"""WITH ed AS MATERIALIZED (
         SELECT DISTINCT o_custkey AS src, l_partkey AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_partkey % 4 = 0
       ), h0 AS MATERIALIZED (
         SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS s
         FROM ed)""" +
      iters +
      s"""
         SELECT 'hub' AS kind, node, s AS score, CAST(rank AS INT) AS rank
         FROM (SELECT node, s, row_number()
             OVER (ORDER BY s DESC, node) AS rank FROM h$iterations)
         WHERE rank <= $topK
         UNION ALL
         SELECT 'authority' AS kind, node, s AS score,
           CAST(rank AS INT) AS rank
         FROM (SELECT node, s, row_number()
             OVER (ORDER BY s DESC, node) AS rank FROM a$iterations)
         WHERE rank <= $topK
         ORDER BY kind, rank"""
  }

  def pageRankFixedSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s""", r$i AS MATERIALIZED (
           SELECT g.src AS node,
             CAST((150000000000 // nn.n)
               + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
           FROM dgr g CROSS JOIN nn LEFT JOIN (
             SELECT dd.dst, CAST(sum(p.r // dgr.deg) AS BIGINT) AS s
             FROM dd JOIN r${i - 1} p ON dd.src = p.node
               JOIN dgr ON dd.src = dgr.src
             GROUP BY dd.dst) c ON g.src = c.dst)"""
    }.mkString
    graphEdgesCte +
      """, nn AS MATERIALIZED (SELECT count(*) AS n FROM dgr
         ), r0 AS MATERIALIZED (
           SELECT src AS node, CAST(1000000000000 // n AS BIGINT) AS r
           FROM dgr, nn)""" +
      iters +
      s"""
         SELECT node, r AS rank_fp FROM r$iterations
         ORDER BY rank_fp DESC, node LIMIT 100"""
  }

  /** Weighted twin of [[pageRankFixedSql]]: weights = shared-order
    * counts, contributions (r·w) `//` W(src). */
  def pageRankFixedWeightedSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s""", r$i AS MATERIALIZED (
           SELECT g.src AS node,
             CAST((150000000000 // nn.n)
               + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
           FROM wt g CROSS JOIN nn LEFT JOIN (
             SELECT dd.dst, CAST(sum((p.r * dd.w) // wt.tw) AS BIGINT) AS s
             FROM dd JOIN r${i - 1} p ON dd.src = p.node
               JOIN wt ON dd.src = wt.src
             GROUP BY dd.dst) c ON g.src = c.dst)"""
    }.mkString
    """WITH li AS (
         SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         WHERE l_partkey % 4 = 0
       ), e AS MATERIALIZED (
         SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS w
         FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
         GROUP BY x.pk, y.pk
       ), dd AS MATERIALIZED (
         SELECT a AS src, b AS dst, w FROM e
         UNION ALL SELECT b AS src, a AS dst, w FROM e
       ), wt AS MATERIALIZED (
         SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM dd GROUP BY src
       ), nn AS MATERIALIZED (SELECT count(*) AS n FROM wt
       ), r0 AS MATERIALIZED (
         SELECT src AS node, CAST(1000000000000 // n AS BIGINT) AS r
         FROM wt, nn)""" +
      iters +
      s"""
         SELECT node, r AS rank_fp FROM r$iterations
         ORDER BY rank_fp DESC, node LIMIT 100"""
  }

  /** Personalized twin of [[pageRankFixedSql]]: teleport mass only
    * to the pk % 40 == 0 seed nodes. */
  def pprFixedSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s""", r$i AS MATERIALIZED (
           SELECT g.src AS node,
             CAST(CASE WHEN g.src % 40 = 0 THEN 150000000000 // ns.n
                 ELSE 0 END
               + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
           FROM dgr g CROSS JOIN ns LEFT JOIN (
             SELECT dd.dst, CAST(sum(p.r // dgr.deg) AS BIGINT) AS s
             FROM dd JOIN r${i - 1} p ON dd.src = p.node
               JOIN dgr ON dd.src = dgr.src
             GROUP BY dd.dst) c ON g.src = c.dst)"""
    }.mkString
    graphEdgesCte +
      """, ns AS MATERIALIZED (
           SELECT count(*) AS n FROM dgr WHERE src % 40 = 0
         ), r0 AS MATERIALIZED (
           SELECT src AS node,
             CASE WHEN src % 40 = 0 THEN CAST(1000000000000 // n AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS r
           FROM dgr, ns)""" +
      iters +
      s"""
         SELECT node, r AS rank_fp FROM r$iterations
         ORDER BY rank_fp DESC, node LIMIT 100"""
  }

  /** Recursive-CTE replay of [[graft.operators.Recurrence
    * .holtWintersSeasonal]]: the seasonal ring travels through the
    * recursion as `period` columns (s0..s{p-1}), each step updating
    * exactly the current slot's column with the same dyadic IEEE
    * expression the Scala fold evaluates — bit-exact, no rounding.
    * The level expression is textually expanded wherever the fold
    * reads the new level (trend + the slot update): identical
    * expression trees give identical doubles.
    */
  def holtWintersSeasonalSql(period: Int): String = {
    val seed = (0 until period)
      .map(j => s"CAST(0.0 AS DOUBLE) AS s$j").mkString(", ")
    val sPrev = "CASE e.slot " +
      (0 until period).map(j => s"WHEN $j THEN r.s$j").mkString(" ") + " END"
    val lvl = s"(0.5 * (e.x - ($sPrev)) + 0.5 * (r.level + r.trend))"
    val sUpd = (0 until period).map { j =>
      s"CASE WHEN e.slot = $j THEN 0.5 * (e.x - $lvl) + 0.5 * r.s$j " +
        s"ELSE r.s$j END AS s$j"
    }.mkString(",\n             ")
    val sNew = "CASE slot " +
      (0 until period).map(j => s"WHEN $j THEN s$j").mkString(" ") + " END"
    s"""WITH RECURSIVE g AS (
          SELECT event_type,
            date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
            CAST(count(*) AS DOUBLE) AS x
          FROM events GROUP BY event_type,
            date_trunc('hour', CAST(ts AS TIMESTAMP))
        ), e AS (
          SELECT event_type, bucket,
            CAST((epoch(bucket)::BIGINT // 3600) % $period AS INT) AS slot, x,
            row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
          FROM g
        ), r AS (
          SELECT event_type, bucket, slot, x, rn,
            x AS level, CAST(0.0 AS DOUBLE) AS trend, $seed
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.event_type, e.bucket, e.slot, e.x, e.rn,
            $lvl AS level,
            0.5 * ($lvl - r.level) + 0.5 * r.trend AS trend,
            $sUpd
          FROM e JOIN r ON e.event_type = r.event_type AND e.rn = r.rn + 1)
        SELECT event_type, bucket, CAST(slot AS BIGINT) AS slot, x,
          level, trend, $sNew AS seasonal
        FROM r ORDER BY event_type, bucket"""
  }

  /** Unrolled synchronous label propagation mirroring
    * [[graft.operators.Graph.labelPropagation]]: per round each node
    * adopts the most frequent label among its neighbors plus its own
    * current label (the self-vote), ties broken (count desc, label
    * asc) — all-integer votes and a total-order tie-break, so a fixed
    * round count replays exactly (the [[pageRankFixedSql]]
    * discipline applied to community detection). Each round
    * MATERIALIZED: l_i references l_{i-1} twice (edge lookup +
    * self-vote) and plain CTEs inline exponentially.
    */
  /** Unrolled multi-source BFS relaxation rounds — mirrors
    * [[graft.operators.Graph.bfsDistance]]: b0 = the seed∩graph
    * nodes at distance 0, each round one edge relaxation + min.
    */
  /** Unrolled weighted Bellman–Ford rounds (see [[graft.operators
    * .Graph.ssspWeighted]]): the bfsDistanceSql discipline with
    * affinity-derived integer edge costs relaxed per round.
    */
  def ssspWeightedSql(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s""", b$i AS MATERIALIZED (
           SELECT node, min(dist) AS dist FROM (
             SELECT dd.dst AS node, p.dist + dd.w AS dist
             FROM dd JOIN b${i - 1} p ON dd.src = p.node
             UNION ALL SELECT node, dist FROM b${i - 1}) v
           GROUP BY node)"""
    }.mkString
    s"""WITH li AS (
         SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         WHERE l_partkey % 4 = 0
       ), e AS MATERIALIZED (
         SELECT x.pk AS a, y.pk AS b,
           greatest(1, 20 - count(*)) AS w
         FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
         GROUP BY x.pk, y.pk
       ), dd AS MATERIALIZED (
         SELECT a AS src, b AS dst, CAST(w AS BIGINT) AS w FROM e
         UNION ALL SELECT b, a, CAST(w AS BIGINT) FROM e
       ), b0 AS MATERIALIZED (
         SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
         FROM dd WHERE src % 40 = 0)""" +
      iters +
      s"""
         SELECT node, dist FROM b$rounds ORDER BY node"""
  }

  def bfsDistanceSql(maxHops: Int): String = {
    val iters = (1 to maxHops).map { i =>
      s""", b$i AS MATERIALIZED (
           SELECT node, min(dist) AS dist FROM (
             SELECT dd.dst AS node, p.dist + 1 AS dist
             FROM dd JOIN b${i - 1} p ON dd.src = p.node
             UNION ALL SELECT node, dist FROM b${i - 1}) v
           GROUP BY node)"""
    }.mkString
    graphEdgesCte +
      """, b0 AS MATERIALIZED (
           SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
           FROM dd WHERE src % 40 = 0)""" +
      iters +
      s"""
         SELECT node, dist FROM b$maxHops ORDER BY node"""
  }

  /** Unrolled per-doc integer fixed-point PageRank over word
    * adjacency — mirrors [[graft.functions.Text.textRankKeywords]]:
    * the pageRankFixedSql discipline with (doc_id, word) composite
    * nodes and per-doc base mass.
    */
  def textRankSql(iterations: Int, topK: Int): String = {
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    val iters = (1 to iterations).map { i =>
      s""", r$i AS MATERIALIZED (
           SELECT g.doc_id, g.src AS node,
             CAST((150000000000 // g.n)
               + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
           FROM wn g LEFT JOIN (
             SELECT dd.doc_id, dd.dst,
               CAST(sum(p.r // dgr.deg) AS BIGINT) AS s
             FROM dd JOIN r${i - 1} p
               ON dd.doc_id = p.doc_id AND dd.src = p.node
               JOIN dgr ON dd.doc_id = dgr.doc_id AND dd.src = dgr.src
             GROUP BY dd.doc_id, dd.dst) c
             ON g.doc_id = c.doc_id AND g.src = c.dst)"""
    }.mkString
    s"""WITH w AS (
         SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
       ), b0 AS (
         SELECT doc_id,
           unnest([struct_pack(a := ws[i+1], b := ws[i+2])
                   for i in range(0, len(ws) - 1)]) AS bg
         FROM w WHERE len(ws) >= 2
       ), bi AS (
         SELECT doc_id, bg.a AS a, bg.b AS b FROM b0
         WHERE bg.a <> bg.b AND len(bg.a) > 0 AND len(bg.b) > 0
       ), e AS MATERIALIZED (
         SELECT DISTINCT doc_id, least(a, b) AS a, greatest(a, b) AS b
         FROM bi
       ), dd AS MATERIALIZED (
         SELECT doc_id, a AS src, b AS dst FROM e
         UNION ALL SELECT doc_id, b AS src, a AS dst FROM e
       ), dgr AS MATERIALIZED (
         SELECT doc_id, src, CAST(count(*) AS BIGINT) AS deg
         FROM dd GROUP BY 1, 2
       ), nn AS (SELECT doc_id, count(*) AS n FROM dgr GROUP BY 1
       ), wn AS MATERIALIZED (
         SELECT dgr.doc_id, dgr.src, nn.n FROM dgr JOIN nn USING (doc_id)
       ), r0 AS MATERIALIZED (
         SELECT doc_id, src AS node,
           CAST(1000000000000 // n AS BIGINT) AS r
         FROM wn)""" +
      iters +
      s"""
         , ranked AS (
           SELECT doc_id, node, r,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY r DESC, node) AS rk
           FROM r$iterations)
         SELECT doc_id, node AS word, r AS rank_fp,
           CAST(rk AS BIGINT) AS rank
         FROM ranked WHERE rk <= $topK ORDER BY doc_id, rank"""
  }

  def labelPropagationSql(iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s""", l$i AS MATERIALIZED (
           SELECT node, label FROM (
             SELECT node, label,
               row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn
             FROM (
               SELECT node, label, count(*) AS c FROM (
                 SELECT dd.dst AS node, p.label
                 FROM dd JOIN l${i - 1} p ON dd.src = p.node
                 UNION ALL SELECT node, label FROM l${i - 1}) v
               GROUP BY node, label) t) q
           WHERE rn = 1)"""
    }.mkString
    graphEdgesCte +
      """, l0 AS MATERIALIZED (
           SELECT DISTINCT src AS node, src AS label FROM dd)""" +
      iters +
      s"""
         SELECT node, label FROM l$iterations ORDER BY node"""
  }

  /** Unrolled synchronous k-core peeling: the surviving node set
    * shrinks monotonically, so once the fixed point is reached the
    * remaining unrolled rounds are idempotent — `peels` just needs to
    * be ≥ the convergence depth at the graded SFs (≤ 3 measured; 8
    * gives margin). Mirrors [[graft.operators.Graph.kCore]].
    */
  def kCoreSql(k: Int, peels: Int): String = {
    // each peel level MATERIALIZED: a plain CTE is inlined at every
    // reference, and e_i references n_{i-1} twice — unrolled peels
    // would otherwise expand exponentially (fd exhaustion observed)
    val iters = (1 to peels).map { i =>
      s""", e$i AS MATERIALIZED (
           SELECT e.a, e.b FROM e
           WHERE e.a IN (SELECT n FROM n${i - 1})
             AND e.b IN (SELECT n FROM n${i - 1})
         ), n$i AS MATERIALIZED (
           SELECT n FROM (
             SELECT a AS n FROM e$i UNION ALL SELECT b AS n FROM e$i)
           GROUP BY n HAVING count(*) >= $k)"""
    }.mkString
    graphEdgesCte +
      """, n0 AS MATERIALIZED (SELECT a AS n FROM e UNION SELECT b AS n FROM e)""" +
      iters +
      s"""
         , core AS (
           SELECT e.a, e.b FROM e
           WHERE e.a IN (SELECT n FROM n$peels)
             AND e.b IN (SELECT n FROM n$peels))
         SELECT n AS node, CAST(count(*) AS BIGINT) AS core_deg
         FROM (SELECT a AS n FROM core UNION ALL SELECT b AS n FROM core)
         GROUP BY n ORDER BY node"""
  }

  def lshBucketsCte(tables: Int, planes: Int): String = {
    val rows = (0 until tables).flatMap { t =>
      (0 until planes).map { p =>
        s"($t, $p, [${Similarity.planeVec(t, p, 64).mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n             ")
    s"""planes(t, p, pv) AS (VALUES $rows),
           e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           dots AS (
             SELECT e.vec_id, pl.t, pl.p,
               list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * pl.pv[i])) AS d
             FROM e, planes pl),
           b AS (
             SELECT vec_id, t,
               CAST(sum(CASE WHEN d >= 0 THEN 1::BIGINT << p ELSE 0 END) AS BIGINT) AS bucket
             FROM dots GROUP BY vec_id, t)"""
  }

  /** Spark's `xxhash64(idCol, lit(seed))` on a LONG key, replayed in
    * DuckDB: `hashLong(seedLit, hashLong(id, 42))` (the xxhash64
    * FUNCTION seeds at 42 and left-folds each argument through
    * XXH64.hashLong). All arithmetic is mod-2^64 over HUGEINT —
    * 64×64-bit products are split into 32-bit halves so partials stay
    * under INT128 — with xor via UBIGINT. Emitted as a step-per-column
    * subquery chain producing `(idCol..., h)`; verified bit-exact
    * against Spark for the graded key domain.
    */
  def xxhash64ChainSql(base: String, hashInputs: Seq[String],
                               outCols: Seq[String]): String = {
    val M = "18446744073709551616::HUGEINT"
    def mulmod(x: String, p: String) =
      s"((($x) % 4294967296::HUGEINT) * $p " +
        s"+ (((($x) // 4294967296::HUGEINT) * $p) % 4294967296::HUGEINT) " +
        s"* 4294967296::HUGEINT) % $M"
    def rotl(x: String, r: Int) =
      s"((($x) * ${1L << r}::HUGEINT) % $M + (($x) // ${1L << (64 - r)}::HUGEINT))"
    def xor(a: String, b: String) = s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"
    val (p1, p2, p3, p4, p5) = (
      "11400714785074694791::HUGEINT", "14029467366897019727::HUGEINT",
      "1609587929392839161::HUGEINT", "9650029242287828579::HUGEINT",
      "2870177450012600261::HUGEINT")
    def hashLong(inp: String, seed: String, x: String) = Seq(
      s"${x}_h0" -> s"(($seed) + $p5 + 8::HUGEINT) % $M",
      s"${x}_k1" -> mulmod(inp, p2),
      s"${x}_k1r" -> rotl(s"${x}_k1", 31),
      s"${x}_k1p" -> mulmod(s"${x}_k1r", p1),
      s"${x}_h1" -> xor(s"${x}_h0", s"${x}_k1p"),
      s"${x}_h2" -> s"(${mulmod(rotl(s"${x}_h1", 27), p1)} + $p4) % $M",
      s"${x}_f1" -> xor(s"${x}_h2", s"${x}_h2 // 8589934592::HUGEINT"),
      s"${x}_f2" -> mulmod(s"${x}_f1", p2),
      s"${x}_f3" -> xor(s"${x}_f2", s"${x}_f2 // 536870912::HUGEINT"),
      s"${x}_f4" -> mulmod(s"${x}_f3", p3),
      s"${x}_out" -> xor(s"${x}_f4", s"${x}_f4 // 4294967296::HUGEINT"))
    // negative keys reinterpret as their unsigned 64-bit pattern
    def uid(e: String) =
      s"(CASE WHEN ($e) < 0 THEN ($e)::HUGEINT + $M ELSE ($e)::HUGEINT END)"
    // fold left-to-right, each value's hash seeding the next — the
    // XXH64.hashLong chain Spark's multi-arg xxhash64(...) runs
    val steps = hashInputs.zipWithIndex.flatMap { case (e, i) =>
      hashLong(uid(e), if (i == 0) "42::HUGEINT" else s"x${i - 1}_out", s"x$i")
    }
    val last = s"x${hashInputs.size - 1}_out"
    val chained = steps.foldLeft(base) { case (sql, (n, e)) =>
      s"SELECT *, $e AS $n FROM ($sql)"
    }
    s"""SELECT ${outCols.mkString(", ")},
          CASE WHEN $last >= 9223372036854775808::HUGEINT
          THEN ($last - $M)::BIGINT ELSE $last::BIGINT END AS h
        FROM ($chained)"""
  }

  def xxhash64LongSql(base: String, idCol: String, seedLit: Long,
                              keep: Seq[String] = Nil): String =
    xxhash64ChainSql(base, Seq(idCol, seedLit.toString), idCol +: keep)

  /** Single-argument `xxhash64(col)` replay (seed 42, one fold step). */
  def xxhash64Long1Sql(base: String, idCol: String,
                               keep: Seq[String] = Nil): String =
    xxhash64ChainSql(base, Seq(idCol), idCol +: keep)

  /** `Text.portableHash60` replayed in DuckDB: both engines md5 the
    * same UTF-8 bytes, and the 15-hex-digit slice parses identically.
    */
  def md5Hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** The md5-twin SimHash pipeline as DuckDB SQL (n=3, hamming ≤ 3,
    * 4×16-bit blocks). `pairWhere` narrows the candidate join.
    */
  def simhashMd5Sql(pairWhere: String): String =
    s"""WITH gd AS (
         SELECT doc_id, unnest(grams) AS gram
         FROM (${gramsSql(3, distinct = true)})
       ), h0 AS (
         SELECT doc_id, ${md5Hash60Sql("gram")} AS hv FROM gd
       ), n AS (
         SELECT doc_id, count(*) AS nsh FROM gd GROUP BY doc_id
       ), v AS (
         SELECT doc_id, b, CAST(sum((hv >> b) & 1) AS BIGINT) AS votes
         FROM h0 CROSS JOIN range(60) t(b) GROUP BY doc_id, b
       ), sig AS (
         SELECT v.doc_id,
           CAST(sum(CASE WHEN 2 * votes > nsh
             THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         FROM v JOIN n ON n.doc_id = v.doc_id GROUP BY v.doc_id
       ), blocked AS (
         SELECT doc_id, simhash, blk,
           (simhash >> (blk * 16)) & 65535 AS blkval
         FROM sig CROSS JOIN range(4) t(blk))
       SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         bit_count(xor(a.simhash, c.simhash)) AS hamming
       FROM blocked a JOIN blocked c
         ON a.blk = c.blk AND a.blkval = c.blkval AND a.doc_id < c.doc_id
            $pairWhere
       WHERE bit_count(xor(a.simhash, c.simhash)) <= 3
       ORDER BY id_a, id_b"""

  /** The md5-twin MinHash-LSH pipeline as DuckDB SQL (n=3, 32 hashes,
    * 16 bands, threshold 0.5). `pairWhere` narrows the candidate join
    * (the incremental twin restricts to batch-touching pairs).
    */
  /** The IVF top-k replay shared by [[ann_ivf_topk]] and its
    * incremental-index twin (identical result sets by construction:
    * frozen centroids, per-row assignment).
    */
  val ivfTopkOracleSql: String =
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           cent AS (SELECT vec_id AS cell, v AS cv,
                      list_sum(list_transform(v, x -> x * x)) AS cc
                    FROM e WHERE vec_id < 16),
           ad AS (
             SELECT e.vec_id, c.cell,
               -2 * list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i])) + c.cc AS dist
             FROM e, cent c),
           assigned AS (
             SELECT vec_id, cell FROM (
               SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS r FROM ad)
             WHERE r = 1),
           probes AS (
             SELECT vec_id AS query_id, cell FROM (
               SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS r
               FROM ad WHERE vec_id < 5)
             WHERE r <= 4),
           scored AS (
             SELECT p.query_id, a.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * q.v[i]))
               / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.v, x -> x * x)))) AS cosine
             FROM assigned a JOIN probes p USING (cell)
               JOIN e c ON a.vec_id = c.vec_id
               JOIN e q ON p.query_id = q.vec_id
             WHERE a.vec_id <> p.query_id)
           SELECT query_id, neighbor_id, cosine, rn AS rank FROM (
             SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn FROM scored)
           WHERE rn <= 10 ORDER BY query_id, rank"""

  /** The k-NN vote replay shared by [[ann_knn_label]] and its
    * streaming door twin (identical by construction: static seed
    * corpus, per-row vote).
    */
  val knnLabelOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id,
               CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
             WHERE vec_id % 50 = 0),
           c AS (SELECT vec_id AS neighbor_id, label,
               CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
             WHERE vec_id % 50 <> 0),
           scored AS (
             SELECT query_id, neighbor_id, label,
               list_sum(list_transform(generate_series(1, len(cv)),
                 i -> cv[i] * qv[i]))
               / (sqrt(list_sum(list_transform(cv, x -> x * x)))
                  * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cosine
             FROM c, q),
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
           WHERE rn = 1 ORDER BY vec_id"""

  /** The additive-decomposition core shared by
    * [[events_seasonal_decompose]] and the STL-anomaly screen: per
    * event_type hourly counts, centered 25-point MA trend, grand-
    * mean-centered hour-of-day seasonal means — integer sums
    * throughout, single divisions at the end.
    */
  def seasonalDecomposeCoreSql: String =
    """WITH g AS (
         SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
           count(*) AS v
         FROM events GROUP BY 1, 2
       ), t AS (
         SELECT event_type, hr, v, extract(hour FROM hr) AS s,
           sum(v) OVER (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tsum,
           count(*) OVER (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS wcnt
         FROM g
       ), i AS (
         SELECT * , 25 * v - tsum AS detr FROM t WHERE wcnt = 25
       ), f AS (
         SELECT event_type, hr, v, tsum,
           sum(detr) OVER (PARTITION BY event_type, s) AS ssum,
           count(*) OVER (PARTITION BY event_type, s) AS sn,
           sum(detr) OVER (PARTITION BY event_type) AS gsum,
           count(*) OVER (PARTITION BY event_type) AS gn
         FROM i)
       SELECT event_type, hr, CAST(v AS BIGINT) AS value,
         round(tsum / 25.0, 6) AS trend,
         round(ssum / (25.0 * sn) - gsum / (25.0 * gn), 6) AS seasonal,
         round(v - tsum / 25.0
           - (ssum / (25.0 * sn) - gsum / (25.0 * gn)), 6) AS resid
       FROM f"""

  /** Full-log gap sessionization, shared by [[events_sessions]] and
    * the incremental fold (whose untouched-carry + touched-replay
    * union is row-identical to the full recompute).
    */
  def sessionsOracleSql: String =
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
         FROM flagged)
       SELECT user_id, session_seq,
         min(ts) AS session_start, max(ts) AS session_end,
         date_diff('second', min(ts), max(ts)) AS duration_sec,
         count(*) AS n_events
       FROM numbered GROUP BY user_id, session_seq
       ORDER BY user_id, session_seq"""

  /** The phrase-search replay shared by [[doc_phrase_search]] and its
    * maintained-index twin: every char offset of the space-padded
    * normalized text is probed for ' table table ' (overlapping
    * matches INCLUDED — the semantics the positional intersect
    * implements), and the token index of a match is the space count
    * up to its leading space.
    */
  def phraseSearchOracleSql: String =
    """WITH d AS (
         SELECT doc_id,
           ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' ' AS p
         FROM documents
       ), m AS (
         SELECT doc_id, i.gs AS cpos, p FROM d,
           LATERAL (SELECT unnest(generate_series(1, length(p))) AS gs) i
         WHERE substr(p, i.gs, 13) = ' table table '
       )
       SELECT doc_id, count(*) AS n_matches,
         min(length(substr(p, 1, cpos))
             - length(replace(substr(p, 1, cpos), ' ', ''))) AS first_pos
       FROM m GROUP BY doc_id ORDER BY doc_id"""

  /** The BM25 top-k replay shared by [[corpus_bm25_topk]] and its
    * maintained-index twin (identical by construction: same per-doc
    * tf/len rows, same stats, same fixed-order scoring).
    */
  def bm25TopkOracleSql: String = {
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents
           ), f AS (
             SELECT doc_id, term FROM w WHERE length(term) > 0
           ), d AS (
             SELECT doc_id, count(*) AS len,
               CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_0,
               CAST(sum(CASE WHEN term = 'hash'  THEN 1 ELSE 0 END) AS BIGINT) AS tf_1,
               CAST(sum(CASE WHEN term = 'join'  THEN 1 ELSE 0 END) AS BIGINT) AS tf_2
             FROM f GROUP BY doc_id
           ), g AS (
             SELECT CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               CAST(count(*) AS DOUBLE) AS nd,
               CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
               CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
               CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
             FROM d
           ), s AS (
             SELECT doc_id, round(
               (CASE WHEN tf_0 > 0 THEN ln((nd - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
                 * (tf_0 * 2.2) / (tf_0 + 1.2 * (0.25 + 0.75 * len / avgdl))
                 ELSE 0.0 END)
               + (CASE WHEN tf_1 > 0 THEN ln((nd - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
                 * (tf_1 * 2.2) / (tf_1 + 1.2 * (0.25 + 0.75 * len / avgdl))
                 ELSE 0.0 END)
               + (CASE WHEN tf_2 > 0 THEN ln((nd - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
                 * (tf_2 * 2.2) / (tf_2 + 1.2 * (0.25 + 0.75 * len / avgdl))
                 ELSE 0.0 END), 6) AS score
             FROM d, g WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0)
           SELECT doc_id, score, rank FROM (
             SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM s)
           WHERE rank <= 50 ORDER BY rank"""
  }

  /** Debounce replay shared by the batch fold and its streaming
    * twin: the survivor chain as a recursive CTE — each kept row's
    * successor is the minimal-rn event ≥ gap after it (sec is
    * non-decreasing in rn, so this IS the fold).
    */
  // shared by events_funnel and its streaming twin (stream_funnel's
  // max-version current view must equal the batch fold exactly)
  def funnelOracleSql: String =
    """WITH f AS (
         SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type IN ('view', 'click', 'purchase')
       ), s1 AS (
         SELECT user_id, min(ts) AS t1 FROM f
         WHERE event_type = 'view' GROUP BY user_id
       ), s2 AS (
         SELECT f.user_id, min(ts) AS t2 FROM f JOIN s1 USING (user_id)
         WHERE event_type = 'click' AND ts > t1 GROUP BY f.user_id
       ), s3 AS (
         SELECT f.user_id, min(ts) AS t3 FROM f JOIN s2 USING (user_id)
         WHERE event_type = 'purchase' AND ts > t2 GROUP BY f.user_id
       ), u AS (SELECT DISTINCT user_id FROM f)
       SELECT u.user_id,
         CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
         t1 AS t_first,
         coalesce(t3, t2, t1) AS t_last
       FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
              LEFT JOIN s3 USING (user_id)
       ORDER BY u.user_id"""

  def debounceOracleSql: String =
    """WITH RECURSIVE e AS (
         SELECT user_id AS k, event_id AS id, CAST(ts AS TIMESTAMP) AS ts,
           date_diff('second', TIMESTAMP '1970-01-01',
             CAST(ts AS TIMESTAMP)) AS sec,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rn
         FROM events
       ), kept(k, rn, sec) AS (
         SELECT k, rn, sec FROM e WHERE rn = 1
         UNION
         SELECT n.k, n.rn, n.sec
         FROM kept kp JOIN e n ON n.k = kp.k AND n.rn > kp.rn
           AND n.sec - kp.sec >= 21600
         WHERE NOT EXISTS (
           SELECT 1 FROM e m
           WHERE m.k = kp.k AND m.rn > kp.rn
             AND m.sec - kp.sec >= 21600 AND m.rn < n.rn)
       )
       SELECT e.k AS user_id, e.id AS event_id, e.ts
       FROM kept JOIN e ON kept.k = e.k AND kept.rn = e.rn
       ORDER BY user_id, ts, event_id"""

  /** nDCG replay: the full [[bm25TopkOracleSql]] ranking as a
    * subquery, graded distinct-term-overlap relevance, the identical
    * gain tree per position rounded-6/1e6-scaled/integer-summed.
    */
  def ndcgOracleSql: String = {
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    s"""WITH topk AS (SELECT * FROM ($bm25TopkOracleSql)
           ), rel AS (
             SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS rel
             FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
                   FROM documents)
             WHERE length(term) > 0 AND term IN ('spark', 'hash', 'join')
             GROUP BY doc_id
           ), j AS (
             SELECT t.rank, r.rel,
               row_number() OVER (ORDER BY r.rel DESC, t.rank) AS irank
             FROM topk t JOIN rel r USING (doc_id)
           ), terms AS (
             SELECT
               CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
                 / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))
                 * 1000000.0) AS BIGINT) AS d6,
               CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
                 / (ln(CAST(irank AS DOUBLE) + 1.0) / ln(2.0))
                 * 1000000.0) AS BIGINT) AS i6
             FROM j)
           SELECT CAST(count(*) AS BIGINT) AS n_ranked,
             CAST(coalesce(sum(d6), 0) AS DOUBLE) / 1000000.0 AS dcg,
             CAST(coalesce(sum(i6), 0) AS DOUBLE) / 1000000.0 AS idcg,
             round(CASE WHEN coalesce(sum(i6), 0) > 0 THEN
               CAST(sum(d6) AS DOUBLE) / CAST(sum(i6) AS DOUBLE) END, 6)
               AS ndcg
           FROM terms"""
  }

  /** MRR/AP replay: the [[bm25TopkOracleSql]] ranking, strict-AND
    * binary relevance (every query term present), cumulative
    * precision terms r6-scaled and integer-summed, corpus-wide AP
    * denominator min(R, 50).
    */
  def mapMrrOracleSql: String = {
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    s"""WITH topk AS (SELECT * FROM ($bm25TopkOracleSql)
           ), rel AS (
             SELECT doc_id FROM (
               SELECT doc_id, unnest(string_split($norm, ' ')) AS term
               FROM documents)
             WHERE length(term) > 0 AND term IN ('spark', 'hash', 'join')
             GROUP BY doc_id HAVING count(DISTINCT term) = 3
           ), fl AS (
             SELECT t.rank,
               CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS rel
             FROM topk t LEFT JOIN rel r USING (doc_id)
           ), cum AS (
             SELECT rank, rel, sum(rel) OVER (ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel
             FROM fl
           ), ag AS (
             SELECT CAST(count(*) AS BIGINT) AS n_ranked,
               CAST(coalesce(sum(rel), 0) AS BIGINT) AS n_rel_retrieved,
               CAST(min(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
                 AS first_rel_rank,
               CAST(coalesce(sum(CASE WHEN rel = 1 THEN
                 CAST(round(CAST(cumrel AS DOUBLE) / CAST(rank AS DOUBLE)
                   * 1000000.0) AS BIGINT) END), 0) AS BIGINT) AS ap6
             FROM cum
           ), rl AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel)
         SELECT ag.n_ranked, rl.n_relevant, ag.n_rel_retrieved,
           ag.first_rel_rank,
           round(CASE WHEN first_rel_rank IS NOT NULL THEN
             1.0 / CAST(first_rel_rank AS DOUBLE) END, 6) AS mrr,
           round(CASE WHEN least(rl.n_relevant, 50) > 0 THEN
             (CAST(ap6 AS DOUBLE) / 1000000.0)
               / CAST(least(rl.n_relevant, 50) AS DOUBLE) END, 6) AS ap
         FROM ag CROSS JOIN rl"""
  }

  def minhashMd5Sql(pairWhere: String): String =
    s"""WITH gd AS (
         SELECT doc_id, unnest(grams) AS gram
         FROM (${gramsSql(3, distinct = true)})
       ), h0 AS (
         SELECT doc_id, ${md5Hash60Sql("gram")} AS hv FROM gd
       ), hx AS (${xxhash64Long1Sql("SELECT doc_id, hv FROM h0", "hv",
                                    keep = Seq("doc_id"))}
       ), km AS (
         SELECT doc_id, hv % 72057594037927936 AS h1,
           ((h % 72057594037927936) + 72057594037927936)
             % 72057594037927936 AS h2
         FROM hx
       ), sig AS (
         SELECT doc_id, i, min(h1 + h2 * i) AS s
         FROM km CROSS JOIN range(32) t(i) GROUP BY doc_id, i
       ), sigl AS (
         SELECT doc_id, list(s ORDER BY i) AS sg FROM sig GROUP BY doc_id
       ), banded AS (
         SELECT doc_id, b, sg[2*b+1] AS s0, sg[2*b+2] AS s1
         FROM sigl CROSS JOIN range(16) t(b)
       ), cand AS (
         SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         FROM banded a JOIN banded c
           ON a.b = c.b AND a.s0 = c.s0 AND a.s1 = c.s1
              AND a.doc_id < c.doc_id $pairWhere
       ), sizes AS (
         SELECT doc_id, count(*) AS nsh FROM gd GROUP BY doc_id
       ), cmn AS (
         SELECT p.id_a, p.id_b, count(*) AS common
         FROM cand p
           JOIN gd ga ON ga.doc_id = p.id_a
           JOIN gd gb ON gb.doc_id = p.id_b AND gb.gram = ga.gram
         GROUP BY p.id_a, p.id_b)
       SELECT id_a, id_b, jaccard FROM (
         SELECT c.id_a, c.id_b,
           CAST(c.common AS DOUBLE)
             / CAST(sa.nsh + sb.nsh - c.common AS DOUBLE) AS jaccard
         FROM cmn c JOIN sizes sa ON sa.doc_id = c.id_a
                    JOIN sizes sb ON sb.doc_id = c.id_b)
       WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""

  /** `Text.shingles` (distinct=true) / `shinglesWithDuplicates`
    * (distinct=false) replayed in DuckDB: normalized text → space
    * split → word n-grams (short texts collapse to one whole-text
    * gram, exactly as the Spark side). Emits `(doc_id, grams)`.
    */
  def gramsSql(n: Int, distinct: Boolean): String = {
    val grams =
      s"""CASE WHEN len(ws) < $n THEN [array_to_string(ws, ' ')]
          ELSE [array_to_string(ws[i+1:i+$n], ' ')
                for i in range(0, len(ws) - $n + 1)] END"""
    val sel = if (distinct) s"list_distinct($grams)" else grams
    s"""SELECT doc_id, $sel AS grams FROM (
          SELECT doc_id,
            string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
          FROM documents)"""
  }

  /** `Text.winnow(k, w, portableHash60)` replayed in DuckDB: hash the
    * k-gram sequence, slide the w-window min, distinct-sort. Emits
    * `(doc_id, sel LIST<BIGINT>)`.
    */
  def winnowSql(k: Int, w: Int): String =
    s"""SELECT doc_id,
          list_sort(list_distinct(
            CASE WHEN len(hs) <= $w THEN [list_min(hs)]
            ELSE [list_min(hs[i:i+${w - 1}])
                  for i in range(1, len(hs) - $w + 2)] END)) AS sel
        FROM (
          SELECT doc_id, [${md5Hash60Sql("x")} for x in grams] AS hs
          FROM (${gramsSql(k, distinct = false)}))"""

  /** [[graft.functions.Url.partsPattern]] VERBATIM — RE2-compatible
    * on purpose so both engines parse URLs identically.
    */
  val urlPat: String =
    """'^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$'"""

  /** [[graft.functions.Url.synthesize]] replayed: the deterministic
    * messy-URL fixture from (source, doc_id).
    */
  val urlRawSql: String =
    """(CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https'
          ELSE 'hTTpS' END)
       || '://'
       || (CASE doc_id % 4 WHEN 0 THEN 'WWW.' WHEN 3 THEN 'WwW.'
             ELSE 'www.' END)
       || source
       || (CASE WHEN doc_id % 4 = 0 THEN '.EXAMPLE.com'
             ELSE '.example.com' END)
       || (CASE WHEN doc_id % 5 <= 1 THEN ':443'
             WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END)
       || '/Docs/' || CAST(doc_id % 7 AS VARCHAR)
       || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
       || (CASE doc_id % 11
             WHEN 0 THEN '?utm_source=feed&b=2&a=1'
             WHEN 1 THEN '?b=2&a=1'
             WHEN 2 THEN '?a=1&b=2'
             WHEN 3 THEN '?a=1&utm_campaign=x&b=2'
             WHEN 4 THEN ''
             WHEN 5 THEN '?fbclid=abc'
             WHEN 6 THEN '?gclid=g12&utm_medium=m'
             WHEN 7 THEN '?ref=home'
             WHEN 8 THEN '?id=7'
             WHEN 9 THEN '?id=7&utm_term=t'
             ELSE '?igshid=ii&id=7' END)
       || (CASE WHEN doc_id % 3 = 0 THEN '#Section2' ELSE '' END)"""

  /** [[graft.functions.Url.canonicalize]] rules 1-7 replayed over the
    * synthesized fixture. Emits `(doc_id, url_raw, url_canon,
    * domain)` over `documents`.
    */
  val urlCanonSql: String =
    s"""SELECT doc_id, url_raw,
          scheme || '://' || host || port || path ||
            (CASE WHEN rq = '' OR sq = '' THEN '' ELSE '?' || sq END)
            AS url_canon,
          regexp_replace(host, '^www\\.', '') AS domain
        FROM (
          SELECT doc_id, url_raw, scheme, host, rq,
            CASE WHEN rp = '' THEN ''
                 WHEN scheme = 'https' AND rp = ':443' THEN ''
                 WHEN scheme = 'http' AND rp = ':80' THEN ''
                 ELSE rp END AS port,
            CASE WHEN rpath = '' THEN '/'
                 WHEN length(rpath) > 1 AND rpath LIKE '%/'
                   THEN substr(rpath, 1, length(rpath) - 1)
                 ELSE rpath END AS path,
            coalesce(array_to_string(list_sort(list_filter(
              string_split(regexp_replace(rq, '^\\?', ''), '&'),
              kv -> NOT (starts_with(kv, 'utm_')
                OR string_split(kv, '=')[1] IN
                  ('fbclid','gclid','ref','mc_cid','mc_eid','igshid')
                OR kv = ''))), '&'), '') AS sq
          FROM (
            SELECT doc_id, url_raw,
              lower(regexp_extract(url_raw, $urlPat, 1)) AS scheme,
              lower(regexp_extract(url_raw, $urlPat, 2)) AS host,
              regexp_extract(url_raw, $urlPat, 3) AS rp,
              regexp_extract(url_raw, $urlPat, 4) AS rpath,
              regexp_extract(url_raw, $urlPat, 5) AS rq
            FROM (SELECT doc_id, $urlRawSql AS url_raw
                  FROM documents)))"""

    // shared SQL fragments (DuckDB dialect)
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    val nWordsSql =
      """CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END"""
    def stopHits(words: String, list: Seq[String]): String =
      s"CAST(len(list_filter($words, w -> w IN (${list.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"

    // the lang-ID replay shared by doc_lang_id and lang_id_confusion:
    // per-language stopword hit counts → argmax with und fallback
    val langScores = Seq(
      "en" -> functions.Text.StopwordsEn, "fr" -> functions.Text.StopwordsFr,
      "de" -> functions.Text.StopwordsDe, "es" -> functions.Text.StopwordsEs,
      "zh" -> functions.Text.StopwordsZh)
    val langPredCaseSql = "CASE " + langScores.map { case (l, _) =>
      s"WHEN hits_$l > 0 AND hits_$l = best THEN '$l'" }.mkString(" ") +
      " ELSE 'und' END"
    val langPredBaseSql = {
      val hitCols = langScores.map { case (l, ws) =>
        s"${stopHits("words", ws)} AS hits_$l" }.mkString(", ")
      val bestExpr = langScores.map { case (l, _) => s"hits_$l" }.mkString(", ")
      s"""SELECT doc_id, $bestExpr, greatest($bestExpr) AS best FROM (
            SELECT doc_id, $hitCols FROM (
              SELECT doc_id, string_split($norm, ' ') AS words FROM documents))"""
    }
}
