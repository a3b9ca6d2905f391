package graft

import graft.operators._
import graft.pipeline.{Analytics, Dag, DayReplay, IncrementalModel, Models, Schedule}
import graft.sources.SchemaEvolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.EntryHelpers._

/** Query-registry shard 3/5 — split out of the 11k-line
  * SparkEntry (r11 verdict ask #8). Entries are VERBATIM (wave order
  * preserved); [[SparkEntry.queries]] composes the shards. */
private[graft] object QueriesShard3 {
  val m: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_history" -> ((s, d) =>
      Scd2.historyFromLog(eventCols(Tables.events(s, d)),
          Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))),
    "scd2_current" -> ((s, d) =>
      Scd2.currentRows(
          Scd2.historyFromLog(eventCols(Tables.events(s, d)),
            Seq("user_id"), "ts", Seq("event_id")))
        .select(col("user_id"), col("event_id"), col("event_type"), col("valid_from"))
        .orderBy(col("user_id"))),
    // point-in-time view: each user's row version valid AT the cutoff
    "scd2_asof" -> ((s, d) =>
      Scd2.asOf(
          Scd2.historyFromLog(eventCols(Tables.events(s, d)),
            Seq("user_id"), "ts", Seq("event_id")),
          lit(CdcCutoff).cast("timestamp"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"))
        .orderBy(col("user_id"))),
    // dbt source-freshness: lag of newest event vs a fixed as-of
    "dq_freshness" -> ((s, d) =>
      Quality.freshness(Tables.events(s, d), "ts",
        lit("2024-04-01 00:00:00").cast("timestamp"),
        warnAfterSec = 3600L, errorAfterSec = 30L * 86400L)),
    // per-day volume z-scores from exact integer moments (r7): the
    // "did yesterday's load look normal" monitor
    "dq_volume_anomaly" -> ((s, d) =>
      Quality.volumeAnomaly(Tables.events(s, d), "ts", zThreshold = 3.0)
        .orderBy(col("bucket_ts"))),

    // seasonal-naive hourly anomaly screen (r9): each hour vs the
    // trailing 7 same-hour-of-day observations on a zero-filled grid
    "dq_seasonal_anomaly" -> ((s, d) =>
      Quality.seasonalAnomaly(Tables.events(s, d), "ts", zThreshold = 2.0)
        .orderBy(col("bucket_ts"))),

    // ---- soft delete (§2.1) ----
    // staging model CARRIES the soft-delete marker (reference
    // stg_savings_transaction.sql:21 selects deleted_at through)...
    "stg_event_log" -> ((s, d) => Models.stgEventLog(s, d).orderBy(col("event_id"))),
    // ...and downstream models read only live rows (deleted_at IS NULL)
    "stg_soft_delete" -> ((s, d) => Models.stgEventLogActive(s, d).orderBy(col("event_id"))),

    // ---- SCD2 snapshot merge (§2.1; reference users_snapshot.sql) ----
    // two synthetic snapshots of customer: t1 changes market_segment
    // for custkey%10==0 and omits custkey%7==0 (those stay open —
    // dbt's invalidate_hard_deletes=false default)
    "scd2_merge" -> ((s, d) => {
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val s1 = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val history0 = s1.withColumn(Scd2.ValidFrom, t0)
        .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
      val s2 = s1.filter(col("customer_id") % 7 =!= 0)
        .withColumn("market_segment",
          when(col("customer_id") % 10 === 0, lit("CHANGED"))
            .otherwise(col("market_segment")))
      Scd2.merge(history0, s2, Seq("customer_id"),
          Seq("customer_name", "account_balance", "market_segment"), t1)
        .orderBy(col("customer_id"), col("valid_from"))
    }),

    // hash-diff SCD2 (r8 wave 3): change detection via ONE stored md5
    // row fingerprint instead of the column-list compare — merges on
    // `row_hash` must equal the check-strategy merge; the oracle
    // recomputes the md5 chain in DuckDB
    "scd2_merge_hashdiff" -> ((s, d) => {
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val s1 = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val h = Scd2.rowHash(Seq(col("customer_name"),
        col("account_balance").cast("decimal(12,2)"), col("market_segment")))
      val history0 = s1.withColumn("row_hash", h)
        .withColumn(Scd2.ValidFrom, t0)
        .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
      val s2 = s1.filter(col("customer_id") % 7 =!= 0)
        .withColumn("market_segment",
          when(col("customer_id") % 10 === 0, lit("CHANGED"))
            .otherwise(col("market_segment")))
        .withColumn("row_hash", h)
      Scd2.merge(history0, s2, Seq("customer_id"), Seq("row_hash"), t1)
        .orderBy(col("customer_id"), col("valid_from"))
    }),

    // source↔target reconciliation audit (r8 wave 3): row-level
    // verdicts over a full-outer key join against a target with
    // injected drift (changed segments, dropped keys, orphan keys)
    "reconcile_diff" -> ((s, d) => {
      val src = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val tgt = src.filter(col("c_custkey") % 13 =!= 0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 10 === 0, lit("DRIFTED"))
            .otherwise(col("c_mktsegment")))
        .unionByName(src.filter(col("c_custkey") % 17 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      Reconcile.diff(src, tgt, Seq("c_custkey"),
          Seq("c_mktsegment", "c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // same merge with dbt's invalidate_hard_deletes=true: the keys
    // missing from the second (FULL) snapshot — custkey%7==0, the
    // reference's Mongo-users hard-delete case — get their open rows
    // CLOSED at t1 instead of staying open forever
    "scd2_merge_harddelete" -> ((s, d) => {
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val s1 = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val history0 = s1.withColumn(Scd2.ValidFrom, t0)
        .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
      val s2 = s1.filter(col("customer_id") % 7 =!= 0)
        .withColumn("market_segment",
          when(col("customer_id") % 10 === 0, lit("CHANGED"))
            .otherwise(col("market_segment")))
      Scd2.merge(history0, s2, Seq("customer_id"),
          Seq("customer_name", "account_balance", "market_segment"), t1,
          invalidateHardDeletes = true)
        .orderBy(col("customer_id"), col("valid_from"))
    }),

    // ---- snapshot diff (CDC for tracking-column-less sources, the
    // reference's Mongo users case) ----
    "cdc_snapshot_diff" -> ((s, d) => {
      val s1 = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val s2 = s1.filter(col("customer_id") % 7 =!= 0)
        .withColumn("market_segment",
          when(col("customer_id") % 10 === 0, lit("CHANGED"))
            .otherwise(col("market_segment")))
      Cdc.snapshotDiff(s1, s2, Seq("customer_id"),
          Seq("customer_name", "account_balance", "market_segment"))
        .orderBy(col("customer_id"))
    }),

    // ---- pivot rollup (wide per-entity feature table) ----
    "events_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))),

    // ---- nested-document flatten (mongo_loader.py analog) ----
    // struct column + JSON-string column → flat parent_child columns
    "flatten_props" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        struct(col("event_type"), col("value")).as("attrs"), col("props"))
      Flatten.flattenJson(ev, "props", "k INT").orderBy(col("event_id"))
    }),

    // ---- schema evolution (base_loader DDL-reconcile analog) ----
    // batch 1 predates the `value` column; batch 2 adds it — the
    // union null-fills history, exactly like an added source field
    "schema_evolution" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      val v1 = ev.filter(col("ts") <= cutoff).drop("value")
      val v2 = ev.filter(col("ts") > cutoff)
      SchemaEvolution.unionEvolved(Seq(v1, v2)).orderBy(col("event_id"))
    }),

    // ---- staging / marts (§2.2) ----
    "stg_customer" -> ((s, d) => Models.stgCustomer(s, d).orderBy(col("customer_id"))),
    "stg_events" -> ((s, d) => {
      val cutoffNanos = java.time.LocalDateTime.parse(CdcCutoff.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
      Models.stgEvents(s, d, cutoffNanos).orderBy(col("event_id"))
    }),
    "skew_salted_agg" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        col("value").cast("decimal(18,6)").as("value_dec"), col("user_id"))
      Skew.saltedAgg(ev, Seq("event_type"),
          Seq(Skew.SumOf("value_dec"), Skew.CountAll(),
            Skew.MinOf("user_id"), Skew.MaxOf("user_id")))
        .select(col("event_type"),
          col("sum_value_dec").cast("double").as("sum_value"),
          col("n_rows"), col("min_user_id").as("min_user"),
          col("max_user_id").as("max_user"))
        .orderBy(col("event_type"))
    }),
    "dim_customer" -> ((s, d) => Models.dimCustomer(s, d).orderBy(col("customer_id"))),
    "dim_order" -> ((s, d) => Models.dimOrder(s, d).orderBy(col("order_id"))),
    "fact_lineitem" -> ((s, d) =>
      Models.factLineitem(s, d).orderBy(col("order_id"), col("line_number"))),

    // ---- asset lineage (§2.1 orchestration; dbt_translator.py
    // analog): the reference pipeline's model graph run through Dag,
    // exported as a queryable table — topology is static, so the
    // oracle replays it as literals
    "pipeline_lineage" -> ((s, _) => {
      val nodes = Seq(
        Dag.Node("extract_raw", Nil, () => (), group = "sources"),
        Dag.Node("stg_customer", Seq("extract_raw"), () => (), group = "staging"),
        Dag.Node("stg_events", Seq("extract_raw"), () => (), group = "staging"),
        Dag.Node("dim_customer", Seq("stg_customer"), () => (), group = "marts"),
        Dag.Node("dim_order", Seq("dim_customer"), () => (), group = "marts"),
        Dag.Node("fact_lineitem", Seq("dim_customer", "dim_order"), () => (),
          group = "marts"),
        Dag.Node("dq_checks", Seq("fact_lineitem"), () => (), group = "quality"))
      Dag.lineage(s, nodes, Dag.run(nodes)).orderBy(col("node_name"))
    }),
    // dbt-docs catalog analog: per-(model, column) schema rows for
    // the model nodes of the same graph — schema-only (no scan), so
    // the oracle replays it literally
    "pipeline_catalog" -> ((s, d) => {
      val nodes = Seq(
        Dag.Node("extract_raw", Nil, () => (), group = "sources"),
        Dag.Node("stg_customer", Seq("extract_raw"), () => (), group = "staging"),
        Dag.Node("dim_customer", Seq("stg_customer"), () => (), group = "marts"),
        Dag.Node("dim_order", Seq("dim_customer"), () => (), group = "marts"),
        Dag.Node("fact_lineitem", Seq("dim_customer", "dim_order"), () => (),
          group = "marts"))
      Dag.catalog(s, nodes, Map(
          "stg_customer" -> Models.stgCustomer(s, d),
          "dim_customer" -> Models.dimCustomer(s, d),
          "dim_order" -> Models.dimOrder(s, d),
          "fact_lineitem" -> Models.factLineitem(s, d)))
        .orderBy(col("node_name"), col("ordinal"))
    }),

    // multi-environment namespace routing graded end-to-end (r11;
    // the reference's generate_schema_name + cleanup_test_schemas
    // macros): the SAME mart model deploys through three env
    // configs — prod lands in the fixed analytics schema, a CI/MR
    // test run in its per-run namespaces, dev in the per-developer
    // namespace — then the MR run's schemas are DROPPED and the
    // graded read-back walks the surviving warehouse through the
    // resolver. Routing errors are visible in row content: prod
    // carries the full mart, dev only its slice, the dropped test
    // namespaces contribute nothing
    "namespace_routing" -> ((s, d) => {
      import graft.sources.Namespace
      val root = graft.TempDirs.create("graft_ns_")
      val mart = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
      def deploy(cfg: Namespace.Config, custom: Option[String],
                 df: DataFrame): String = {
        val schema = Namespace.schemaName(cfg, custom)
        Namespace.createSchemaIfNotExists(s, root, schema)
        df.write.mode("overwrite")
          .parquet(Namespace.tablePath(cfg, root, "mart_orders", custom))
        schema
      }
      val prod = Namespace.Config(Namespace.Prod, "analytics",
        prodDefault = "warehouse_analytics",
        testDefault = "warehouse_analytics_test")
      val ci = prod.copy(env = Namespace.Test, profileSchema = "ci_mr_42")
      val dev = prod.copy(env = Namespace.Dev, lookup = _ => Some("Ada"))
      val prodSchema = deploy(prod, Some("mart"), mart) // analytics_mart
      deploy(ci, Some("staging"), mart)                 // ci_mr_42_staging
      deploy(ci, Some("mart"), mart)                    // ci_mr_42_mart
      val devSchema = deploy(dev, None,                 // ada
        mart.filter(col("o_orderpriority") === "1-URGENT"))
      val dropped = Namespace.cleanupTestSchemas(s, root, "ci", "42",
        layers = Seq("staging", "mart"))
      require(dropped == Seq("ci_mr_42_staging", "ci_mr_42_mart"),
        s"cleanup dropped $dropped")
      s.read.parquet(Namespace.tablePath(prod, root, "mart_orders", Some("mart")))
        .withColumn("env_schema", lit(prodSchema))
        .unionByName(
          s.read.parquet(Namespace.tablePath(dev, root, "mart_orders", None))
            .withColumn("env_schema", lit(devSchema)))
        .select(col("env_schema"), col("o_orderpriority"), col("n_orders"))
        .orderBy(col("env_schema"), col("o_orderpriority"))
    }),

    // ---- end-to-end reference-day replay (r8 flagship) ----
    // two scheduled days of the WHOLE pipeline: Derby OLTP seed →
    // partitioned JDBC extract → atomic staging manifests →
    // watermark-incremental event loads → Versioned warehouse →
    // SCD2 snapshot merge w/ hard deletes → blocking DQ gate →
    // geography/fact/event-enriched mart, driven through
    // Dag + Schedule at the reference's 01:40 Lagos cadence.
    // Oracle replays both days in SQL (pipeline/DayReplay.scala).
    "pipeline_day_replay" -> ((s, d) => DayReplay.run(s, d)),
    // the DQ audit table the replay's gate committed (r9): Benford
    // digit screen over the day-2 current balances — the oracle
    // replays the same id-arithmetic day-2 row set and digit math
    "pipeline_day_replay_dq" -> ((s, d) => DayReplay.runDqAudit(s, d)),

    // ---- data quality (§2.3) ----
    // store_failures analog (r8): the OFFENDING rows per check —
    // the R-flagged lineitems fail the accepted set, every
    // multi-line order's items land in the unique audit, not_null
    // contributes nothing on clean keys
    "dq_failing_rows" -> ((s, d) =>
      Quality.failingRows(Tables.lineitem(s, d), Seq(
          Quality.NotNull("l_orderkey"),
          Quality.Unique("l_orderkey"),
          Quality.AcceptedValues("l_returnflag", Seq("A", "N"))),
          keyCols = Seq("l_orderkey", "l_linenumber"))
        .orderBy(col("check_name"), col("l_orderkey"), col("l_linenumber"))),
    "dq_profile" -> ((s, d) =>
      Quality.profile(Tables.orders(s, d),
          Seq("o_orderstatus", "o_custkey", "o_totalprice"))
        .orderBy(col("column_name"))),
    // HLL one-pass variant — the 100 TB profile (sketch counts are
    // engine-specific → rows-only oracle)
    "dq_profile_approx" -> ((s, d) =>
      Quality.profileApprox(Tables.orders(s, d),
          Seq("o_orderstatus", "o_custkey", "o_totalprice"))
        .orderBy(col("column_name"))),
    "dq_checks" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val li     = Tables.lineitem(s, d)
      val scalar = Quality.runChecks(orders, Seq(
          Quality.NotNull("o_orderkey"),
          Quality.Unique("o_orderkey"),
          Quality.AcceptedValues("o_orderstatus", Seq("O", "F", "P"))))
        .unionByName(Quality.runChecks(li, Seq(
          Quality.NotNull("l_orderkey"),
          Quality.AcceptedValues("l_returnflag", Seq("A", "N", "R")))))
      val rel = Quality.relationshipViolations(li, "l_orderkey", orders, "o_orderkey")
        .agg(count(lit(1)).as("violations"))
        .select(lit("relationships_l_orderkey").as("check_name"), col("violations"))
      scalar.unionByName(rel).orderBy(col("check_name"))
    }),

    // dbt-style severity: 'P' deliberately outside accepted_values so
    // thresholds classify (pass / warn / error) on real violation counts
    "dq_checks_status" -> ((s, d) =>
      Quality.withStatus(
          Quality.runChecks(Tables.orders(s, d), Seq(
            Quality.NotNull("o_orderkey"),
            Quality.Unique("o_orderkey"),
            Quality.AcceptedValues("o_orderstatus", Seq("O", "F")))),
          warnIf = 0L, errorIf = 100L)
        .orderBy(col("check_name"))),

    // ---- text analysis (§2.5) ----
    "doc_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          functions.Text.tokenCountWs(col("text")).as("n_tokens_ws"),
          functions.Text.tokenCountBpe(col("text")).as("n_tokens_bpe"))
        .orderBy(col("doc_id"))),
    "doc_quality" -> ((s, d) => {
      val t = col("text")
      val nChars = length(t).cast("long")
      val nWords = functions.Text.tokenCountWs(t)
      val nPunct = length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("long")
      val nDigit = length(regexp_replace(t, "[^0-9]", "")).cast("long")
      val nAlnum = length(regexp_replace(t, "[^A-Za-z0-9]", "")).cast("long")
      Tables.documents(s, d).select(col("doc_id"),
          nChars.as("n_chars"), nWords.as("n_words"),
          (nPunct.cast("double") / nullif(nChars, lit(0L)).cast("double")).as("punct_ratio"),
          (nDigit.cast("double") / nullif(nChars, lit(0L)).cast("double")).as("digit_ratio"),
          (nAlnum.cast("double") / nullif(nWords, lit(0L)).cast("double")).as("avg_word_len"),
          (functions.Text.stopwordHits(t, functions.Text.StopwordsEn).cast("double") /
            nullif(nWords, lit(0L)).cast("double")).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),
    // TextRank keywords (r11): per-doc integer fixed-point PageRank
    // over the word-adjacency graph, top-5 by (rank desc, word) —
    // the iterative extraction hash-grades against 6 unrolled
    // MATERIALIZED-CTE rounds
    "doc_keywords" -> ((s, d) =>
      functions.Text.textRankKeywords(Tables.documents(s, d), "doc_id",
          "text", iterations = 6, topK = 5)
        .orderBy(col("doc_id"), col("rank"))),
    // Flesch-Kincaid readability (r11): grade/ease from portable
    // regex counts — words, sentence runs (floored 1), vowel-run
    // syllables — two fixed double trees, round 6
    "doc_readability" -> ((s, d) =>
      functions.Text.readability(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "doc_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), functions.Text.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    // lang-ID evaluation harness (r11): predicted vs labeled language
    // as a confusion matrix — the screen that tells you WHERE the
    // heuristic fails before you trust it to route a corpus
    "lang_id_confusion" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), functions.Text.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("lang_pred"))),
    // rolling 64-bit fingerprint, md5-slice hash (r7 twin; r12: the
    // rows-only xxhash64 original is RETIRED from grading — same
    // arithmetic, non-portable hash; Text.fingerprint stays in the
    // library and TextSpec pins it — the graph_pagerank precedent)
    "doc_fingerprint_md5" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          functions.Text.fingerprintPortable(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
    // winnowing fingerprint set (MOSS) over the md5-slice hash, the
    // arithmetic (k-gram sequence → w-window min → distinct sort)
    // fully replayed in the DuckDB oracle. Exploded to one (doc_id,
    // fingerprint) row per selected hash: scalar cells only, so the
    // driver's comparator can count and sort the result. r12: the
    // rows-only xxhash64 original is retired from grading (TextSpec
    // still pins Text.winnow's default hash)
    "doc_winnow_md5" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(functions.Text.winnow(col("text"), 5, 4,
            functions.Text.portableHash60)).as("fingerprint"))
        .orderBy(col("doc_id"), col("fingerprint"))),
    // substring-run pair detection over winnow fingerprints: the
    // whole pair pipeline — winnow sets, df-cap, pair counts —
    // replayed in SQL over the md5-slice hash. r12: the rows-only
    // xxhash64 original is retired from grading (DedupSpec still pins
    // the run/boilerplate semantics on the default hash)
    "doc_shared_runs_md5" -> ((s, d) =>
      Dedup.sharedRuns(Tables.documents(s, d), "doc_id", "text",
          k = 5, w = 4, minShared = 1, maxDocFreq = 200,
          hashFn = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))),
    // daily-delta shared-runs (r11): the second half of the corpus
    // paired against the first half's persisted fingerprint index
    // under EXACT merged-df semantics — equal to the full run
    // restricted to pairs whose later doc is in the batch, so the
    // full oracle grades it with that one restriction
    "doc_shared_runs_incr_md5" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val cut = lit(250L)
      val idx = Dedup.sharedRunsIndexFrame(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", k = 5, w = 4,
        hashFn = functions.Text.portableHash60)
      Dedup.sharedRunsIncremental(idx, corpus.filter(col("doc_id") >= cut),
          "doc_id", "text", k = 5, w = 4, minShared = 1, maxDocFreq = 200,
          hashFn = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // weighted cross-corpus mixing over residue slices of documents.
    // FULL-ROW oracle since r7: the per-source hash draw is Spark's
    // xxhash64 replayed in SQL (xxhash64LongSql) against quota
    // thresholds computed from the same counts
    "sample_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def slice(r: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === r)
      Sampling.mixWeighted(Seq(
          ("web", slice(0), 0.6), ("code", slice(1), 0.3), ("books", slice(2), 0.1)),
          "doc_id", targetRows = 300L)
        .select(col("doc_id"), col("mix_source"))
        .orderBy(col("doc_id"))
    }),
    // the HASH-path temperature resample graded directly (r7): the
    // oracle replays both the threshold arithmetic AND xxHash64
    "sample_temperature_hash" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        floor(length(col("text")) / lit(400)).cast("long").as("len_bucket"))
      Sampling.temperatureSample(docs, "doc_id", "len_bucket",
          alpha = 0.5, targetRows = 200L)
        .select(col("doc_id"), col("len_bucket"))
        .orderBy(col("doc_id"))
    }),
    // the bit-portable modulo twin of the mix (r7): full rows graded —
    // the quota arithmetic (one-job counts → round(min(1,q/n)·B)
    // thresholds → residue draw) replicates exactly in DuckDB
    "sample_mix_mod" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def slice(r: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === r)
      Sampling.mixWeightedMod(Seq(
          ("web", slice(0), 0.6), ("code", slice(1), 0.3), ("books", slice(2), 0.1)),
          "doc_id", targetRows = 300L, buckets = 100L)
        .select(col("doc_id"), col("mix_source"))
        .orderBy(col("doc_id"))
    }),
    // domain-temperature resampling, graded through the bit-portable
    // modulo twin (same role modSplit plays for hashSplit); domains =
    // coarse length buckets so the group sizes are data-driven
    "sample_temperature" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        floor(length(col("text")) / lit(400)).cast("long").as("len_bucket"))
      Sampling.temperatureModSample(docs, "doc_id", "len_bucket",
          alpha = 0.5, targetRows = 200L, buckets = 100L)
        .select(col("doc_id"), col("len_bucket"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup (§2.5) ----
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("content_hash"))),
    // daily-delta composition: the second half of the corpus deduped
    // against the index built from the first half
    "dedup_exact_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cut = lit(250L)
      val index = Dedup.exact(docs.filter(col("doc_id") < cut), "doc_id", "text")
      Dedup.exactIncremental(index, docs.filter(col("doc_id") >= cut),
          "doc_id", "text")
        .orderBy(col("content_hash"))
    }),
    // edit-distance fuzzy self-join (r8-cont): PassJoin segment
    // blocking + banded levenshtein verify. The corpus carries no
    // natural typos, so the query seeds them deterministically (the
    // doc_pii_redact discipline): 12-hex-char md5-derived keys with a
    // planted substitution / deletion / insertion for every 7th key;
    // the custkey cap keeps the ORACLE's quadratic levenshtein join
    // bounded at any SF (the operator itself never goes quadratic)
    "dedup_edit_distance" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_custkey") <= 2000L)
      val baseKeys = cust.select(col("c_custkey").as("id"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("s"))
      val pos = (col("c_custkey") % 11 + 1).cast("int")
      val b = substring(md5(col("c_custkey").cast("string")), 1, 12)
      val mutated = cust.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("id"),
          when(col("c_custkey") % 3 === 0,
            concat(b.substr(lit(1), pos - 1), lit("z"), b.substr(pos + 1, lit(12))))
          .when(col("c_custkey") % 3 === 1,
            concat(b.substr(lit(1), pos - 1), b.substr(pos + 1, lit(12))))
          .otherwise(
            concat(b.substr(lit(1), pos), lit("z"), b.substr(pos + 1, lit(12))))
          .as("s"))
      Dedup.editDistance(baseKeys.unionByName(mutated), "id", "s", maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // fuzzy pairs → transitive clusters (r8-cont): the edit-distance
    // modality feeds the same connectedComponents machinery as every
    // other pair source — typo chains (base→sub→sub²…) collapse into
    // one cluster labeled by its min id
    "dedup_edit_clusters" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_custkey") <= 2000L)
      val baseKeys = cust.select(col("c_custkey").as("id"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("s"))
      val pos = (col("c_custkey") % 11 + 1).cast("int")
      val b = substring(md5(col("c_custkey").cast("string")), 1, 12)
      val mutated = cust.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("id"),
          when(col("c_custkey") % 3 === 0,
            concat(b.substr(lit(1), pos - 1), lit("z"), b.substr(pos + 1, lit(12))))
          .when(col("c_custkey") % 3 === 1,
            concat(b.substr(lit(1), pos - 1), b.substr(pos + 1, lit(12))))
          .otherwise(
            concat(b.substr(lit(1), pos), lit("z"), b.substr(pos + 1, lit(12))))
          .as("s"))
      val pairs = Dedup.editDistance(baseKeys.unionByName(mutated), "id", "s",
        maxDist = 2)
      Dedup.connectedComponents(pairs).orderBy(col("id"))
    }),
    // daily-delta edit distance (r8-cont): the typo'd batch checks
    // against the stored segment index at delta cost — only the batch
    // generates probe substrings (single-sided filtering is lossless:
    // the pigeonhole partitions the INDEX string). Same seeded corpus
    // as dedup_edit_distance; oracle = the full quadratic join
    // restricted to batch-touching pairs
    "dedup_edit_distance_incr" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_custkey") <= 2000L)
      val baseKeys = cust.select(col("c_custkey").as("id"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("s"))
      val pos = (col("c_custkey") % 11 + 1).cast("int")
      val b = substring(md5(col("c_custkey").cast("string")), 1, 12)
      val mutated = cust.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("id"),
          when(col("c_custkey") % 3 === 0,
            concat(b.substr(lit(1), pos - 1), lit("z"), b.substr(pos + 1, lit(12))))
          .when(col("c_custkey") % 3 === 1,
            concat(b.substr(lit(1), pos - 1), b.substr(pos + 1, lit(12))))
          .otherwise(
            concat(b.substr(lit(1), pos), lit("z"), b.substr(pos + 1, lit(12))))
          .as("s"))
      val idx = Dedup.editIndexFrames(baseKeys, "id", "s", maxDist = 2)
      Dedup.editDistanceIncremental(idx, mutated, "id", "s", maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // per-source duplication health report (r8): the summary a
    // curation run publishes — docs / distinct contents / dup rate
    "dedup_rate_report" -> ((s, d) =>
      Dedup.rateReport(Tables.documents(s, d), "text", "source")
        .orderBy(col("source"))),
    // maxDocFreq bounds hot-shingle fan-out in candidate generation
    // (scores are exact rescores, so output is unchanged wherever a
    // pair shares ≥1 sub-cap shingle; 1000 ≫ any df at sf0.01)
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", n = 3, threshold = 0.5,
          maxDocFreq = 1000)
        .orderBy(col("id_a"), col("id_b"))),
    // daily-delta n-gram Jaccard (r7): second half vs the first-half
    // index under EXACT merged-df semantics — equal to the full run
    // restricted to batch-touching pairs, so the full oracle grades
    // it with that one restriction. The base index persists through
    // a parquet store hop (r12 verdict: build used to dominate the
    // timed probe and its subplan re-derived per downstream use —
    // the doc_phrase_search / ann_ivf_incr_topk discipline)
    "dedup_ngram_jaccard_incr" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val cut = lit(250L)
      val store = graft.Stores.cached(s"ngidx:$d") { dir =>
        val built = Dedup.ngramIndexFrames(
          corpus.filter(col("doc_id") < cut),
          "doc_id", "text", n = 3, maxDocFreq = 1000)
        built.occ.write.parquet(s"$dir/occ")
        built.dfs.write.parquet(s"$dir/dfs")
        built.meta.write.parquet(s"$dir/meta")
      }
      val frames = Dedup.NgramIndex(s.read.parquet(s"$store/occ"),
        s.read.parquet(s"$store/dfs"), s.read.parquet(s"$store/meta"))
      Dedup.ngramJaccardIncremental(frames, corpus.filter(col("doc_id") >= cut),
          "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000,
          includeIntraBatch = true)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // MinHash+LSH banded near-dup (r12: the rows-only xxhash64-
    // shingle original is retired from grading; DedupSpec pins it).
    // ONLY the shingle hash swaps to the md5-slice; the
    // Kirsch–Mitzenmacher double hashing (h2 is still Spark's
    // xxhash64 on the shingle hash, replayed via the xxHash64 SQL
    // chain), min-signatures, banding, and exact-Jaccard verify are
    // the REAL production arithmetic, graded bit-exact in DuckDB
    "dedup_minhash_md5" -> ((s, d) =>
      Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.5,
          shingleHash = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))),
    // daily-delta near-dup (r7): the second half of the corpus checked
    // against the index built from the first half — REAL incremental
    // code path, graded bit-exact (the oracle is the full pipeline
    // restricted to batch-touching pairs, which the equivalence spec
    // proves is the same thing)
    "dedup_minhash_incr_md5" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val cut = lit(250L)
      val (ish, ibd) = Dedup.minHashIndexFrames(
        corpus.filter(col("doc_id") < cut), "doc_id", "text",
        n = 3, numHashes = 32, bands = 16,
        shingleHash = functions.Text.portableHash60)
      Dedup.minHashLshIncremental(ish, ibd,
          corpus.filter(col("doc_id") >= cut), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.5,
          includeIntraBatch = true,
          shingleHash = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // TWO-day daily-delta maintenance through the ATOMIC group store
    // (r8, sources/VersionedGroup): day-0 frames group-committed,
    // day-1 batch checked against the STORE then its frames appended
    // as one group version, day-2 batch checked against the
    // maintained store. Reads are version-pinned at plan build, so
    // day 1 stays correct even though maintenance moves the head
    // before it evaluates. Output (both days' pairs) = the full run
    // restricted to id_b ≥ the first cut — every pair lands on the
    // day its LATER doc arrives.
    "dedup_minhash_vg_md5" -> ((s, d) => {
      import graft.sources.VersionedGroup
      val corpus = Tables.documents(s, d)
      val (c1, c2) = (lit(200L), lit(350L))
      val root = graft.TempDirs.create("graft_vg_") + "/mh"
      def frames(df: DataFrame) = Dedup.minHashIndexFrames(df, "doc_id",
        "text", n = 3, numHashes = 32, bands = 16,
        shingleHash = functions.Text.portableHash60)
      def inc(batch: DataFrame) = Dedup.minHashLshIncremental(
        VersionedGroup.read(s, root, "sh"), VersionedGroup.read(s, root, "bd"),
        batch, "doc_id", "text", n = 3, numHashes = 32, bands = 16,
        threshold = 0.5, includeIntraBatch = true,
        shingleHash = functions.Text.portableHash60)
      val (sh0, bd0) = frames(corpus.filter(col("doc_id") < c1))
      VersionedGroup.commit(root, Map("sh" -> sh0, "bd" -> bd0), replace = true)
      val b1 = corpus.filter(col("doc_id") >= c1 && col("doc_id") < c2)
      val day1 = inc(b1)
      val (sh1, bd1) = frames(b1)
      VersionedGroup.commit(root, Map("sh" -> sh1, "bd" -> bd1))
      val day2 = inc(corpus.filter(col("doc_id") >= c2))
      day1.unionByName(day2).orderBy(col("id_a"), col("id_b"))
    }),
    // hamming radius 3 on 64-bit simhash, the standard near-dup
    // setting (Manku et al., WWW'07); wider radii shrink pigeonhole
    // blocks and blow up the candidate space. Per-bit votes, majority
    // signature, pigeonhole blocks, and the hamming verify all replay
    // in DuckDB over the md5-slice shingle hash → hash-green (r12:
    // the rows-only xxhash64-shingle original is retired from
    // grading; DedupSpec pins it)
    "dedup_simhash_md5" -> ((s, d) =>
      Dedup.simHash(Tables.documents(s, d), "doc_id", "text",
          n = 3, maxHamming = 3,
          shingleHash = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))),
    // daily-delta SimHash (r7): second half vs the first-half index —
    // REAL incremental code path, graded bit-exact through the md5
    // twin (oracle = full pipeline restricted to batch-touching pairs)
    "dedup_simhash_incr_md5" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val cut = lit(250L)
      val idx = Dedup.simHashIndexFrame(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", n = 3, maxHamming = 3,
        shingleHash = functions.Text.portableHash60)
      Dedup.simHashIncremental(idx, corpus.filter(col("doc_id") >= cut),
          "doc_id", "text", n = 3, maxHamming = 3, includeIntraBatch = true,
          shingleHash = functions.Text.portableHash60)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // exhaustive all-pairs path: the ORACLE BASELINE only (hash-green
    // vs DuckDB); bounded inputs — never the 100 TB path
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingCosine(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.45, exhaustive = true)
        .orderBy(col("id_a"), col("id_b"))),
    // the SCALE path: multi-table hyperplane-LSH bucketed candidates
    // (bucket-local joins, no all-pairs). FULL oracle since r7: the
    // splitmix hyperplanes replay as SQL literals, so DuckDB replays
    // the exact bucket arithmetic (bit-exact at sf0.01/0.1); DedupSpec
    // still asserts recall vs exhaustive. 4 planes × 12 tables ≈ 0.9
    // recall at the 0.45 threshold this synthetic data needs (max pair
    // cosine ≈ 0.51; real near-dup corpora use 0.9+ with more planes)
    "dedup_embedding_lsh" -> ((s, d) =>
      Dedup.embeddingCosine(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.45, exhaustive = false, planes = 4, tables = 12)
        .orderBy(col("id_a"), col("id_b"))),
    // daily-delta embedding near-dup (r7): second half of the vectors
    // vs the first-half index — same literal planes, so the FULL
    // oracle replays it (restricted to batch-touching pairs)
    "dedup_embedding_incr" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val cut = lit(250L)
      val (ivecs, ikeys) = Dedup.embeddingIndexFrames(
        embs.filter(col("vec_id") < cut), "vec_id", "embedding",
        planes = 4, tables = 12)
      Dedup.embeddingCosineIncremental(ivecs, ikeys,
          embs.filter(col("vec_id") >= cut), "vec_id", "embedding",
          threshold = 0.45, planes = 4, tables = 12, includeIntraBatch = true)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // asymmetric containment search (r11, Broder's c(Q,D)): which
    // docs CONTAIN the query docs' shingles — the quote/superset
    // detector Jaccard misses; broadcast query grams, no corpus text
    // shuffle
    "doc_containment" -> ((s, d) =>
      Dedup.containmentSearch(Tables.documents(s, d), "doc_id", "text",
          queryIds = Seq(0L, 1L, 2L), n = 3, threshold = 0.02)
        .orderBy(col("query_id"), col("doc_id"))),
    // near-dup pairs → transitive CLUSTERS: every id labeled with its
    // component's minimum id (keep-one-per-cluster even when
    // duplicates chain; pair-drop keeps locally-minimal extras)
    "dedup_components" -> ((s, d) =>
      Dedup.connectedComponents(
          Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text",
            n = 3, threshold = 0.5, maxDocFreq = 1000))
        .orderBy(col("id"))),
    // blocked fuzzy record linkage (r11, the Fellegi-Sunter candidate
    // pass): parts sharing their noun token compared by thresholded
    // edit distance — the equi-join-on-block-key form of the O(n²)
    // cross join; blocking recall loss is part of the graded
    // semantics (the oracle replays the same block key)
    // pk-sliced like the graph family (r11 re-scope): the synthetic
    // 2-word names draw from an 8-noun vocabulary, so full-corpus
    // blocks are ~n/8 wide and ~28% of ALL within-block pairs match
    // at dist ≤ 2 (5.5M output rows at sf0.1, 35 s of pure true-pair
    // emission) — the graded query runs the identical operator on
    // the bounded-density slice; the operator's scale story is the
    // blocking PLUS the r12 mega-block bound: blocks above
    // hotBlockThreshold split on length bands (candidate space
    // Σ m_k·(m_{k−1}+m_k+m_{k+1}), never m²) with a pair-grid salt
    // spreading each band over salts·(salts+1)/2 reducers — pair-set
    // equality vs the unsplit form is pinned in LinkageSpec
    "er_fuzzy_pairs" -> ((s, d) =>
      operators.Linkage.blockedFuzzyPairs(
          Tables.part(s, d).filter(col("p_partkey") % 4 === 0),
          "p_partkey", "p_name",
          blockCol = element_at(split(col("p_name"), " "), -1), maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))),
    // golden-record survivorship (r11): the MERGE half of ER — the
    // fuzzy clusters collapsed to one composite record per entity
    // under per-attribute rules (longest name, modal brand/type,
    // max size, cheapest price)
    "er_golden_record" -> ((s, d) => {
      import operators.Linkage.Survivorship._
      // same bounded-density slice as er_fuzzy_pairs
      val part = Tables.part(s, d).filter(col("p_partkey") % 4 === 0)
      val pairs = operators.Linkage.blockedFuzzyPairs(part, "p_partkey",
        "p_name", blockCol = element_at(split(col("p_name"), " "), -1),
        maxDist = 2)
      operators.Linkage.goldenRecord(part, "p_partkey",
          Dedup.connectedComponents(pairs),
          Seq("p_name" -> Longest, "p_brand" -> MostFrequent,
            "p_type" -> MostFrequent, "p_size" -> Max,
            "p_retailprice" -> Min), minMembers = 2)
        .orderBy(col("comp"))
    }),
    // Data Vault hub (r11): one row per business key from a TWO-
    // source union, deterministic md5 hub keys, order-free min
    // record_source — no sequence generator anywhere
    "dv_hub_customer" -> ((s, d) => {
      val crm = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), lit("crm").as("src"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), lit("orders").as("src"))
      pipeline.DataVault.hub(crm.unionByName(ord), Seq("custkey"),
          col("src"), "L1")
        .orderBy(col("custkey"))
    }),
    // Data Vault link (r11): the order↔customer relationship keyed by
    // the hash of both business keys, each side's hub key carried
    "dv_link_order_customer" -> ((s, d) =>
      pipeline.DataVault.link(Tables.orders(s, d), Seq("o_orderkey"),
          Seq("o_custkey"), "orders", "L1")
        .orderBy(col("o_orderkey"))),
    // Data Vault satellite delta (r11): batch 2 modifies every 10th
    // customer's segment; the hash_diff anti-join must surface
    // exactly those states and nothing else
    "dv_satellite_delta" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val cur = pipeline.DataVault.satellite(cust, Seq("c_custkey"),
        Seq("c_mktsegment", "c_nationkey"), "crm", "L1")
      val batch2 = cust.withColumn("c_mktsegment",
        when(pmod(col("c_custkey"), lit(10)) === 0,
          concat(lit("X-"), col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      pipeline.DataVault.satelliteDelta(cur, batch2, Seq("c_custkey"),
          Seq("c_mktsegment", "c_nationkey"), "crm", "L2")
        .orderBy(col("hub_key"))
    }),
  )
}
