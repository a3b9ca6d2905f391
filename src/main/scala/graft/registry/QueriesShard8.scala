package graft

import graft.EntryHelpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-registry shard 8 — r14 session-2 waves 21+ (Shard7 nears the
  * RegistrySpec ceiling). [[SparkEntry.queries]] composes the shards. */
private[graft] object QueriesShard8 {

  /** Shared line-ified synthesis for the line-level curation keys:
    * sentence breaks become newlines (the corpus is one-line prose),
    * then the doc's OWN first line is planted twice at the tail — a
    * known in-doc duplicate for the dedup key, replayed verbatim by
    * the SQL twin. */
  private def lineified(df: DataFrame): DataFrame =
    df.withColumn("__l",
        expr("replace(coalesce(text, ''), '. ', concat('.', chr(10)))"))
      .withColumn("synth",
        expr("""concat(__l, chr(10), element_at(split(__l, '\n'), 1),
                chr(10), element_at(split(__l, '\n'), 1))"""))

  val m: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- within-doc line dedup (r14 wave 21) ----
    // the CCNet/C4 intra-document cleanup the SEGMENT family doesn't
    // do (dedup_segments removes lines duplicated ACROSS docs; this
    // removes repetition INSIDE one doc — boilerplate nav bars,
    // scraped pagination): keep the FIRST occurrence of each line,
    // preserve order. Pure built-in HOF fold (aggregate over the
    // split array) — codegen'd, zero shuffle, no UDF.
    "doc_line_dedup" -> ((s, d) => {
      lineified(Tables.documents(s, d))
        .withColumn("text_dedup", expr(
          """array_join(aggregate(split(synth, '\n'),
               cast(array() as array<string>),
               (acc, x) -> case when array_contains(acc, x) then acc
                 else array_append(acc, x) end), '\n')"""))
        .select(col("doc_id"),
          expr("size(split(synth, '\n'))").cast("long").as("n_lines"),
          expr("size(split(text_dedup, '\n'))").cast("long")
            .as("n_unique"),
          col("text_dedup"))
        .orderBy(col("doc_id"))
    }),

    // ---- C4 line-quality filter (r14 wave 21) ----
    // Raffel et al. '20 §2.2's line rules: keep lines ending in
    // terminal punctuation with >= 3 words; the doc-level Gopher
    // rules are [doc_quality_filter] — this is the finer scalpel
    // that SALVAGES a page instead of dropping it. Built-in
    // filter()/rlike HOFs, codegen'd, zero shuffle.
    "doc_c4_line_clean" -> ((s, d) => {
      lineified(Tables.documents(s, d))
        .withColumn("__kept", expr(
          """filter(split(synth, '\n'),
               x -> trim(x) rlike '[.!?"]$'
                 and size(split(trim(x), '\\s+')) >= 3)"""))
        .select(col("doc_id"),
          expr("size(split(synth, '\n'))").cast("long").as("n_lines"),
          expr("size(__kept)").cast("long").as("n_kept"),
          expr("array_join(__kept, '\n')").as("text_clean"))
        .orderBy(col("doc_id"))
    }),

    // ---- Unicode NFC normalization (r14 wave 22) ----
    // the FIXER behind the mojibake screen: precomposed and
    // decomposed forms of the same text hash apart, breaking exact
    // dedup and tokenization downstream. Native codegen'd JDK
    // Normalizer vs DuckDB's utf8proc — two INDEPENDENT Unicode
    // implementations agreeing byte-for-byte is the gate. The plant
    // (EntryHelpers.NfcPlant, one constant interpolated into both
    // sides) carries combining marks + the angstrom singleton + an
    // already-composed passthrough.
    "doc_unicode_normalize" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("synth",
          concat(coalesce(col("text"), lit("")), lit(NfcPlant)))
        .select(col("doc_id"),
          (col("synth") =!= graft.functions.Unicode.nfc(col("synth")))
            .as("changed"),
          graft.functions.Unicode.nfc(col("synth")).as("text_nfc"))
        .orderBy(col("doc_id"))
    }),

    // ---- SCD2 timestamp-strategy merge (r14 wave 23) ----
    // dbt's RECOMMENDED snapshot strategy (strategy='timestamp'):
    // versioned iff updated_at is STRICTLY newer — the %10==5 rows
    // flap their segment under an UNCHANGED updated_at (a replayed
    // stale extract) and must NOT version, exactly where the check
    // strategy would; %7==0 omitted keys stay open
    "scd2_merge_timestamp" -> ((s, d) => {
      import graft.operators.Scd2
      import graft.pipeline.Models
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val tU = lit("2026-01-15 00:00:00").cast("timestamp")
      val s1 = Models.stgCustomer(s, d).select(col("customer_id"),
          col("customer_name"), col("market_segment"))
        .withColumn("updated_at", t0)
      val history0 = s1.withColumn(Scd2.ValidFrom, t0)
        .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
      val s2 = s1.filter(col("customer_id") % 7 =!= 0)
        .withColumn("market_segment",
          when(col("customer_id") % 10 === 0
            || col("customer_id") % 10 === 5, lit("CHANGED"))
            .otherwise(col("market_segment")))
        .withColumn("updated_at",
          when(col("customer_id") % 10 === 0, tU).otherwise(t0))
      Scd2.mergeTimestamp(history0, s2, Seq("customer_id"),
          "updated_at", t1)
        .orderBy(col("customer_id"), col("valid_from"))
    }),

    // ---- ordered proximity search (r14 wave 24) ----
    // "table before scan within 5 tokens" over the memoized
    // positional index (probe-only timing, the posidx discipline);
    // the RangeJoin bucket trick in 1-D token space keeps candidates
    // per-bucket, never tf-quadratic
    "doc_proximity_search" -> ((s, d) => {
      import graft.operators.Search
      val store = graft.Stores.cached(s"posidx:$d") { dir =>
        Search.positionalFrame(Tables.documents(s, d), "doc_id", "text")
          .write.parquet(dir + "/t")
      } + "/t"
      Search.proximitySearch(s.read.parquet(store), "table", "scan",
          window = 5L)
        .select(col("id").as("doc_id"), col("n_matches"), col("first_pos"))
        .orderBy(col("doc_id"))
    }),

    // ---- incremental join-cardinality maintenance (r14 wave 24) ----
    // histograms are ADDITIVE sufficient statistics: the stored
    // pre-cutoff histogram folds the delta batch in at
    // O(delta + distinct keys) — the planner stats-maintenance
    // contract — and must answer exactly like the full recompute
    // (oracle = dq_join_cardinality's, verbatim)
    "dq_join_cardinality_incr" -> ((s, d) => {
      import graft.operators.Quality
      val ev = Tables.events(s, d)
      val cutoff = lit(CdcCutoff).cast("timestamp")
      val store = graft.Stores.cached(s"jchist:$d") { dir =>
        Quality.keyHistogram(ev.filter(col("ts") <= cutoff), "user_id")
          .write.parquet(dir + "/t")
      } + "/t"
      val merged = Quality.histogramMerge(s.read.parquet(store),
        Quality.keyHistogram(ev.filter(col("ts") > cutoff), "user_id"))
      Quality.joinCardinalityFromHistograms(merged,
        Quality.keyHistogram(Tables.customer(s, d), "c_custkey"))
    }),
  )
}
