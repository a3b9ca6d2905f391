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
  )
}
