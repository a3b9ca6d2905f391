package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source readers — the Spark-first stand-in for the
  * reference's extractors (reference:
  * dagster_code/clickhouse_load_tool/postgres_loader.py `extract_data`
  * and mongo_loader.py — driver-paged reads into a warehouse). In
  * Spark the extract IS the scan: schema is enforced at read, and
  * incremental extraction is a pushed-down predicate, not a paged
  * loop.
  *
  * All readers take an explicit schema: schema inference reads the
  * data twice and can silently drift between runs — never acceptable
  * for a 100 TB CDC source.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — Spark-native columnar alternative; same pushdown/pruning
    * behavior as parquet, schema enforced.
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Incremental extract from any source: rows with tracking column
    * beyond the watermark (reference postgres_loader.py builds
    * `WHERE tracking_column > last_value`). The predicate reaches the
    * scan for columnar sources — see Tables.eventsRaw for the
    * stored-column rule.
    */
  def incremental(df: DataFrame, trackingCol: String, lastValue: Column): DataFrame =
    graft.operators.Cdc.incrementalFilter(df, trackingCol, lastValue)
}
