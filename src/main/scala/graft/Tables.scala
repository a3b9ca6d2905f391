package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated star schema
  * (see /root/repo/TESTDATA.md).
  *
  * Each reader returns the raw DataFrame; callers `.select(...)` the
  * columns they need so Catalyst prunes the parquet scan (verify with
  * `.explain("formatted")` → `ReadSchema` shows only used columns).
  * At 100 TB the same code path works because pruning/pushdown happen
  * at the scan, not in the reader.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** events.parquet's `ts` arrives in one of two physical encodings
    * depending on the generator vintage: parquet TIMESTAMP(NANOS)
    * (readable only as int64 via the legacy `nanosAsLong` conf — no
    * Spark timestamp type holds nanos) or TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (Spark-native TimestampNTZType).
    * `eventsRaw` returns the STORED column unconverted in either
    * case — build cutoff predicates with [[eventCutoffNanos]] /
    * [[eventWatermark]] against it so they push down to the parquet
    * scan (filtering the CONVERTED column would scan the full table:
    * Catalyst won't push through `timestamp_micros`), then
    * [[convertEventTs]].
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame =
    try read(s, d, "events")
    catch { case _: Exception =>
      // legacy TIMESTAMP(NANOS) files: schema inference rejects the
      // type without the conf, so retry scoped (save/restore — the
      // inferred LongType is baked into the relation at read() time,
      // so restoring immediately is safe for later execution)
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try read(s, d, "events")
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** A literal for comparing against the STORED events `ts` column
    * (UTC-nanos semantics), typed to the column's physical encoding
    * so the predicate remains scan-pushable: int64 nanos for legacy
    * files, a TIMESTAMP_NTZ literal for µs-NTZ files.
    */
  def eventCutoffNanos(df: DataFrame, nanos: Long): Column = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(nanos, 1000000000L),
      Math.floorMod(nanos, 1000000000L).toInt, java.time.ZoneOffset.UTC)
    df.schema("ts").dataType match {
      case LongType         => lit(nanos)
      case TimestampNTZType => lit(ldt)
      case _ => lit(java.sql.Timestamp.valueOf(ldt))
    }
  }

  /** A staged-extract watermark string (Staging stores `max(ts)` via
    * `toString`) back to a comparable literal in the stored domain:
    * digits → int64 nanos, otherwise an ISO LocalDateTime → NTZ.
    */
  def eventWatermark(df: DataFrame, wm: String): Column =
    df.schema("ts").dataType match {
      case LongType         => lit(wm.toLong)
      case TimestampNTZType => lit(java.time.LocalDateTime.parse(wm))
      case _ => lit(java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(wm)))
    }

  /** Stored `ts` → session TimestampType, exact for µs-aligned
    * values: int64 nanos divide to µs; NTZ casts in the UTC session
    * (same instant — the stored wall clock IS UTC).
    */
  def convertEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  def events(s: SparkSession, d: String): DataFrame =
    convertEventTs(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
