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
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (µs) does not accept directly. `eventsRaw`
    * exposes the stored int64 nanos (`nanosAsLong`) — predicates on it
    * push down to the parquet scan, which `events`'s converted column
    * cannot (Catalyst won't push through `timestamp_micros`). Filter
    * raw, then `convertEventTs`.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    // scope the legacy conf to this read (save/restore, mirroring
    // Sink.overwritePartitions) so a shared session doesn't silently
    // type every later nanos-timestamp parquet as long. The conf is
    // consumed during schema inference inside read() and the inferred
    // LongType is baked into the relation, so restoring immediately is
    // safe — execution reads INT64 into the already-fixed long schema
    // (verified: count + a second read both succeed after restore).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try read(s, d, "events")
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** int64-nanos `ts` → TimestampType, exact for µs-aligned values. */
  def convertEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts DIV 1000")))

  def events(s: SparkSession, d: String): DataFrame =
    convertEventTs(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
