package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dbt model layers (staging → dim → fact),
  * re-targeted at the driver's star schema.
  *
  * Reference models:
  *  - stg_users.sql / stg_savings_plan.sql — projection + rename
  *  - dim_users.sql — current rows + concat'd display name
  *  - dim_savings_plan.sql — plan LEFT JOIN users for denormalized dim
  *  - fact_savings_transaction.sql — txn LEFT JOIN plan dim
  *
  * Spark-first shape: only FIXED-cardinality dims (nation/region —
  * bounded by geography, tiny at any SF) carry an explicit
  * `broadcast()` hint. Data-proportional tables (customer, orders)
  * are joined WITHOUT a hint: an explicit hint is honored regardless
  * of size (it does NOT fall back), so at 100 TB it would OOM; with
  * no hint AQE picks broadcast vs shuffle from runtime stats — small
  * SFs still get the broadcast, big SFs degrade to a shuffle join.
  * Facts join dims on their natural keys.
  */
object Models {

  /** Staging model: rename/standardize raw columns
    * (reference: models/staging/stg_users.sql — `_Uid as user_id`,
    * `firstName as first_name`, ...).
    */
  def stgCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("c_nationkey").as("nation_id"),
      col("c_acctbal").as("account_balance"),
      col("c_mktsegment").as("market_segment"))

  /** Staging model with timezone conversion + incremental filter —
    * the exact shape of the reference's incremental staging model
    * (reference: models/staging/stg_savings_transaction.sql —
    * `toTimeZone(txn_timestamp, 'Africa/Lagos')`, rename, and the
    * `is_incremental()` block `WHERE updated_at > max(updated_at)`).
    * The cutoff filter runs on the STORED nanos column so it pushes
    * to the parquet scan (see Tables.eventsRaw).
    */
  def stgEvents(spark: SparkSession, dir: String, sinceNanos: Long): DataFrame = {
    val raw = Tables.eventsRaw(spark, dir)
    val incr = graft.operators.Cdc.incrementalFilter(
      raw, "ts", Tables.eventCutoffNanos(raw, sinceNanos))
    Tables.convertEventTs(incr).select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("value"),
      from_utc_timestamp(col("ts"), "Africa/Lagos").as("created_at"))
  }

  /** Staging model that CARRIES a soft-delete marker — the exact
    * shape of the reference's stg_savings_transaction.sql:21, which
    * selects `deleted_at` through staging (schema.yml: "timestamp
    * when the record was soft deleted") so marts can filter live
    * rows. The synthetic events source has no deleted_at column, so
    * the marker is derived deterministically: 'error' rows are the
    * tombstones (deleted_at = their event time), all others live.
    */
  def stgEventLog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("ts").as("created_at"),
      when(col("event_type") === "error", col("ts")).as("deleted_at"))

  /** Live rows of [[stgEventLog]] — the downstream-model view
    * (reference marts read staging WHERE deleted_at IS NULL).
    */
  def stgEventLogActive(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.softDeleteFilter(stgEventLog(spark, dir), "deleted_at")

  /** Denormalized customer dimension: customer ⋈ nation ⋈ region
    * (reference: models/marts/dim_users.sql enriches with display
    * columns — `concat(first_name, ' ', last_name) as full_name`;
    * here geography is the snowflake to flatten and the derived
    * display column is the name + segment label).
    * nation/region are broadcast — they are tiny at any SF.
    */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = stgCustomer(spark, dir)
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name").as("nation_name"),
        col("n_regionkey"))
    val r = Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name").as("region_name"))
    c.join(broadcast(n), c("nation_id") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(c("customer_id"), c("customer_name"),
        concat(c("customer_name"), lit(" ["), c("market_segment"), lit("]"))
          .as("display_name"),
        c("account_balance"), c("market_segment"),
        col("nation_name"), col("region_name"))
  }

  /** Order dimension enriched with its customer
    * (reference: models/marts/dim_savings_plan.sql — plan LEFT JOIN
    * dim_users on user_id, carrying customer_name/state into the dim).
    */
  def dimOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      col("o_orderstatus").as("order_status"),
      col("o_totalprice").as("total_price"),
      col("o_orderdate").as("order_date"),
      col("o_orderpriority").as("order_priority"))
    val c = dimCustomer(spark, dir)
      .select(col("customer_id"), col("customer_name"),
        col("market_segment"), col("nation_name"))
    // customer grows with the data — no broadcast hint; AQE broadcasts
    // it at small SF and shuffles on customer_id at 100 TB
    o.join(c, Seq("customer_id"), "left")
  }

  /** Fact table: line items joined to their order dim
    * (reference: models/marts/fact_savings_transaction.sql — txn LEFT
    * JOIN dim_savings_plan on plan_id, carrying user_id/product_type
    * into the fact). Derived revenue column mirrors the reference's
    * pattern of computing metrics at fact build time.
    */
  def factLineitem(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_number"),
      col("l_partkey").as("part_id"),
      col("l_suppkey").as("supplier_id"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("extended_price"),
      col("l_discount").as("discount"),
      col("l_shipdate").as("ship_date"))
    val o = dimOrder(spark, dir).select(
      col("order_id"), col("customer_id"), col("order_status"),
      col("order_date"))
    // orders:lineitem ~ 1:4 — both large at 100 TB → shuffle hash /
    // sort-merge on order_id (AQE decides); no broadcast of orders.
    l.join(o, Seq("order_id"), "left")
      // decimal-first so the cent rounding is exact (see Analytics.dec2)
      .withColumn("revenue",
        (col("extended_price").cast("decimal(12,2)")
          * (lit(1) - col("discount").cast("decimal(12,2)"))).cast("double"))
  }

  /** Late-arriving-dimension handling (Kimball "inferred members"):
    * fact rows can reference dimension keys the dim feed hasn't
    * delivered yet (the reference's Mongo-sourced users lag its
    * Postgres facts — no timestamps to order the loads by). Dropping
    * the facts loses revenue; null-joining them loses drill-down. The
    * standard fix: mint PLACEHOLDER dim rows for the missing keys —
    * attribute defaults + an `is_inferred` flag — so fact loads join
    * clean and the real attributes overwrite the placeholder when the
    * dim catches up (an [[graft.operators.Cdc.upsert]] keyed on the
    * dim key).
    *
    * Plan: the fact side reduces to DISTINCT keys FIRST (one key
    * shuffle of the key projection, never fact rows), anti-joins the
    * dim (delta-sized), and placeholder rows union on. Output is the
    * dim schema + `is_inferred`.
    */
  def inferredMembers(dim: DataFrame, fact: DataFrame, dimKey: String,
                      factKey: String,
                      defaults: Map[String, Column]): DataFrame = {
    val missing = fact.select(col(factKey).as(dimKey)).filter(col(dimKey).isNotNull)
      .distinct()
      .join(dim.select(col(dimKey)), Seq(dimKey), "left_anti")
    val placeholders = dim.columns.foldLeft(missing) { (df, c) =>
      if (c == dimKey) df
      else df.withColumn(c, defaults.getOrElse(c, lit(null)))
    }.select(dim.columns.map(col): _*)
    dim.withColumn("is_inferred", lit(false))
      .unionByName(placeholders.withColumn("is_inferred", lit(true)))
  }

  /** Calendar date-spine dimension — the dbt-utils `date_spine` /
    * Kimball `dim_date` every warehouse keys its facts to: one row
    * per day covering the fact table's observed range, with the
    * standard attributes precomputed so queries never re-derive
    * them. Built IN-PLAN from the fact's min/max (a 1-row aggregate
    * exploded through `sequence` — no driver round-trip), so the
    * spine tracks the data automatically.
    *
    * Cross-engine date hygiene: iso_dow comes from integer
    * epoch-day arithmetic ((days-since-1970-01-01 + 3) mod 7 + 1 —
    * 1970-01-01 was a Thursday), NOT from the engines' divergent
    * dayofweek conventions; week_index is integer Mondays-since-
    * 1970-01-05 (the growthAccounting discipline); month-end tests
    * month(d+1) ≠ month(d). A date spine is calendar-bounded
    * (decades ≈ 10⁴ rows) — broadcast it to every fact join.
    */
  def dimDate(facts: DataFrame, dateCol: String): DataFrame = {
    val bounds = facts.agg(min(col(dateCol).cast("date")).as("__lo"),
      max(col(dateCol).cast("date")).as("__hi"))
    val days = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__d"))
    val ep = datediff(col("__d"), lit("1970-01-01").cast("date"))
    val isoDow = pmod(ep + lit(3), lit(7)) + lit(1)
    days.select(
      col("__d").cast("timestamp").as("day_ts"),
      (year(col("__d")) * 10000 + month(col("__d")) * 100
        + dayofmonth(col("__d"))).as("date_key"),
      year(col("__d")).as("year"),
      quarter(col("__d")).as("quarter"),
      month(col("__d")).as("month"),
      dayofmonth(col("__d")).as("day_of_month"),
      isoDow.as("iso_dow"),
      (isoDow >= 6).as("is_weekend"),
      (month(date_add(col("__d"), 1)) =!= month(col("__d")))
        .as("is_month_end"),
      (datediff(date_trunc("week", col("__d").cast("timestamp"))
        .cast("date"), lit("1970-01-05").cast("date")) / 7)
        .cast("long").as("week_index"))
  }
}
