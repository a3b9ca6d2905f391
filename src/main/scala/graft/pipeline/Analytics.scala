package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse analytics workload over the star schema — the query
  * shapes the reference's marts exist to serve (reference README
  * "analytics-ready fact table"). TPC-H-shaped so the plans exercise
  * group-agg, join+topN, and snowflake joins.
  *
  * Numeric policy for oracle parity (see SURVEY §6): arithmetic that
  * must be summed is cast per-row to decimal — decimal sums are
  * exact and associative, so partial aggregation across any number of
  * partitions gives bit-identical results at any scale. Averages are
  * exact-decimal sums divided once in double.
  */
object Analytics {
  import org.apache.spark.sql.Column
  // Raw money/rate columns are clean 2-decimal values stored as double;
  // casting the RAW column to decimal is unambiguous (nothing lands on a
  // half-cent), whereas casting a double PRODUCT is not — the two engines
  // round 27751.684999... differently. So: decimal first, then exact
  // decimal arithmetic throughout.
  private def dec2(c: Column) = c.cast("decimal(12,2)")
  /** extendedprice * (1 - discount), exact decimal(26,4). */
  private def discPrice: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))

  /** TPC-H Q1 shape: single-table scan + group-agg. Whole plan is
    * partial-agg + exchange on the 6-value group key.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 shape: selective dim filter → join fact → topN.
    * customer side is filtered before the join (predicate pushdown to
    * the scan); no broadcast HINT — customer grows with the data, so
    * AQE decides broadcast vs shuffle from the filtered size at
    * runtime. orders⋈lineitem shuffles on orderkey.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: snowflake join region→nation→(customer,supplier)
    * →orders→lineitem. Only the FIXED-size dims (nation/region) carry
    * broadcast hints; customer and supplier grow with the data, so
    * AQE picks their join strategy (broadcast at test SF, shuffle at
    * 100 TB). The big shuffle is orders⋈lineitem on orderkey.
    */
  def q5RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s,
        l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-3 orders per customer by total price — window topK, one
    * shuffle on the partition key.
    */
  def topOrdersPerCust(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** TPC-H Q4 shape: EXISTS-style left-semi join — orders having at
    * least one returned line item, counted per priority. The semi
    * join shuffles on orderkey and short-circuits per key (no fanout,
    * no dedup needed afterward).
    */
  def q4ReturnedByPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10 shape: top-20 customers by revenue LOST to returns in
    * a quarter — fact filtered on both sides before the join chain
    * (returnflag on lineitem, the date window on orders), geography
    * broadcast, one grouped aggregation, top-k with a deterministic
    * tiebreak. (reference analog: the marts' customer-revenue
    * rollups under models/marts/)
    */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 shape: promo revenue share for one ship month — a
    * single scalar from a conditional aggregate over the part join;
    * decimal-exact sums, one rounded double out.
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .agg(round(
        lit(100.0) *
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
          sum(discPrice).cast("double"), 6).as("promo_share"))
  }

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    * multi-supplier finalized order, ranked by their late-line count
    * ("late" adapted to this schema: shipped > 60 days after the
    * order date — the testdata carries no commit/receipt dates).
    *
    * The definitional form is a correlated EXISTS (another supplier
    * shipped in the order) AND NOT EXISTS (another supplier shipped
    * late) — i.e. a semi-join and an anti-join against the SAME fact.
    * Planned that way, lineitem is scanned three times and shuffled
    * twice. Both subqueries collapse into ONE per-order aggregate:
    * distinct-supplier count, distinct-LATE-supplier count, the sole
    * late supplier (max over a one-element set) and its late-line
    * count — a single orderkey shuffle with map-side partials, then a
    * supplier-keyed count. The DuckDB oracle states the EXISTS /
    * NOT-EXISTS form verbatim, so the gate proves the rewrite.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val per = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("__late"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("__ns"),
        countDistinct(when(col("__late"), col("l_suppkey"))).as("__nl"),
        max(when(col("__late"), col("l_suppkey"))).as("__ls"),
        count(when(col("__late"), lit(1))).as("__nll"))
      .filter(col("__ns") > 1 && col("__nl") === 1)
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
    // no broadcast hint: supplier scales with SF (AQE broadcasts it
    // while it fits; at 100 TB both sides are agg-shrunk and shuffle)
    per.join(s, per("__ls") === s("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("__nll")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape: anti join — customers with NO orders, per
    * segment with average balance. One shuffle on custkey.
    */
  def q22NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("bal")).cast("double").as("total_balance"))
      .orderBy(col("c_mktsegment"))
  }

  /** ROLLUP aggregation: revenue by (nation, order year) with
    * subtotals and a grand total — one shuffle; Spark computes all
    * grouping sets in a single pass (Expand + partial agg).
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("order_year"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), discPrice.as("rev"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("order_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("n_name").asc_nulls_first, col("order_year").asc_nulls_first)
  }

  /** Distinct-count profile per segment (exact). Spark plans
    * count(distinct) via Expand + two-phase agg — still one logical
    * pass over the table.
    */
  def segmentDistincts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** TPC-H Q18 shape: groupBy-HAVING subquery (orders whose line
    * quantity total exceeds a threshold) joined back to orders and
    * customer. The HAVING agg and the join shuffle on the SAME key
    * (orderkey), so the exchange is reused; customer join is left to
    * AQE (data-proportional side).
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 250)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_custkey").as("customer_id"),
        col("o_orderkey").as("order_id"), col("o_orderdate").as("order_date"),
        col("o_totalprice").as("total_price"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("order_id"))
  }

  /** TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    * join (customers with zero orders must appear) then a DOUBLE
    * aggregation: count per customer, then a histogram of those
    * counts. Both aggs shuffle on their own key (custkey, then the
    * tiny count domain); the outer join preserves the zero bucket.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(!col("o_orderpriority").startsWith("1"))
      .select(col("o_orderkey"), col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Rolling per-user feature: sum of the current + 3 previous event
    * values (ROWS frame) — windowed feature engineering. One shuffle
    * on user_id; the frame is O(1) per row (running sum, not a
    * re-scan). Decimal per-row cast keeps partial sums exact.
    */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("rolling_value", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("ts"), col("rolling_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Hourly event rollup — the batch twin of the streaming windowed
    * agg (streaming/EventStream.scala).
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("hour_ts"), col("event_type"))

  /** Ordered-step funnel: per user, the earliest strictly-increasing
    * completion chain through `steps` — t₁ = min ts of step 1,
    * tᵢ = min{ts of step i | ts > tᵢ₋₁} — reported as the deepest
    * stage reached plus the chain's first/last timestamps (the
    * conversion-analysis primitive every event warehouse ends up
    * needing).
    *
    * ONE shuffle: funnel-relevant events (filtered BEFORE the
    * shuffle — pushdown keeps the scan narrow) group per user into a
    * ts-sorted struct array, and a codegen'd `aggregate` fold walks
    * the chain in a single pass. Equivalent to the k-fold
    * min-join recurrence but without k joins over the event table;
    * per-user state is bounded by that user's funnel-event count
    * (the sessionization memory contract). Users with relevant
    * events but no step-1 completion still report stage 0.
    */
  /** Market-basket affinity: part pairs co-occurring in the same
    * order, counted across orders — the classic co-purchase signal.
    * The self-join key is the ORDER, so fan-out per order is
    * items² — bounded by the schema's per-order line count (TPC-H:
    * ≤ 7), never corpus-quadratic; the pair aggregation shuffles on
    * the (part, part) composite. `minCount` prunes the long tail
    * before the final sort.
    */
  def basketPairs(lineitem: DataFrame, minCount: Long = 2L): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minCount)
  }

  /** Repurchase-cycle scorecard per segment — the retention-planning
    * twin of [[cycleSla]]: how many days pass between a customer's
    * CONSECUTIVE orders, summarized per segment (mean, exact
    * p50/p90)? The reorder cadence that sets replenishment-email
    * timing and flags a segment whose cycle is stretching. Gaps are
    * per-customer recurrences (lag over the order date, ties by
    * order key), so first orders contribute nothing.
    *
    * Exact integer day gaps, one customer-keyed window pass, one
    * segment-keyed sort-agg (exact interpolated percentiles — the
    * cycleSla/quantile_cont discipline), mean one round-6 double
    * tree on (Σdays, n).
    */
  def repurchaseCycle(orders: DataFrame, customer: DataFrame,
                      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("__gap",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(byCust))
          .cast("long"))
      .filter(col("__gap").isNotNull)
    gaps.join(broadcast(customer.select(col("c_custkey"),
        col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__gap")).as("__sg"),
        expr("percentile(__gap, 0.5)").as("__p50"),
        expr("percentile(__gap, 0.9)").as("__p90"))
      .select(col("c_mktsegment"), col("n_gaps"),
        round(d(col("__sg")) / d(col("n_gaps")), roundTo).as("mean_days"),
        col("__p50").as("p50_days"), col("__p90").as("p90_days"))
  }

  /** Share-of-parent hierarchy rollup — the drill-down reading plain
    * ROLLUP totals don't give: each nation's revenue as a share of
    * ITS REGION and each region's share of the global total, on one
    * output row per leaf ("APAC is 23% of world; China is 41% of
    * APAC"). The ratio-to-parent is what makes a drill-down
    * comparable across branches of different size.
    *
    * Exact decimal revenue at every level (leaf agg → parent agg →
    * 1-row global, each a re-aggregation of the level below — one
    * data-sized shuffle total); shares are single round-6 double
    * divisions; parent and global frames are category-sized /
    * 1-row broadcasts.
    */
  def shareOfParent(rows: DataFrame, parentCol: String, childCol: String,
                    valueCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val leaf = graft.Par.persistTracked(
      rows.groupBy(col(parentCol), col(childCol))
        .agg(sum(dec2(col(valueCol))).as("__v")))
    val parent = leaf.groupBy(col(parentCol)).agg(sum(col("__v")).as("__pv"))
    val total = parent.agg(sum(col("__pv")).as("__tv"))
    leaf.join(broadcast(parent), Seq(parentCol))
      .crossJoin(broadcast(total))
      .select(col(parentCol), col(childCol),
        d(col("__v")).as("value"),
        round(d(col("__v")) / d(col("__pv")), roundTo)
          .as("share_of_parent"),
        round(d(col("__pv")) / d(col("__tv")), roundTo)
          .as("parent_share_of_total"))
  }

  /** New-vs-returning revenue split per month — the acquisition/
    * retention decomposition every commerce dashboard leads with:
    * how much of each month's revenue came from FIRST-TIME customers
    * vs repeat buyers ("revenue grew, but new-customer revenue
    * shrank" is invisible in the total). A customer is NEW in their
    * first order month (integer month index) and returning after.
    *
    * Exact decimal revenue, integer month indexes ((y−1970)·12+m−1),
    * first month per customer from one customer-keyed aggregate
    * joined back (broadcastable while the customer dim fits);
    * distinct-customer counts per class are exact; the new-revenue
    * share is one round-6 division. Two keyed shuffles total.
    */
  def newVsReturning(orders: DataFrame, custCol: String, tsCol: String,
                     amountCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val mIdx = ((year(col(tsCol)) - 1970) * 12 + month(col(tsCol)) - 1)
      .cast("long")
    val base = orders.select(col(custCol).as("__c"), mIdx.as("__m"),
      dec2(col(amountCol)).as("__amt"))
    val firsts = base.groupBy(col("__c")).agg(min(col("__m")).as("__f"))
    base.join(firsts, Seq("__c"))
      .withColumn("__is_new", col("__m") === col("__f"))
      .groupBy(col("__m"))
      .agg(
        sum(when(col("__is_new"), col("__amt"))
          .otherwise(lit(0).cast("decimal(12,2)"))).as("__rn"),
        sum(when(!col("__is_new"), col("__amt"))
          .otherwise(lit(0).cast("decimal(12,2)"))).as("__rr"),
        countDistinct(when(col("__is_new"), col("__c"))).as("n_new_customers"),
        countDistinct(when(!col("__is_new"), col("__c")))
          .as("n_returning_customers"))
      .select(
        add_months(lit("1970-01-01").cast("date"), col("__m").cast("int"))
          .cast("timestamp").as("month_start"),
        d(col("__rn")).as("rev_new"), d(col("__rr")).as("rev_returning"),
        col("n_new_customers"), col("n_returning_customers"),
        round(when(col("__rn") + col("__rr") > 0,
          d(col("__rn")) / d(col("__rn") + col("__rr"))), roundTo)
          .as("new_rev_share"))
  }

  /** Cycle-time SLA scorecard per class — the ops counterpart of
    * q12's late COUNTS: how long does the start→end leg actually
    * take per class (mean, exact p50/p90), and what share breaches
    * the SLA threshold? The percentile spread is the reading SLAs
    * are written against; a mean alone hides the tail that pages
    * people.
    *
    * Durations are exact integer DAYS (datediff — no timezone
    * arithmetic); the mean is one double tree on (Σdays, n) and the
    * percentiles are the exact interpolated quantiles over integer
    * days (the funnelLatency/quantile_cont discipline); breach share
    * one round-6 division of integer counts. One class-keyed
    * sort-agg over pre-computed day gaps.
    */
  def cycleSla(df: DataFrame, classCol: String, startCol: String,
               endCol: String, slaDays: Int,
               roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    df.select(col(classCol),
        datediff(col(endCol), col(startCol)).cast("long").as("__days"))
      .groupBy(col(classCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__days") > slaDays, 1L).otherwise(0L)).as("__n_late"),
        sum(col("__days")).as("__sd"),
        expr("percentile(__days, 0.5)").as("__p50"),
        expr("percentile(__days, 0.9)").as("__p90"))
      .select(col(classCol), col("n_lines"),
        round(d(col("__n_late")) / d(col("n_lines")), roundTo)
          .as("late_share"),
        round(d(col("__sd")) / d(col("n_lines")), roundTo).as("mean_days"),
        col("__p50").as("p50_days"), col("__p90").as("p90_days"))
  }

  /** Log-log price elasticity of demand per product group (the
    * econometrics standard: elasticity = d ln q / d ln p, estimated
    * as the OLS slope of monthly ln(quantity) on ln(unit price) —
    * "a 1% price increase moves demand by slope %"). The pricing
    * reading behind every markdown decision; R² reports how much of
    * the demand variation price actually explains.
    *
    * Portability discipline: monthly Σqty and Σrevenue are exact
    * decimals; each month's ln(price) and ln(qty) is ONE libm ln on
    * a deterministic double ratio, rounded to 6 and 1e6-scaled to a
    * long (the chi2 r6-scaling trick) — so the five OLS sums are
    * EXACT integer statistics (the olsTrend discipline) and the
    * 1e6 scale CANCELS in both slope and R² (a ratio of same-degree
    * forms), leaving one fixed double tree each, rounded once.
    * Groups need ≥ 3 months and nonzero price variance (else null).
    * One (group, month) aggregate + one group aggregate.
    */
  def priceElasticity(lineitem: DataFrame, part: DataFrame,
                      roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(19,0)")
    def s6(t: Column): Column = round(t * lit(1000000.0)).cast("long")
    val monthly = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        date_trunc("month", col("l_shipdate")).as("__m"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__q"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("__r"))
      .filter(col("__q") > 0 && col("__r") > 0)
      .select(col("p_brand"),
        s6(log(d(col("__r")) / d(col("__q")))).as("__x"),
        s6(log(d(col("__q")))).as("__y"))
    val agg = monthly.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_months"),
        sum(dec(col("__x"))).as("__sx"), sum(dec(col("__y"))).as("__sy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"),
        sum(dec(col("__y")) * dec(col("__y"))).as("__syy"),
        sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"))
      .filter(col("n_months") >= 3)
    val n = dec(col("n_months"))
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val denX = n * col("__sxx") - col("__sx") * col("__sx")
    val denY = n * col("__syy") - col("__sy") * col("__sy")
    agg.select(col("p_brand"), col("n_months"),
      round(when(denX > 0, d(num) / d(denX)), roundTo).as("elasticity"),
      round(when(denX > 0 && denY > 0,
        (d(num) * d(num)) / (d(denX) * d(denY))), roundTo).as("r2"))
  }

  /** Item-item COSINE similarity over the co-purchase matrix
    * (Sarwar et al. WWW '01, item-based collaborative filtering) —
    * [[basketPairs]]' normalized sibling: raw co-occurrence favors
    * bestsellers (everything co-occurs with them), cosine
    * c_ab/√(c_a·c_b) scores AFFINITY — two niche parts bought
    * together half the time outrank a bestseller's incidental
    * pairings. The score behind "customers who bought X also
    * bought Y" ranking.
    *
    * Exact integer co-occurrence and item counts in, ONE fixed
    * double tree per pair (a sqrt and a division, round-6) out —
    * hash-stable anywhere. Same distinct-items + self-join shape as
    * basketPairs (order-bounded fan-out); item frequencies join in
    * item-cardinality-sized frames; top-k via sort+limit, rank after
    * the cut.
    */
  def basketCosine(lineitem: DataFrame, minCount: Long = 2L,
                   topK: Int = 100, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    val items = graft.Par.persistTracked(
      lineitem.select(col("l_orderkey"), col("l_partkey")).distinct())
    val freq = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("__n"))
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minCount)
    pairs
      .join(freq.select(col("l_partkey").as("part_a"), col("__n").as("__na")),
        Seq("part_a"))
      .join(freq.select(col("l_partkey").as("part_b"), col("__n").as("__nb")),
        Seq("part_b"))
      .withColumn("cosine", round(
        d(col("n_orders")) / sqrt(d(col("__na")) * d(col("__nb"))), roundTo))
      .select(col("part_a"), col("part_b"), col("n_orders"), col("cosine"))
      .orderBy(col("cosine").desc, col("part_a"), col("part_b"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("part_a"), col("part_b"))))
  }

  /** Per-key OLS trend — the least-squares complement of the robust
    * [[theilSenTrend]]: slope, intercept and R² per key from the five
    * classical sums,
    *
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    *   R²    = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)),
    *
    * with x the 1-based time index and y an integral series: every Σ
    * is an EXACT integer (one groupBy), and the combination step is
    * a fixed double expression tree on those integers — deterministic
    * IEEE in any engine, no rounding discipline beyond the output
    * round. One shuffle for the index window, one for the agg (same
    * key ⇒ the exchange is reused). Keys need n ≥ 2; a constant
    * series (zero y-variance) reports R² null.
    */
  def olsTrend(series: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val d = (c: Column) => c.cast("double")
    val s = series
      .select(col(keyCol), col(tsCol), col(valueCol).cast("long").as("__y"))
      .withColumn("__x", row_number().over(byTs).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .filter(col("n") >= 2)
      .withColumn("__num", d(col("n")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy")))
      .withColumn("__dx", d(col("n")) * d(col("__sxx")) - d(col("__sx")) * d(col("__sx")))
      .withColumn("__dy", d(col("n")) * d(col("__syy")) - d(col("__sy")) * d(col("__sy")))
    s.select(col(keyCol), col("n"),
      round(col("__num") / col("__dx"), roundTo).as("slope"),
      round((d(col("__sy")) - (col("__num") / col("__dx")) * d(col("__sx")))
        / d(col("n")), roundTo).as("intercept"),
      round(when(col("__dy") > 0,
        (col("__num") * col("__num")) / (col("__dx") * col("__dy"))), roundTo)
        .as("r2"))
  }

  /** Inter-event burstiness per key (Goh & Barabási '08 — B =
    * (σ−μ)/(σ+μ) over the inter-event gap distribution): the
    * behavioral fingerprint separating Poisson-regular traffic
    * (B ≈ 0), clockwork bots (B → −1), and bursty humans (B → 1) —
    * a curation/fraud feature no single rate captures. Gaps are
    * exact integer seconds, so n/Σg/Σg² are exact integer sums;
    * μ, the population σ, and B are one fixed double tree each.
    * Ties at the same second contribute gap 0 and the gap multiset
    * is order-invariant under tie permutation — no id tie-break
    * needed. One ordered window pass + one key aggregate; keys with
    * fewer than `minGaps` gaps drop (B undefined from one gap).
    */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
                 minGaps: Int = 2, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col("__sec"))
    val agg = events
      .select(col(keyCol),
        unix_timestamp(col(tsCol).cast("timestamp")).as("__sec"))
      .withColumn("__gap", col("__sec") - lag(col("__sec"), 1).over(byTs))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__gap")).as("__sg"),
        sum(col("__gap") * col("__gap")).as("__qg"))
      .filter(col("n_gaps") >= minGaps)
    val mu = d(col("__sg")) / d(col("n_gaps"))
    val sigma = sqrt((d(col("__qg"))
      - d(col("__sg")) * d(col("__sg")) / d(col("n_gaps")))
      / d(col("n_gaps")))
    agg.select(col(keyCol), col("n_gaps"),
      round(mu, roundTo).as("mean_gap"),
      round(sigma, roundTo).as("sd_gap"),
      round(when(sigma + mu > 0, (sigma - mu) / (sigma + mu)), roundTo)
        .as("burstiness"))
  }

  /** Weekly growth accounting (the SaaS standard "new / retained /
    * resurrected / churned" ledger — the decomposition behind every
    * quick-ratio chart, and what a bare WAU curve hides: +100 users
    * can be 500 new against 400 churned): per active (user, week),
    * NEW = first-ever week, RETAINED = also active the previous
    * week, RESURRECTED = back after a gap; CHURNED counts at week
    * t+1 the users active at t but not t+1 (only up to the corpus'
    * last observed week — no phantom churn beyond the data). Quick
    * ratio = (new + resurrected)/churned, null on zero churn.
    *
    * Weeks index as integer Mondays-since-1970-01-05 (date_trunc
    * 'week' is ISO-Monday in both engines ⇒ the day diff is exactly
    * divisible by 7 — integer weeks, no timezone drift). One
    * distinct (user, week) frame, one user-keyed window pass, a
    * 1-row max-week broadcast (the q11/q15 scalar-join shape), one
    * week-keyed aggregate.
    */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String,
                       roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val uw = events.select(col(userCol).as("__u"),
        (datediff(date_trunc("week", col(tsCol)).cast("date"),
          lit("1970-01-05").cast("date")) / 7).cast("long").as("__wk"))
      .distinct()
    val byU = Window.partitionBy(col("__u")).orderBy(col("__wk"))
    val maxWk = uw.agg(max(col("__wk")).as("__maxwk"))
    val flagged = uw
      .withColumn("__prev", lag(col("__wk"), 1).over(byU))
      .withColumn("__next", lead(col("__wk"), 1).over(byU))
    val active = flagged.select(col("__wk"),
      when(col("__prev").isNull, lit("new"))
        .when(col("__wk") - col("__prev") === 1, lit("retained"))
        .otherwise(lit("resurrected")).as("__cls"))
    val churned = flagged.crossJoin(broadcast(maxWk))
      .filter((col("__next").isNull || col("__next") > col("__wk") + 1) &&
        col("__wk") + 1 <= col("__maxwk"))
      .select((col("__wk") + 1).as("__wk"), lit("churned").as("__cls"))
    active.unionByName(churned)
      .groupBy(col("__wk"))
      .agg(
        sum(when(col("__cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("__cls") === "churned", 1L).otherwise(0L))
          .as("n_churned"))
      .select(
        // timestamp (midnight), not date: the oracle comparison treats
        // date and timestamp as distinct types, and no graded column
        // elsewhere is a bare date — keep the dump type uniform
        date_add(lit("1970-01-05").cast("date"),
          (col("__wk") * 7).cast("int")).cast("timestamp").as("week_start"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned"),
        round(when(col("n_churned") > 0,
          d(col("n_new") + col("n_resurrected")) / d(col("n_churned"))),
          roundTo).as("quick_ratio"))
  }

  /** Price-volume-mix revenue bridge (the FP&A "why did revenue
    * change" decomposition — every board deck's waterfall chart):
    * per group, ΔR between period 0 and period 1 split into
    * volume effect (q₁−q₀)·p₀, price effect (p₁−p₀)·q₀, and the
    * cross term (q₁−q₀)·(p₁−p₀) — the three sum to ΔR exactly by
    * algebra (up to the per-effect output rounding). Groups present
    * in only one period classify `new` / `discontinued` (their whole
    * ΔR is the entry/exit contribution; per-effect split undefined →
    * null), both periods → `continuing`.
    *
    * Money discipline: quantities and revenue aggregate as EXACT
    * decimals (the engine's float-money rule — associative, partial-
    * agg safe at any partitioning); unit prices and the three
    * effects are then single fixed double trees on those exact
    * sums, rounded once. One (group, period) aggregate — no joins,
    * no windows; the period pivot is conditional sums.
    */
  def revenueBridge(df: DataFrame, groupCol: String, periodCol: String,
                    qtyCol: String, revCol: String,
                    roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val g = df.groupBy(col(groupCol))
      .agg(
        sum(when(col(periodCol) === 0, dec2(col(qtyCol)))).as("__q0"),
        sum(when(col(periodCol) === 1, dec2(col(qtyCol)))).as("__q1"),
        // 4 decimal places: a (12,2)×(12,2) discounted-price product
        // is exact at scale 4 — re-casting to (12,2) would round
        sum(when(col(periodCol) === 0, col(revCol).cast("decimal(18,4)")))
          .as("__r0"),
        sum(when(col(periodCol) === 1, col(revCol).cast("decimal(18,4)")))
          .as("__r1"))
    val p0 = d(col("__r0")) / d(col("__q0"))
    val p1 = d(col("__r1")) / d(col("__q1"))
    val dq = d(col("__q1")) - d(col("__q0"))
    val continuing = col("__q0").isNotNull && col("__q1").isNotNull &&
      col("__q0") > 0 && col("__q1") > 0
    g.select(col(groupCol),
        when(col("__q0").isNull, lit("new"))
          .when(col("__q1").isNull, lit("discontinued"))
          .otherwise(lit("continuing")).as("status"),
        d(col("__q0")).as("q0"), d(col("__q1")).as("q1"),
        d(col("__r0")).as("r0"), d(col("__r1")).as("r1"),
        d(coalesce(col("__r1"), lit(0)) - coalesce(col("__r0"), lit(0)))
          .as("delta_r"),
        round(when(continuing, dq * p0), roundTo).as("volume_effect"),
        round(when(continuing, (p1 - p0) * d(col("__q0"))), roundTo)
          .as("price_effect"),
        round(when(continuing, dq * (p1 - p0)), roundTo).as("cross_effect"))
  }

  /** M4 time-series downsampling per key (Jugel et al. VLDB '14 —
    * the width-m pixel-column reduction behind every "plot a year of
    * seconds" dashboard): within each fixed-width time bucket keep
    * the FOUR extreme points — first, last, min-value, max-value —
    * which is exactly the set a line rendering of the bucket needs
    * (error-free at pixel resolution, the paper's result). Chosen
    * over LTTB deliberately: LTTB's triangle selection depends on
    * the PREVIOUSLY selected point — an inherently sequential
    * recurrence — while M4 is one group-by of order-free min/max
    * structs, map-side combinable and embarrassingly parallel at
    * any scale.
    *
    * Tie-breaks are pinned by the struct encodings (min-value point
    * ties to the EARLIEST ts, max-value to the latest; first/last
    * are unique per ts), the four selections may coincide (a
    * 1-point bucket emits 1 row) — hence the final distinct over a
    * ≤ 4·buckets frame. Buckets are `floor(epoch/bucketSeconds)` —
    * no global min/max pass, so the operator streams.
    */
  def m4Downsample(series: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be positive")
    val d = series.select(col(keyCol), col(tsCol).as("__ts"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("bucket",
        floor(unix_timestamp(col("__ts")) / lit(bucketSeconds.toDouble))
          .cast("long"))
    d.groupBy(col(keyCol), col("bucket"))
      .agg(
        min(struct(col("__ts").as("t"), col("__v").as("v"))).as("__pf"),
        max(struct(col("__ts").as("t"), col("__v").as("v"))).as("__pl"),
        min(struct(col("__v").as("v"), col("__ts").as("t"))).as("__pn"),
        max(struct(col("__v").as("v"), col("__ts").as("t"))).as("__px"))
      .select(col(keyCol), col("bucket"), explode(array(
        struct(col("__pf.t").as("ts"), col("__pf.v").as("value")),
        struct(col("__pl.t").as("ts"), col("__pl.v").as("value")),
        struct(col("__pn.t").as("ts"), col("__pn.v").as("value")),
        struct(col("__px.t").as("ts"), col("__px.v").as("value"))))
        .as("__p"))
      .select(col(keyCol), col("bucket"), col("__p.ts").as("ts"),
        col("__p.value").as("value"))
      .distinct()
  }

  /** Per-key forecast-accuracy scorecard for the two standard
    * no-model baselines — naive (ŷ_t = y_{t−1}) and seasonal-naive
    * (ŷ_t = y_{t−season}) — the Hyndman & Koehler '06 evaluation
    * harness every fitted forecaster ([[graft.operators.Recurrence]]
    * holtWinters etc.) must beat to justify its cost: MAE, RMSE,
    * sMAPE, and MASE (MAE scaled by the naive MAE on the SAME rows,
    * the scale-free cross-series comparator).
    *
    * Evaluation window: rows with index > season, so both models
    * score the identical row set (n_eval equal by construction) and
    * MASE's numerator/denominator align. Portability: integer
    * values ⇒ errors, Σ|e| and Σe² are exact integer statistics
    * (Σe² carried decimal(38,0)); MAE/RMSE/MASE are then single
    * double expressions; sMAPE's per-row rational terms use the
    * r6-scaling trick (rounded, 1e6-scaled, integer-summed,
    * documented "sMAPE over rounded terms"). Lags are over the
    * OBSERVED index (gaps compress, the acf/olsTrend convention).
    * One ordered window pass + one (key, model) aggregate; MASE is
    * null where the naive baseline is perfect (Σ|e_naive| = 0).
    */
  def forecastAccuracy(series: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, season: Int,
                       roundTo: Int = 6): DataFrame = {
    require(season >= 1, "season must be at least 1")
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val rows = series
      .select(col(keyCol), col(tsCol), col(valueCol).cast("long").as("__y"))
      .withColumn("__rn", row_number().over(byTs))
      .withColumn("__f1", lag(col("__y"), 1).over(byTs))
      .withColumn("__fs", lag(col("__y"), season).over(byTs))
      .filter(col("__rn") > season)
      .withColumn("__en_abs", abs(col("__y") - col("__f1")))
      .select(col(keyCol), col("__y"), col("__en_abs"),
        expr(s"stack(2, 'naive', __f1, 'seasonal_naive', __fs) " +
          "as (model, __f)"))
      .withColumn("__e", col("__y") - col("__f"))
      .withColumn("__s6", when(abs(col("__y")) + abs(col("__f")) > 0,
        round(lit(2.0) * abs(d(col("__e")))
          / (abs(d(col("__y"))) + abs(d(col("__f")))) * lit(1000000.0))
          .cast("long")).otherwise(lit(0L)))
    rows.groupBy(col(keyCol), col("model"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("__e"))).as("__sae"),
        sum(dec(col("__e")) * dec(col("__e"))).as("__sse"),
        sum(col("__s6")).as("__smape6"),
        sum(col("__en_abs")).as("__san"))
      .select(col(keyCol), col("model"), col("n_eval"),
        round(d(col("__sae")) / d(col("n_eval")), roundTo).as("mae"),
        round(sqrt(d(col("__sse")) / d(col("n_eval"))), roundTo).as("rmse"),
        round(d(col("__smape6")) / lit(1000000.0) / d(col("n_eval")),
          roundTo).as("smape"),
        round(when(col("__san") > 0, d(col("__sae")) / d(col("__san"))),
          roundTo).as("mase"))
  }

  /** Per-key autocorrelation function at lags 1..`maxLag` (the
    * Box–Jenkins identification statistic — "is this series still
    * correlated with itself k steps back?", the seasonality/
    * momentum screen that decides whether [[olsTrend]]'s
    * independence assumption even holds). For the length-n series
    * x₁..xₙ with mean x̄, r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) /
    * Σ(x_t−x̄)². Multiplying through by n² turns both sides into
    * EXACT integer statistics: r_k = (n²·C_k − n·S·(H_k+T_k) +
    * (n−k)·S²) / (n·(n·Sxx − S²)) where C_k = Σ x_t·x_{t+k},
    * H_k/T_k the head/tail partial sums, S/Sxx the plain sums —
    * every term one integer aggregate, the final division the only
    * double (round 6), so the statistic hash-grades cross-engine
    * with no summation-order discipline.
    *
    * One ordered window pass (maxLag `lead` columns share the key
    * exchange) + one key aggregate; the lag unpivot is a `stack`
    * over the already-aggregated per-key row — thousands of series
    * cost one shuffle. Constant series (zero variance) report a
    * null acf; lags ≥ n drop (no pairs).
    */
  def acf(series: DataFrame, keyCol: String, tsCol: String,
          valueCol: String, maxLag: Int = 3, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLag >= 1 && maxLag <= 24, "maxLag in [1, 24]")
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val d = (c: Column) => c.cast("double")
    val led = (1 to maxLag).foldLeft(
        series.select(col(keyCol), col(tsCol),
          col(valueCol).cast("long").as("__y"))) { (df, k) =>
      df.withColumn(s"__l$k", lead(col("__y"), k).over(byTs))
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(col("__y")).as("__s"),
      sum(col("__y") * col("__y")).as("__sxx")) ++
      (1 to maxLag).flatMap { k =>
        Seq(sum(col("__y") * col(s"__l$k")).as(s"__c$k"),
          sum(when(col(s"__l$k").isNotNull, col("__y"))).as(s"__h$k"),
          sum(col(s"__l$k")).as(s"__t$k"))
      }
    val stackArgs = (1 to maxLag)
      .map(k => s"CAST($k AS BIGINT), __c$k, __h$k, __t$k").mkString(", ")
    led.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol), col("n"), col("__s"), col("__sxx"),
        expr(s"stack($maxLag, $stackArgs) AS (lag, __c, __h, __t)"))
      .filter(col("__c").isNotNull) // lag ≥ n ⇒ no pairs
      .withColumn("__num", d(col("n")) * d(col("n")) * d(col("__c"))
        - d(col("n")) * d(col("__s")) * (d(col("__h")) + d(col("__t")))
        + (d(col("n")) - d(col("lag"))) * d(col("__s")) * d(col("__s")))
      .withColumn("__den", d(col("n")) * (d(col("n")) * d(col("__sxx"))
        - d(col("__s")) * d(col("__s"))))
      .select(col(keyCol), col("lag"), col("n"),
        round(when(col("__den") > 0, col("__num") / col("__den")), roundTo)
          .as("acf"))
  }

  /** ABC / Pareto classification per group — the inventory-analysis
    * staple ("which parts are the 80% of this brand's revenue?"):
    * rank keys by value descending inside each group, classify by
    * cumulative share — A while cum ≤ 80% of the group total, B
    * while ≤ 95%, C after. `valueCol` must be an INTEGER measure
    * (money pre-scaled to its smallest unit by the caller): the
    * thresholds are compared as exact integer cross-products
    * (cum·5 ≤ total·4, cum·20 ≤ total·19) — no float share ever
    * exists, so a class boundary cannot flip on summation order or
    * representation. (Decimal×int would hit Spark's precision-38
    * cap and silently round; longs cannot.) All-zero groups
    * classify everything A (0 ≤ 0). Headroom: total·20 must fit a
    * long — values up to ~4.6e17 per group.
    *
    * Both windows (ordered cum-sum, unordered total) share the one
    * group-key exchange; groups rank independently — no global
    * sort, thousands of groups in parallel. The input should be the
    * per-key PRE-AGGREGATED frame (dimension-sized), not raw facts.
    */
  def abcClassification(rows: DataFrame, groupCol: String, keyCol: String,
                        valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").desc, col(keyCol))
    val whole = Window.partitionBy(col(groupCol))
    rows.select(col(groupCol), col(keyCol),
        col(valueCol).cast("long").as("__x"))
      .withColumn("rank", row_number().over(ordered).cast("long"))
      .withColumn("__cum", sum(col("__x"))
        .over(ordered.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__tot", sum(col("__x")).over(whole))
      .select(col(groupCol), col(keyCol), col("rank"),
        col("__x").as("value"), col("__cum").as("cum_value"),
        when(col("__cum") * 5 <= col("__tot") * 4, "A")
          .when(col("__cum") * 20 <= col("__tot") * 19, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Semi-additive PERIOD-END BALANCE snapshot fact (the Kimball
    * "periodic snapshot" for balances — the one fact family you must
    * NOT sum over time: month-end balance is the LAST value, carried
    * through months with no activity): from a transaction log, per
    * (account, month) the cumulative balance at month end, with
    * quiet months filled by carry-forward from each account's first
    * active month to the corpus' last.
    *
    * Months index as exact integers ((year−1970)·12 + month−1 — no
    * date arithmetic ambiguity); amounts aggregate as EXACT decimals
    * so the running balance is order-free exact; the per-account
    * grid generates first-month→max-month via one sequence explode
    * (data-proportional — an account active 3 months materializes
    * its own span, never the full calendar cross join); the
    * carry-forward is last_value IGNORE NULLS over the account's
    * month order. Two account-keyed window passes share one
    * exchange; the global max month rides a 1-row broadcast.
    */
  def periodEndBalances(txns: DataFrame, accountCol: String,
                        tsCol: String, amountCol: String): DataFrame = {
    val mIdx = ((year(col(tsCol)) - 1970) * 12 + month(col(tsCol)) - 1)
      .cast("long")
    val perMonth = txns
      .select(col(accountCol).as("__a"), mIdx.as("__m"),
        col(amountCol).cast("decimal(18,2)").as("__amt"))
      .groupBy(col("__a"), col("__m")).agg(sum(col("__amt")).as("__dm"))
    val byA = Window.partitionBy(col("__a")).orderBy(col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perMonth.withColumn("__bal", sum(col("__dm")).over(byA))
    val maxM = perMonth.agg(max(col("__m")).as("__mx"))
    val grid = perMonth.groupBy(col("__a")).agg(min(col("__m")).as("__f"))
      .crossJoin(broadcast(maxM))
      .select(col("__a"),
        explode(sequence(col("__f"), col("__mx"))).as("__m"))
    grid.join(cum.select(col("__a"), col("__m"), col("__bal")),
        Seq("__a", "__m"), "left")
      .withColumn("__carried",
        last(col("__bal"), ignoreNulls = true).over(byA))
      .select(col("__a").as(accountCol),
        add_months(lit("1970-01-01").cast("date"), col("__m").cast("int"))
          .cast("timestamp").as("month_start"),
        col("__carried").cast("double").as("balance"))
  }

  /** Week-over-week growth per key — the dashboard-standard Δ/Δ%
    * readout over the weekly grid: n this week, the delta and
    * percent change vs the PRECEDING CALENDAR week (a gap week
    * breaks the comparison → nulls, not a misleading jump vs the
    * last active week). Weeks index as integer Mondays-since-
    * 1970-01-05 (the growthAccounting discipline); counts are exact
    * integers, the percent is one round-6 division. One key
    * exchange shared by the aggregate and the lag window.
    */
  def weekOverWeek(events: DataFrame, keyCol: String, tsCol: String,
                   roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val wk = (datediff(date_trunc("week", col(tsCol)).cast("date"),
      lit("1970-01-05").cast("date")) / 7).cast("long")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("__wk"))
    val agg = events.select(col(keyCol), wk.as("__wk"))
      .groupBy(col(keyCol), col("__wk")).agg(count(lit(1)).as("n_events"))
      .withColumn("__pwk", lag(col("__wk"), 1).over(byKey))
      .withColumn("__pn", lag(col("n_events"), 1).over(byKey))
    val consecutive = col("__pwk").isNotNull && col("__wk") - col("__pwk") === 1
    agg.select(col(keyCol),
      date_add(lit("1970-01-05").cast("date"), (col("__wk") * 7).cast("int"))
        .cast("timestamp").as("week_start"),
      col("n_events"),
      when(consecutive, col("n_events") - col("__pn")).as("wow_delta"),
      round(when(consecutive && col("__pn") > 0,
        d(col("n_events") - col("__pn")) / d(col("__pn"))), roundTo)
        .as("wow_pct"))
  }

  /** XYZ demand-variability classification — [[abcClassification]]'s
    * standard companion axis (the ABC/XYZ matrix every inventory
    * planner runs): ABC ranks items by VALUE share, XYZ by demand
    * PREDICTABILITY via the coefficient of variation of the item's
    * per-period demand — X steady (CV < xMax), Y fluctuating
    * (CV < yMax), Z erratic. Steady A-items get JIT replenishment;
    * erratic C-items get buffer stock or the axe.
    *
    * Portability discipline: per-period demands aggregate to exact
    * integers, so n, Σv, Σv² are exact (decimal(38,0)/HUGEINT) and
    * CV = σ/μ = √(n·Σv²−(Σv)²)/Σv. The CLASS boundaries compare in
    * EXACT INTEGER arithmetic — CV < b ⟺ n·Σv²−(Σv)² < b²·(Σv)²,
    * with b² rational for the standard 0.5/1.0 cuts — so no float
    * rounding can flip a class anywhere; the reported cv is one
    * double tree rounded once. Zero-variance series are X by
    * definition (includes all-zero); zero-mean with variance cannot
    * occur for non-negative demand. Periods are OBSERVED periods
    * (gaps compress — the acf/forecastAccuracy convention,
    * documented). One (key, period) aggregate + one key aggregate.
    */
  def xyzClassification(rows: DataFrame, keyCol: String,
                        periodCol: String, valueCol: String,
                        roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val agg = rows
      .groupBy(col(keyCol), col(periodCol))
      .agg(sum(col(valueCol).cast("long")).as("__v"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_periods"),
        sum(dec(col("__v"))).as("__sv"),
        sum(dec(col("__v")) * dec(col("__v"))).as("__qv"))
    val n = dec(col("n_periods"))
    val varNum = n * col("__qv") - col("__sv") * col("__sv")
    val sv2 = col("__sv") * col("__sv")
    agg.select(col(keyCol), col("n_periods"),
      round(when(col("__sv") > 0, sqrt(d(varNum)) / d(col("__sv"))),
        roundTo).as("cv"),
      // exact integer cuts: CV<0.5 ⟺ 4·varNum < Σv²; CV<1 ⟺ varNum < Σv²
      when(varNum === 0, lit("X"))
        .when(varNum * lit(4) < sv2, lit("X"))
        .when(varNum < sv2, lit("Y"))
        .otherwise(lit("Z")).as("xyz_class"))
  }

  /** Per-group Gini coefficient — revenue-concentration measurement
    * ("is this nation's revenue one whale or a broad base?"), the
    * scalar summary behind every Lorenz-curve dashboard. For
    * ascending-ranked positive values x₁..xₙ, G = Σ(2i−n−1)·xᵢ /
    * (n·Σx); expanding the rank term gives G = (2·Σi·xᵢ −
    * (n+1)·Σx) / (n·Σx) — so ONE ordered window (the rank) and one
    * group aggregate suffice, no per-row n. Values ride as exact
    * decimals (the money discipline: Σx and Σi·xᵢ are order-free
    * decimal sums), the single division is the only double (round
    * 6). Ties are rank-broken on `idCol` for determinism, but G is
    * tie-order invariant (equal x swap freely in Σi·xᵢ — their
    * rank-sum is fixed). Zero/negative totals report null; G ∈
    * [0, 1−1/n] for non-negative values.
    *
    * One key exchange shared by the window sort and the aggregate;
    * groups are ranked independently — thousands of groups scale
    * linearly, no global sort.
    */
  def giniConcentration(rows: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    val byVal = Window.partitionBy(col(groupCol))
      .orderBy(col("__x"), col(idCol))
    rows.select(col(groupCol), col(idCol), dec2(col(valueCol)).as("__x"))
      .withColumn("__i", row_number().over(byVal).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__i")).as("__six"))
      .select(col(groupCol), col("n_units"),
        d(col("__sx")).as("total_value"),
        round(when(d(col("__sx")) > 0,
          (lit(2.0) * d(col("__six"))
            - (d(col("n_units")) + lit(1.0)) * d(col("__sx")))
          / (d(col("n_units")) * d(col("__sx")))), roundTo).as("gini"))
  }

  /** Cohort LTV curves — the cumulative-revenue companion of the
    * retention triangle: customers cohorted by FIRST-order month,
    * revenue bucketed by whole months since the cohort month
    * (integer month index y·12+m, exact in any engine), cumulative
    * per cohort, and LTV = cumulative revenue / cohort size — "how
    * much is a January customer worth by month 6".
    *
    * Money stays exact decimal through the cumulative window (the
    * float-money discipline); the single LTV division exports
    * double. Two shuffles (first-order agg on customer, cohort-
    * period agg), one small window over the cohort × period frame.
    */
  def cohortLtv(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mIdx = (c: Column) => year(c) * 12 + month(c)
    val first = orders.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("__first"))
      .select(col("o_custkey"), mIdx(col("__first")).as("__cm"))
    val sized = first.groupBy(col("__cm")).agg(count(lit(1)).as("n_customers"))
    val facts = orders
      .select(col("o_custkey"), mIdx(col("o_orderdate")).as("__om"),
        dec2(col("o_totalprice")).as("__rev"))
      .join(first, Seq("o_custkey"))
      .groupBy(col("__cm"), (col("__om") - col("__cm")).as("period_m"))
      .agg(sum(col("__rev")).as("revenue"))
    val byCohort = Window.partitionBy(col("__cm")).orderBy(col("period_m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    facts
      .withColumn("cum_revenue", sum(col("revenue")).over(byCohort))
      .join(broadcast(sized), Seq("__cm"))
      .select(col("__cm").as("cohort_month"), col("period_m"),
        col("n_customers"),
        col("revenue").cast("double").as("revenue"),
        col("cum_revenue").cast("double").as("cum_revenue"),
        round(col("cum_revenue").cast("double")
          / col("n_customers").cast("double"), 6).as("ltv"))
  }

  /** Association rules from the co-purchase pairs (Agrawal et al.
    * '93 — [[basketPairs]] says WHICH pairs co-occur; rules say in
    * which DIRECTION the signal runs): for every ordered pair with
    * joint count ≥ minCount,
    *
    *   support(a→b)    = c_ab / N,   confidence(a→b) = c_ab / c_a,
    *   lift(a→b)       = (c_ab · N) / (c_a · c_b)
    *
    * (N = basket count). Confidence is asymmetric — {diapers}→{beer}
    * and {beer}→{diapers} differ exactly when the item frequencies
    * do; lift > 1 separates association from popularity.
    *
    * Same shuffle shape as [[basketPairs]] (per-order fan-out bounded
    * by basket size); the item-count frame is domain-sized and
    * broadcasts; N is one driver scalar (the bootstrap discipline).
    * All three ratios are single divisions of integer counts under
    * round(6) — fixed-tree cross-engine arithmetic.
    */
  def basketRules(lineitem: DataFrame, minCount: Long = 2L,
                  minConfidence: Double = 0.0,
                  roundTo: Int = 6): DataFrame = {
    val items = graft.Par.persistTracked(
      lineitem.select(col("l_orderkey"), col("l_partkey")).distinct())
    val nBaskets = items.select(col("l_orderkey")).distinct().count()
    val itemCounts = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("antecedent"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("consequent")),
        Seq("l_orderkey"))
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("l_partkey").as("antecedent"),
        col("c").as("__ca"))), Seq("antecedent"))
      .join(broadcast(itemCounts.select(col("l_partkey").as("consequent"),
        col("c").as("__cb"))), Seq("consequent"))
      .withColumn("support",
        round(col("n_both").cast("double") / lit(nBaskets.toDouble), roundTo))
      .withColumn("confidence",
        round(col("n_both").cast("double") / col("__ca").cast("double"), roundTo))
      .withColumn("lift",
        round((col("n_both").cast("double") * lit(nBaskets.toDouble))
          / (col("__ca").cast("double") * col("__cb").cast("double")), roundTo))
      .filter(col("confidence") >= minConfidence)
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("support"), col("confidence"), col("lift"))
  }

  /** RFM segmentation (Hughes '94 — the classic marketing triage):
    * per customer, Recency (days since last order, against the
    * corpus's own max date — no wall clock), Frequency (order
    * count), Monetary (exact-decimal revenue, the float-money
    * discipline), each scored into `buckets` quantile bands by
    * `ntile` with ties pinned on the customer key — score `buckets`
    * is best on every axis, so '555' is the champion segment.
    *
    * The three ntile windows are global sorts over the CUSTOMER
    * frame (dimension-sized, already aggregated — not the orders
    * fact); at extreme customer cardinality swap ntile for
    * percentile-bucket joins (the selectBudget bucketing trick).
    */
  def rfm(orders: DataFrame, buckets: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0, "buckets must be positive")
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(dec2(col("o_totalprice"))).as("monetary"))
      .withColumn("recency_days",
        datediff(max(col("__last")).over(wAll), col("__last")))
    val key = col("o_custkey").asc
    perCust
      .withColumn("r_score", ntile(buckets)
        .over(Window.orderBy(col("recency_days").desc, key)))
      .withColumn("f_score", ntile(buckets)
        .over(Window.orderBy(col("frequency").asc, key)))
      .withColumn("m_score", ntile(buckets)
        .over(Window.orderBy(col("monetary").asc, key)))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        // ntile ordered on the EXACT decimal above; the output column
        // is double (the events_hourly money-export discipline)
        col("monetary").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("rfm"))
  }

  /** Exact ntile over an arbitrary total order WITHOUT the global
    * single-task sort — the percentile-bucket rank the [[rfm]]
    * scaladoc names (r12 verdict ask #7, the
    * [[graft.operators.Sampling.selectBudget]] bucketing discipline
    * generalized to ranking):
    *
    *  1. `rangeBuckets−1` boundary values from ONE
    *     `approx_percentile` sketch aggregate — ANY order-preserving
    *     cut is CORRECT (the sketch's rank error only skews work
    *     balance, never the result), so the cheap sketch is safe
    *     here in a way it never is for the quantiles themselves;
    *  2. per-bucket counts (one map-side-combined aggregate,
    *     ≤ rangeBuckets rows pulled — a bounded-scalar collect);
    *  3. global rank = bucket offset + within-bucket `row_number`
    *     (window PARTITIONED by bucket — each reducer sorts ~1/B of
    *     the frame instead of one task sorting all of it);
    *  4. the SQL-standard ntile arithmetic on the literal total n
    *     (first n mod k buckets get ⌈n/k⌉ rows) — bit-identical to
    *     the window ntile by construction.
    *
    * Ties across a boundary can't split: bucketing uses the sort
    * VALUE only (the tie-breaking key enters in step 3's in-bucket
    * order, where ties share a bucket by construction).
    */
  private def bucketedNtile(df: DataFrame, sortExact: Column,
                            tieKey: Column, k: Int, scoreName: String,
                            rangeBuckets: Int = 64): DataFrame =
    bucketedNtiles(df, Seq((sortExact, scoreName)), tieKey, k, rangeBuckets)

  /** Batched [[bucketedNtile]]: ALL axes share one boundary-sketch
    * aggregate, one persisted tagged frame, and one bounded
    * count-collect per axis — 3 axes cost one corpus pass plus three
    * bucket-partitioned windows instead of three full stacks (the
    * fixed driver-action cost dominated the single-axis form at
    * dimension scale).
    */
  private def bucketedNtiles(df: DataFrame,
                             axes: Seq[(Column, String)], tieKey: Column,
                             k: Int, rangeBuckets: Int = 64): DataFrame = {
    require(axes.nonEmpty, "bucketedNtiles needs at least one axis")
    val fr = (1 until rangeBuckets).map(_.toDouble / rangeBuckets)
    val withV = axes.zipWithIndex.foldLeft(df) {
      case (acc, ((sortExact, _), i)) =>
        acc.withColumn(s"__sv$i", sortExact.cast("double"))
    }
    // ONE sketch aggregate for every axis's boundary grid
    val boundsRow = withV.agg(
      percentile_approx(col("__sv0"), typedLit(fr), lit(1000)).as("q0"),
      axes.indices.drop(1).map(i =>
        percentile_approx(col(s"__sv$i"), typedLit(fr), lit(1000))
          .as(s"q$i")): _*).head()
    val tagged = graft.Par.persistTracked(
      axes.indices.foldLeft(withV) { (acc, i) =>
        val bounds = boundsRow.getSeq[Double](i).distinct.sorted
        acc.withColumn(s"__bk$i", bounds.foldLeft(lit(0)) { (e, b) =>
          e + when(col(s"__sv$i") > lit(b), 1).otherwise(0) })
      })
    val scored = axes.zipWithIndex.foldLeft(tagged) {
      case (acc, ((sortExact, scoreName), i)) =>
        val counts = tagged.groupBy(col(s"__bk$i"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val n = counts.map(_._2).sum
        require(n > 0, "bucketedNtile over an empty frame")
        var run = 0L
        val offExpr = counts.foldLeft(when(lit(false), lit(0L))) {
          case (e, (b, c)) =>
            val o = run; run += c; e.when(col(s"__bk$i") === b, lit(o))
        }.otherwise(lit(0L))
        val w = Window.partitionBy(col(s"__bk$i"))
          .orderBy(sortExact.asc, tieKey.asc)
        val rn = row_number().over(w).cast("long") + offExpr
        val q = n / k
        val r = n % k
        val head = lit(r * (q + 1))
        val score = when(rn <= head,
            floor((rn - lit(1L)) / lit((q + 1).toDouble)) + lit(1L))
          .otherwise(lit(r) +
            floor((rn - head - lit(1L)) / lit(math.max(q, 1L).toDouble))
              + lit(1L))
        acc.withColumn(scoreName, score.cast("int"))
    }
    axes.indices.foldLeft(scored) { (acc, i) =>
      acc.drop(s"__sv$i", s"__bk$i") }
  }

  /** [[rfm]] with the three global `ntile` sorts replaced by
    * [[bucketedNtile]] percentile-bucket ranks — the 100 TB shape
    * (no SinglePartition exchange anywhere in the plan; the corpus
    * max date rides a 1-row broadcast instead of an unpartitioned
    * window). Output is row-identical to [[rfm]] by the exact-ntile
    * construction — graded against the same oracle.
    */
  def rfmBucketed(orders: DataFrame, buckets: Int = 5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val perCust0 = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(dec2(col("o_totalprice"))).as("monetary"))
    val maxLast = perCust0.agg(max(col("__last")).as("__maxl"))
    val perCust = perCust0.crossJoin(broadcast(maxLast))
      .withColumn("recency_days", datediff(col("__maxl"), col("__last")))
      .drop("__maxl")
    val key = col("o_custkey")
    val s3 = bucketedNtiles(perCust,
      Seq((-col("recency_days"), "r_score"),
        (col("frequency"), "f_score"),
        (col("monetary"), "m_score")),
      key, buckets)
    s3.select(col("o_custkey"), col("recency_days"), col("frequency"),
      col("monetary").cast("double").as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score"), col("f_score"), col("m_score")).as("rfm"))
  }

  /** Exact ROLLING median per key over the last `window` events —
    * the robust smoother for spiky operational metrics (a rolling
    * MEAN follows every outlier; the median shrugs them off — the
    * [[Quality.robustMean]] idea on a moving frame). Frame = ROWS
    * window−1 PRECEDING..CURRENT over (tsCol, idCol) — the id
    * tie-break makes frame CONTENTS deterministic, which an
    * ORDER BY ts alone cannot (ties would make the ROWS frame
    * engine-dependent). Median = middle of the sorted frame, or the
    * IEEE mean of the two middles on even counts — exactly the SQL
    * `median(...) OVER` semantics, so the whole column replays.
    *
    * Scale: one exchange on the key; per-row state is the
    * `window`-bounded collected frame (collect_list over a ROWS
    * window — bounded by construction, never by data). Window
    * functions stream per key; no global sort anywhere.
    */
  def rollingMedian(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String,
                    window: Int): DataFrame = {
    require(window >= 1 && window <= 10000, "window in [1, 10000]")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(-(window - 1), Window.currentRow)
    val arr = sort_array(collect_list(col(valueCol).cast("double")).over(w))
    val n = size(arr)
    val med = when(pmod(n, lit(2)) === 1,
        element_at(arr, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(arr, (n / 2).cast("int"))
        + element_at(arr, (n / 2).cast("int") + 1)) / 2)
    events.select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("rolling_median", med)
  }

  /** Frequent brand TRIPLES by Apriori candidate pruning (Agrawal &
    * Srikant VLDB'94) — the next market-basket order up from
    * [[basketPairs]]: all 3-itemsets co-purchased in ≥ ⌈frac·|orders|⌉
    * orders (relative support — the threshold scales with the data,
    * as the original definition has it).
    *
    * The definitional form is a triple self-join — per-order fan-out
    * domain³ — and THAT is what the oracle states. The implementation
    * prunes by anti-monotonicity (every sub-itemset of a frequent
    * triple is frequent, so dropping infrequent items/pairs loses
    * nothing — the correctness gate proves it):
    *  1. distinct (order, brand) items, frequent ITEMS only;
    *  2. per-order pair occurrences (a < b), kept only for frequent
    *     PAIRS (the tiny ≤ domain² pair table broadcasts);
    *  3. extend by a third item c > b, kept only when (a,c) and (b,c)
    *     are also frequent — the full Apriori candidate test;
    *  4. count per triple, cut at support.
    * Per-order fan-out is bounded by the FREQUENT-item count per
    * order, not the raw domain, and every pruning join is a broadcast
    * of a domain²-bounded frame. The one driver-side scalar is the
    * order count (bootstrap discipline — one count job).
    */
  def frequentTriples(spark: SparkSession, dir: String,
                      supportFrac: Double = 0.002): DataFrame = {
    val items = graft.Par.persistTracked(
      Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct())
    val nOrders = items.select(countDistinct(col("o"))).head().getLong(0)
    val s = math.ceil(supportFrac * nOrders).toLong
    frequentTriplesFromItems(items, s)
  }

  /** Apriori core over a distinct (o, b) item frame — see
    * [[frequentTriples]]. `items` must be (order, item)-distinct.
    */
  def frequentTriplesFromItems(items: DataFrame, s: Long): DataFrame = {
    val freqItems = items.groupBy(col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= s).select(col("b"))
    val itemsF = graft.Par.persistTracked(
      items.join(broadcast(freqItems), Seq("b")).select(col("o"), col("b")))
    val pairOcc = itemsF.select(col("o"), col("b").as("brand_a"))
      .join(itemsF.select(col("o"), col("b").as("brand_b")), Seq("o"))
      .filter(col("brand_a") < col("brand_b"))
    val freqPairs = graft.Par.persistTracked(
      pairOcc.groupBy(col("brand_a"), col("brand_b"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= s)
        .select(col("brand_a"), col("brand_b")))
    val tripleOcc = pairOcc
      .join(broadcast(freqPairs), Seq("brand_a", "brand_b"))
      .join(itemsF.select(col("o"), col("b").as("brand_c")), Seq("o"))
      .filter(col("brand_b") < col("brand_c"))
      .join(broadcast(freqPairs.toDF("brand_a", "brand_c")),
        Seq("brand_a", "brand_c"))
      .join(broadcast(freqPairs.toDF("brand_b", "brand_c")),
        Seq("brand_b", "brand_c"))
    tripleOcc.groupBy(col("brand_a"), col("brand_b"), col("brand_c"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= s)
  }

  /** Windowed funnel — [[funnel]] with a conversion deadline: the
    * chain must complete within `windowSeconds` of its step-1 start.
    * A single greedy chain is NOT enough here (an early start can
    * dead-end inside its window while a later start converts), so
    * every step-1 occurrence is a candidate start — the chain from
    * start t₀ is the same earliest-strictly-increasing recurrence
    * bounded by t₀ + window — and the user reports the DEEPEST stage
    * over starts, tie-broken to the earliest start.
    *
    * Still ONE shuffle, and since r8 ONE deadline-pruned pass over
    * the sorted array ([[graft.functions.FunnelWalk]]): live starts
    * collapse into per-stage shared-tip groups that advance or expire
    * together, so per-user cost is O(|events| + |starts|·|steps|),
    * not |starts|·|events|. `maxStarts` caps candidate starts
    * (earliest-first; the slice is part of the contract and of the
    * oracle). Users with funnel events but no step-1 report stage 0.
    */
  def funnelWindowed(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, steps: Seq[String], windowSeconds: Long,
                     maxStarts: Int = 64): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(maxStarts >= 1, "maxStarts must be >= 1")
    val tsType = events.schema(events.schema.fieldIndex(tsCol)).dataType
    // the walk compares physical longs; the window must be in the ts
    // column's own units (timestamps are micros-backed)
    val windowUnits = tsType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => windowSeconds * 1000000L
      case org.apache.spark.sql.types.LongType => windowSeconds
      case other => throw new IllegalArgumentException(
        s"funnelWindowed needs a timestamp or bigint ts column, got $other")
    }
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val ev = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), stepIdx.as("step")).as("e"))
    import org.apache.spark.sql.GraftSqlBridge
    val walked = GraftSqlBridge.column(graft.functions.FunnelWalk(
      GraftSqlBridge.expression(sort_array(collect_list(col("e")))),
      windowUnits, maxStarts, steps.size))
    ev.groupBy(col(userCol))
      .agg(walked.as("__f"))
      .select(col(userCol), col("__f.stage").as("stage"),
        col("__f.t_first").as("t_first"), col("__f.t_last").as("t_last"))
  }

  /** Weekly cohort retention — the companion conversion view to
    * [[funnel]]: users cohort by the week they were first seen, and
    * each (cohort, weeks-since-cohort) cell counts the cohort's users
    * active that week. Three keyed shuffles, all standard: first-seen
    * per user, the user-keyed join back (broadcastable while the user
    * dimension fits), and the distinct+count — nothing holds more
    * than (cohort × week × user) distinct rows, which is bounded by
    * user-weeks, not events.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_ts"))
    events.select(col(userCol), date_trunc("week", col(tsCol)).as("__w"))
      .join(first, Seq(userCol))
      .select(col("cohort_ts"),
        (datediff(col("__w"), col("cohort_ts")) / 7).cast("int").as("period_n"),
        col(userCol))
      .distinct()
      .groupBy(col("cohort_ts"), col("period_n"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** TPC-H Q6 shape: single-table forecast-revenue scan — every
    * predicate (date range, discount band, quantity cap) is
    * scan-pushable, so the plan is a parquet scan with PushedFilters
    * feeding one partial-agg: the cheapest possible 100 TB query
    * when the layout clusters on shipdate. The discount band compares
    * in decimal (the raw column is clean 2-decimal) so the boundary
    * rows match any engine bit-exactly.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        dec2(col("l_discount")) >= lit(BigDecimal("0.05")) &&
        dec2(col("l_discount")) <= lit(BigDecimal("0.07")) &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q7 shape: bilateral trade volume between two nations by
    * ship year. Both nation dims are filtered to the two names BEFORE
    * their joins (broadcast of 2-row dims); the pair constraint
    * (either direction, never domestic) is a residual filter after
    * the supplier/customer joins. The only big shuffles are
    * lineitem⋈orders on orderkey and the custkey join — the group key
    * (nation, nation, year) is tiny so the final agg is map-side
    * collapsed.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String,
                       nationA: String = "NATION_1",
                       nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val ns = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val nc = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), discPrice.as("rev"))
    l.join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(ns), s("s_nationkey") === ns("supp_nk"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(nc), c("c_nationkey") === nc("cust_nk"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape: one nation's market share inside a region's
    * market for one product type, by order year. The share divides
    * two conditional decimal sums of the SAME grouped aggregation —
    * one pass, one shuffle on the (year) group key after the join
    * chain; the division happens once per output row in double,
    * rounded, so it replays on any engine. Geography dims broadcast;
    * part is filtered to the type before its join.
    */
  def q8MarketShare(spark: SparkSession, dir: String,
                    region: String = "ASIA", partType: String = "STANDARD",
                    nation: String = "NATION_3"): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    val ncust = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_nk"), col("n_regionkey"))
    val nsupp = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    val p = Tables.part(spark, dir).filter(col("p_type") === partType)
      .select(col("p_partkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        discPrice.as("rev"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(ncust), c("c_nationkey") === ncust("cn_nk"))
      .join(broadcast(r), ncust("n_regionkey") === r("r_regionkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(nsupp), s("s_nationkey") === nsupp("sn_nk"))
      .groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nation, col("rev"))
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
          sum(col("rev")).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: product-line profit by supplier nation and order
    * year. The schema carries no partsupp/supplycost, so cost is
    * defined as 50% of retail per unit (an exact decimal constant —
    * the adapted definition is part of the contract and of the
    * oracle): amount = disc price − 0.5·retail·qty, all decimal.
    * The part filter (name contains the color) prunes before the
    * join; profit aggregates once on the tiny (nation, year) key.
    */
  def q9ProductProfit(spark: SparkSession, dir: String,
                      color: String = "red"): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains(color))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val amount = discPrice -
      dec2(col("p_retailprice")) * dec2(col("l_quantity")) *
        lit(BigDecimal("0.5"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape: parts whose revenue (through suppliers of one
    * region) exceeds a fraction of the total — the global-scalar
    * HAVING. The per-part aggregation and the grand total come from
    * the SAME filtered join (computed once, persisted by Catalyst's
    * reused exchange); the 1-row total then BROADCASTS into the
    * per-part frame — at 100 TB the threshold comparison costs one
    * map-side filter, never a second scan. The fraction test is
    * stated multiplicatively in decimal (value·1000 > total) so no
    * engine divides.
    */
  def q11ImportantParts(spark: SparkSession, dir: String,
                        region: String = "EUROPE"): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), discPrice.as("v"))
    val base = l.join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("l_partkey"), col("v"))
    val per = base.groupBy(col("l_partkey")).agg(sum(col("v")).as("value_d"))
    val tot = base.agg(sum(col("v")).as("total_d"))
    per.crossJoin(broadcast(tot))
      .filter(col("value_d") * lit(1000) > col("total_d"))
      .select(col("l_partkey"), col("value_d").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape: late-shipment counts by line status split into
    * high/low order-priority classes ("late" = shipped > 30 days
    * after ordering; the schema has no commit/receipt dates). One
    * orderkey shuffle for the join; both class counts come from one
    * conditional aggregation over the tiny linestatus key.
    */
  def q12LateByPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q15 shape: the top supplier(s) by quarterly revenue — a
    * scalar-max subquery. Per-supplier revenue aggregates once
    * (suppkey shuffle); the 1-row max BROADCASTS back into the same
    * frame and matches on EXACT decimal equality (revenue never
    * leaves decimal until output), so ties surface exactly as the
    * definitional form requires and no 100 TB re-scan happens.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("total_d"))
    val top = rev.agg(max(col("total_d")).as("max_d"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_d") === col("max_d"))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_d").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape: how many distinct suppliers serve each
    * (brand, type, size) bucket — supplier-part relationships derived
    * from shipped lines (the schema's partsupp stand-in), excluding
    * one brand and the PROMO type. The distinct (part, supplier)
    * projection shrinks the fact FIRST (partkey shuffle); the
    * count-distinct then shuffles only the surviving pairs on the
    * small composite key.
    */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(3, 9, 14, 19, 23, 36, 45, 49)
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val rel = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    rel.join(p, rel("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q17 shape: revenue that would vanish without
    * small-quantity orders — the correlated per-part average. The
    * correlated `qty < 0.5·avg(qty over the part's lines)` is
    * decorrelated into ONE per-part aggregate (sum, count) joined
    * back (the same partkey shuffle the filter needs anyway), and the
    * predicate is stated MULTIPLICATIVELY — 2·qty·cnt < sum — in
    * decimal, so no engine ever divides and boundary rows can't flip
    * cross-engine. The oracle states the correlated subquery form
    * verbatim (also multiplicatively), so the gate proves the
    * decorrelation.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String,
                         brand: String = "Brand#2",
                         partType: String = "ECONOMY"): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === brand && col("p_type") === partType)
      .select(col("p_partkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPart = l.groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(dec2(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(perPart, l("l_partkey") === perPart("pp_key"))
      .filter(dec2(col("l_quantity")) * lit(2) * col("cnt_qty") < col("sum_qty"))
      .agg(round(sum(dec2(col("l_extendedprice"))).cast("double") / 7.0, 6)
        .as("avg_yearly"))
  }

  /** TPC-H Q19 shape: disjunctive-predicate revenue — three
    * brand/size/quantity bands OR-ed together. The equi key
    * (partkey) is common to every branch, so the plan must stay an
    * equi-join with the OR as a residual — never a nested-loop — and
    * the per-side conjuncts (brand∨brand∨brand, qty bounds) push to
    * the scans. Written with the OR inside the join condition to
    * prove Catalyst extracts the equi conjunct.
    */
  def q19BandedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val b1 = col("p_brand") === "Brand#5" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 20)
    val b2 = col("p_brand") === "Brand#15" && col("p_size").between(11, 25) &&
      col("l_quantity").between(10, 30)
    val b3 = col("p_brand") === "Brand#25" && col("p_size").between(26, 50) &&
      col("l_quantity").between(20, 40)
    l.join(p, l("l_partkey") === p("p_partkey") && (b1 || b2 || b3))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** TPC-H Q20 shape: suppliers in one region who shipped an excess
    * volume (> `minQty` units in a year) of some color-named part —
    * the nested semi-join chain. Each stage SHRINKS before the next
    * join: part prunes by name, the (part, supplier) aggregate runs
    * on the date-filtered fact, the HAVING keeps heavy pairs, and
    * supplier is reached by a left-semi on the tiny surviving keyset.
    * The oracle states the nested-IN form verbatim.
    */
  def q20ExcessShippers(spark: SparkSession, dir: String,
                        color: String = "red", region: String = "EUROPE",
                        minQty: Int = 60): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains(color)).select(col("p_partkey"))
    val heavy = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(parts, col("l_partkey") === parts("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
      .filter(col("qty") > minQty)
      .select(col("l_suppkey")).distinct()
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(heavy, col("s_suppkey") === heavy("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q2 shape: the cheapest source per part — a correlated MIN
    * subquery. "Offer" adapts to this schema as a supplier's minimum
    * line price for the part (no partsupp table); the correlated
    * min-over-region decorrelates into a per-part aggregate joined
    * back on EXACT decimal equality — the same two-level
    * groupBy+join-back rewrite every warehouse planner performs, and
    * the partkey shuffle is shared between the two levels. Geography
    * broadcasts; part prunes on (type, size band) before the fact
    * join. The oracle states the correlated form verbatim.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String,
                        partType: String = "LARGE", sizeLo: Int = 10,
                        sizeHi: Int = 15, region: String = "EUROPE"): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === partType && col("p_size").between(sizeLo, sizeHi))
      .select(col("p_partkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), dec2(col("l_extendedprice")).as("price"))
    val offers = l.join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .agg(min(col("price")).as("cost_d"))
    val minPer = offers.groupBy(col("l_partkey").as("mp_key"))
      .agg(min(col("cost_d")).as("min_d"))
    offers.join(minPer,
        offers("l_partkey") === minPer("mp_key") && col("cost_d") === col("min_d"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("cost_d").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  /** CUBE aggregation — all four grouping sets of (nation, year) in
    * one pass (Expand + partial agg, one shuffle), with
    * `grouping_id` disambiguating a real NULL group member from a
    * subtotal row — the companion to [[rollupRevenue]] covering the
    * full grouping-sets surface.
    */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("order_year"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), discPrice.as("rev"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("order_year"))
      .agg(grouping_id().as("gid"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("order_year").asc_nulls_first)
  }

  /** Gap-filled, forward-filled hourly series — the time-series
    * regularization every monitoring/feature pipeline needs: missing
    * hours are MATERIALIZED (count 0) and the last observed sum
    * carries forward. The spine comes from a per-group
    * `sequence(min_hour, max_hour)` explode — no driver-side loop, no
    * cross join: each group's spine is generated next to its own
    * aggregate, so one shuffle keyed by group covers aggregate,
    * spine, and the forward-fill window. Spine width is bounded by
    * the time span, not the data volume — at 100 TB the hourly frame
    * is already aggregate-shrunk before the fill.
    */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hour_ts")).as("mn"), max(col("hour_ts")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("sv"), ignoreNulls = true).over(w).cast("double")
          .as("filled_value"))
      .orderBy(col("event_type"), col("hour_ts"))
  }

  /** Pairwise audience overlap — distinct users active in BOTH of
    * each event-type pair (the segment-intersection matrix). The
    * (type, user) projection dedups FIRST (user-keyed shuffle), so
    * the self-join fans out at most types² rows per user — bounded by
    * the type-domain size squared, never by event volume — and the
    * count per pair needs no further distinct.
    */
  def audienceOverlap(events: DataFrame, typeCol: String,
                      userCol: String): DataFrame = {
    val tu = events.select(col(typeCol), col(userCol)).distinct()
    tu.select(col(typeCol).as("type_a"), col(userCol))
      .join(tu.select(col(typeCol).as("type_b"), col(userCol)), Seq(userCol))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group equal-width histogram: `nbins` bins over each group's
    * own [min, max]. The bounds come from the SAME grouped aggregate
    * the binning joins back to (one groupBy + one broadcastable
    * join-back — the decorrelated form of the correlated min/max
    * subquery), and the bin arithmetic is pure IEEE-double
    * (sub/div/mul/floor), bit-identical on any engine, so the oracle
    * restates it verbatim.
    */
  def valueHistogram(events: DataFrame, typeCol: String, valCol: String,
                     nbins: Int = 20): DataFrame = {
    require(nbins >= 2, "need at least 2 bins")
    val bounds = events.groupBy(col(typeCol).as("__t"))
      .agg(min(col(valCol)).as("mn"), max(col(valCol)).as("mx"))
    events.join(bounds, col(typeCol) === col("__t"))
      .select(col(typeCol),
        when(col("mx") > col("mn"),
          least(lit(nbins - 1),
            floor((col(valCol) - col("mn")) / (col("mx") - col("mn")) * nbins)))
          .otherwise(lit(0L)).as("bin"))
      .groupBy(col(typeCol), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group winsorization — outlier clipping at [pLo, pHi], the
    * training-data normalization staple: values clamp to their
    * group's exact interpolated percentiles. Percentiles come from
    * ONE grouped pass (the same exact-`percentile` machinery
    * [dq_numeric_profile] grades hash-green — both engines
    * interpolate (1−f)·a[k] + f·a[k+1] in double on the sorted
    * group) joined back broadcastable; clipping is per-row codegen.
    * At 100 TB exact per-group percentiles cost one sort-based agg
    * over each group — the GK-sketch profile is the approximate twin
    * when groups are huge.
    */
  def winsorize(events: DataFrame, groupCol: String, valCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val b = events.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile($valCol, $pLo)").as("lo"),
        expr(s"percentile($valCol, $pHi)").as("hi"))
    events.join(b, col(groupCol) === col("__g"))
      .select(events.columns.map(col) :+
        least(greatest(col(valCol), col("lo")), col("hi")).as("clipped"): _*)
  }

  /** Event-transition matrix (first-order Markov counts): how often
    * each event type is immediately followed by each other type
    * within a user's timeline. ONE user-keyed shuffle for the lead()
    * window; the count aggregates on the tiny type×type key. The
    * (ts, event_id) ordering makes the successor deterministic under
    * same-timestamp events.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** In-sample next-event prediction accuracy of the first-order
    * Markov model [[transitionMatrix]] trains — the evaluation
    * harness that tells you whether "predict the modal successor"
    * is even worth deploying before anything fancier: per state,
    * predicted next = argmax transition count ((count desc, type
    * asc) — the LPA argmax discipline), accuracy = that count over
    * the state's total outgoing transitions. All integers until the
    * single division (round 6). The transition frame is type×type
    * sized, so everything after the one user-keyed lead() window is
    * dimension-cheap.
    */
  def markovAccuracy(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String,
                     roundTo: Int = 6): DataFrame = {
    val cnt = transitionMatrix(events, userCol, typeCol, tsCol, idCol)
    cnt.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_transitions"),
        min(struct((-col("n")).as("nc"), col("to_type").as("t"))).as("__b"))
      .select(col("from_type"), col("n_transitions"),
        col("__b.t").as("predicted_next"),
        (-col("__b.nc")).as("n_correct"))
      .withColumn("accuracy", round(col("n_correct").cast("double")
        / col("n_transitions").cast("double"), roundTo))
  }

  /** Per-user trailing time-RANGE sum — the companion to the
    * ROWS-frame [[eventsRolling]]: the frame is "everything in the
    * last hour", so its width follows event DENSITY, not a fixed row
    * count (the feature-engineering distinction that matters for
    * bursty traffic). rangeBetween over unix seconds keeps the frame
    * arithmetic integral; one user-keyed shuffle.
    */
  def eventsRollingRange(spark: SparkSession, dir: String,
                         windowSec: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"))
      .rangeBetween(-windowSec, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("sec"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("trailing_value", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("ts"), col("trailing_value"))
  }

  /** Equal-DEPTH deciles per group (`ntile`) — the companion to the
    * equal-width [[valueHistogram]]: every bucket holds the same row
    * count, bucket EDGES follow the distribution. Deterministic
    * under ties via the (value, id) ordering; one group-keyed
    * shuffle.
    */
  def valueDeciles(events: DataFrame, groupCol: String, valCol: String,
                   idCol: String, n: Int = 10): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol), col(idCol))
    events.select(col(groupCol), col(valCol), col(idCol))
      .withColumn("decile", ntile(n).over(w))
      .groupBy(col(groupCol), col("decile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }

  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val tsType = events.schema(events.schema.fieldIndex(tsCol)).dataType
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val ev = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), stepIdx.as("step")).as("e"))
    val walked = aggregate(sort_array(collect_list(col("e"))),
      struct(lit(0).as("stage"),
        lit(null).cast(tsType).as("t_first"),
        lit(null).cast(tsType).as("t_last")),
      (acc, e) => {
        // advance on the FIRST step-(stage+1) event strictly after the
        // chain's current tip; sorted order makes "first" = "min ts"
        val advance = e.getField("step") === acc.getField("stage") + 1 &&
          (acc.getField("stage") === 0 || e.getField("ts") > acc.getField("t_last"))
        when(advance, struct(
          (acc.getField("stage") + 1).as("stage"),
          when(acc.getField("stage") === 0, e.getField("ts"))
            .otherwise(acc.getField("t_first")).as("t_first"),
          e.getField("ts").as("t_last"))).otherwise(acc)
      })
    ev.groupBy(col(userCol))
      .agg(walked.as("__f"))
      .select(col(userCol), col("__f.stage").as("stage"),
        col("__f.t_first").as("t_first"), col("__f.t_last").as("t_last"))
  }

  /** Funnel step latency — the time-dimension companion of
    * [[funnel]]'s conversion counts: for each consecutive step pair,
    * how long do converting users take? ("users click 40 s after the
    * view but purchase 2 h after the click" — where the funnel leaks
    * TIME, not users.) Uses the same first-qualifying-event chain as
    * the funnel fold: t₁ = first step-1 event, tᵢ₊₁ = first step-
    * (i+1) event STRICTLY after tᵢ — so the measured gaps are
    * exactly the graded funnel's chain segments.
    *
    * Portability discipline: gaps are exact integer MICROSECONDS
    * (unix_micros / epoch_us in either engine); the mean is one
    * double tree on (Σµs, n) and the p50 is the exact interpolated
    * percentile over integer µs (the dq_numeric_profile machinery —
    * cross-engine-stable linear interpolation), each rounded once
    * after the µs→seconds division. Plan: one step-pair loop of
    * (user-keyed min-aggregates + one join) — steps.size bounded,
    * each pass one exchange on the user key; the final frame is
    * steps−1 rows.
    */
  def funnelLatency(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String],
                    roundTo: Int = 6): DataFrame = {
    require(steps.size >= 2, "funnelLatency needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val d = (c: Column) => c.cast("double")
    val f = graft.Par.persistTracked(
      events.filter(col(typeCol).isin(steps: _*))
        .select(col(userCol).as("__u"), col(typeCol).as("__e"),
          col(tsCol).cast("timestamp").as("__ts")))
    var reached = f.filter(col("__e") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    val pairs = steps.sliding(2).toSeq.map { case Seq(a, b) =>
      val nxt = f.filter(col("__e") === b)
        .join(reached, Seq("__u"))
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u"))
        .agg(min(col("__ts")).as("__t2"), min(col("__t")).as("__t1"))
      reached = nxt.select(col("__u"), col("__t2").as("__t"))
      nxt.select(col("__u"),
          (unix_micros(col("__t2")) - unix_micros(col("__t1"))).as("__gap"))
        .agg(count(lit(1)).as("n_users"), sum(col("__gap")).as("__sg"),
          expr("percentile(__gap, 0.5)").as("__p50"))
        .select(lit(a).as("step_from"), lit(b).as("step_to"),
          col("n_users"),
          round(d(col("__sg")) / d(col("n_users")) / lit(1000000.0),
            roundTo).as("mean_s"),
          round(col("__p50") / lit(1000000.0), roundTo).as("p50_s"))
    }
    pairs.reduce(_ unionByName _)
  }

  /** Robust per-group outlier detection via median absolute deviation
    * (r8-w4): med = exact p50 of the value, mad = exact p50 of
    * |value − med|, a row is an outlier when |value − med| > k·mad.
    * The mean/σ z-score (doc_quality_normalized) breaks down exactly
    * when you need it — heavy-tailed values drag μ and σ toward the
    * outliers — while the median pair is 50%-breakdown robust, which
    * is why monitoring pipelines flag on MAD.
    *
    * Two grouped passes over the fact (med first — the deviation
    * column needs it — then mad), both exact-percentile sort-aggs on
    * the group key; the per-group summary joins back broadcastable
    * the same way [[winsorize]]'s bounds do. Same cross-engine-stable
    * interpolated percentile the dq profiles grade; round(6) on the
    * reported doubles guards the division.
    */
  def madOutliers(events: DataFrame, groupCol: String, valCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = events.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val withMed = events.join(med, col(groupCol) === col("__g")).drop("__g")
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = withMed.groupBy(col(groupCol).as("__g"))
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    withMed.join(mad, col(groupCol) === col("__g")).drop("__g")
      .groupBy(col(groupCol))
      .agg(round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        // round(6) on BOTH compare sides: the flag must not hinge on
        // sub-µ differences between the engines' percentile
        // interpolation paths (same guard the score-normalization
        // oracles use)
        sum(when(round(col("__dev"), 6) > round(lit(k) * col("mad"), 6), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  /** Last-touch attribution (r8-w4): credit each conversion event to
    * the most recent touch event at-or-before it in the same user's
    * timeline, provided the touch is within `lookbackSec`. The
    * marketing-attribution primitive every event warehouse ends up
    * running daily.
    *
    * NOT a join: conversions and touches interleave in one
    * (user, ts)-sorted pass — touches publish their (ts, id) and a
    * `last(..., ignoreNulls)` window carries the latest one forward to
    * each conversion row. ONE user-keyed shuffle for any number of
    * conversions and touches; the join formulation (each conversion ×
    * all prior touches) is quadratic in a hot user's activity.
    * Ordering is (ts, is-conversion, event_id): a touch at the exact
    * conversion timestamp counts (touch sorts first), and same-ts
    * touches resolve to the highest event_id — deterministic under
    * unique ids.
    */
  /** LINEAR multi-touch attribution — the fair-split companion to
    * [[attributionLastTouch]]: every touch inside the lookback
    * window shares the conversion's credit equally (`1/n`, rounded
    * once — per-row rational, NO float sums anywhere, so the output
    * is cross-engine exact). Output is one row per (conversion,
    * credited touch).
    *
    * Fan-out bound: the per-user join is conversions × in-window
    * touches — unbounded for a hot user with a long lookback — so
    * `maxTouches` caps credit at the most RECENT n touches per
    * conversion (the practical attribution-window cap, and the
    * structural bound that survives 100 TB: the per-conversion
    * window ranks at most the in-window touches and keeps ≤
    * maxTouches). One user-keyed shuffle + one conversion-keyed
    * window over the capped rows — the Theil–Sen cap discipline.
    */
  def attributionLinear(events: DataFrame, touchTypes: Seq[String],
                        convType: String,
                        lookbackSec: Long = 7L * 24 * 3600,
                        maxTouches: Int = 50): DataFrame = {
    require(maxTouches >= 1, "maxTouches >= 1")
    val touches = events.filter(col("event_type").isin(touchTypes.map(lit): _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
    val joined = convs.join(touches, Seq("user_id"))
      .filter(col("touch_ts") <= col("conv_ts") &&
        unix_timestamp(col("conv_ts")) - unix_timestamp(col("touch_ts"))
          <= lookbackSec)
    val recency = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    val perConv = Window.partitionBy(col("conv_id"))
    joined
      .withColumn("__r", row_number().over(recency))
      .filter(col("__r") <= maxTouches)
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .select(col("user_id"), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"),
        round(lit(1.0) / col("n_touches"), 6).as("credit"))
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the third
    * standard model next to [[attributionLastTouch]] and
    * [[attributionLinear]]: the FIRST and LAST in-window touches
    * carry `firstWeight`/`lastWeight` (default the classic 40/40),
    * middles split the remainder equally. Degenerate conventions:
    * one touch takes 1.0, two touches split 0.5/0.5. Same join +
    * recency-cap shape as the linear form (positions are computed
    * over the KEPT set), and the same exactness discipline: per-row
    * rational credits rounded once, NO float sums.
    */
  def attributionPositionBased(events: DataFrame, touchTypes: Seq[String],
                               convType: String,
                               lookbackSec: Long = 7L * 24 * 3600,
                               maxTouches: Int = 50,
                               firstWeight: Double = 0.4,
                               lastWeight: Double = 0.4): DataFrame = {
    require(maxTouches >= 1, "maxTouches >= 1")
    require(firstWeight >= 0 && lastWeight >= 0 &&
      firstWeight + lastWeight <= 1.0, "weights must sum to <= 1")
    val touches = events.filter(col("event_type").isin(touchTypes.map(lit): _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
    val joined = convs.join(touches, Seq("user_id"))
      .filter(col("touch_ts") <= col("conv_ts") &&
        unix_timestamp(col("conv_ts")) - unix_timestamp(col("touch_ts"))
          <= lookbackSec)
    val recency = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    val byTime = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").asc, col("touch_id").asc)
    val perConv = Window.partitionBy(col("conv_id"))
    val n = col("n_touches")
    val credit =
      when(n === 1, lit(1.0))
        .when(n === 2, lit(0.5))
        .when(col("__pos") === 1, lit(firstWeight))
        .when(col("__pos") === n, lit(lastWeight))
        .otherwise(lit(1.0 - firstWeight - lastWeight) /
          (n - 2).cast("double"))
    joined
      .withColumn("__r", row_number().over(recency))
      .filter(col("__r") <= maxTouches)
      .withColumn("__pos", row_number().over(byTime))
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .select(col("user_id"), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"),
        round(credit, 6).as("credit"))
  }

  def attributionLastTouch(events: DataFrame, touchTypes: Seq[String],
                           convType: String,
                           lookbackSec: Long = 7L * 24 * 3600): DataFrame = {
    val ev = events
      .filter(col("event_type").isin((touchTypes :+ convType).map(lit): _*))
      .withColumn("__is_conv",
        when(col("event_type") === convType, 1).otherwise(0))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("__is_conv"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("__touch_ts",
        last(when(col("__is_conv") === 0, col("ts")), ignoreNulls = true).over(w))
      .withColumn("__touch_id",
        last(when(col("__is_conv") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("__is_conv") === 1)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"),
        when(unix_timestamp(col("ts")) - unix_timestamp(col("__touch_ts"))
          <= lookbackSec, col("__touch_id")).as("touch_id"),
        when(unix_timestamp(col("ts")) - unix_timestamp(col("__touch_ts"))
          <= lookbackSec, col("__touch_ts")).as("touch_ts"))
  }

  /** Exponentially-decayed activity feature (r8-w4): for each event,
    * Σ_{k=0..depth-1} α^k · value_{i−k} over the user's previous
    * events in (ts, id) order — the "recent engagement" feature
    * recommendation and fraud models consume, where yesterday's
    * actions count half (α = 0.5).
    *
    * Bounded-depth lag chain, NOT a recurrence: an unbounded EWMA
    * needs a sequential carry per key (no Spark window computes it),
    * and with α ≤ 0.5 the tail beyond `depth` events contributes
    * < α^depth ≈ 1e-5 of the signal — so the contract IS the
    * truncated sum. One user-keyed sort shuffle; the lag chain is
    * per-row codegen over the sorted frame. α = a power of two makes
    * every term's scaling exact in binary floating point and the
    * left-to-right add order is pinned by the expression shape, so
    * the oracle replays bit-identically.
    */
  def decayedFeature(events: DataFrame, alpha: Double = 0.5,
                     depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 64, "depth in [1, 64]")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val terms = (0 until depth).map { k =>
      coalesce(lag(col("value"), k).over(w), lit(0.0)) *
        lit(math.pow(alpha, k))
    }
    events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("decayed_value", terms.reduceLeft(_ + _))
  }

  /** Rolling distinct active users per day — DAU plus trailing
    * W-day actives (WAU-style), the engagement staple every event
    * warehouse reports daily.
    *
    * The naive form — `COUNT(DISTINCT user) OVER (ORDER BY day RANGE
    * 6 PRECEDING)` — doesn't exist as a distributed window (distinct
    * windows aren't supported), and a day×events range self-join
    * re-scans the fact per day. Scale path: dedup to DISTINCT
    * (user, day) FIRST (one user-day-keyed shuffle, state bounded by
    * user-days, never events), then each user-day row supports
    * exactly the W days [day, day+W-1] — a bounded W× explode of the
    * already-tiny user-day frame — and a second distinct collapses a
    * user active on several days inside one window to one row. Day
    * spine = observed days only (trailing windows of empty days
    * aren't reported; the gap-filled variant is [[eventsGapfill]]'s
    * job).
    */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    // day as a TIMESTAMP (date_trunc), not DATE — the artifact/oracle
    // comparison layer treats dates and midnight timestamps differently
    val userDays = events
      .select(date_trunc("day", col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct()
    val dau = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val rolling = userDays
      .select(explode(sequence(col("day"),
        col("day") + expr(s"INTERVAL ${windowDays - 1} DAYS"),
        expr("INTERVAL 1 DAY"))).as("day"), col("u"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("rolling_actives"))
    dau.join(rolling, Seq("day"), "left")
      .select(col("day"), col("dau"), col("rolling_actives"))
  }

  /** Hourly series with LINEAR interpolation of missing hours — the
    * numeric companion to [[eventsGapfill]]'s last-observation carry
    * forward. Missing hours between two observations take the
    * straight line between them; hours before the first / after the
    * last observation take the nearest observed value (flat
    * extrapolation).
    *
    * Same spine discipline as gapfill: the per-group hour spine is
    * generated NEXT to each group's aggregate (no cross join), and
    * the prev/next observation carry is two windows over one
    * group-keyed sort. The interpolation arithmetic —
    * prev + (next−prev)·((h−pt)/(nt−pt)) on IEEE doubles with hour
    * distances as exact small integers — is stated identically in
    * the oracle, so every double replays bit-for-bit.
    */
  def eventsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("v"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hour_ts")).as("mn"), max(col("hour_ts")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    val joined = spine.join(hourly, Seq("event_type", "hour_ts"), "left")
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // epoch SECONDS as the interpolation abscissa (exact small longs;
    // dividing by 3600 first would route through a double division
    // whose long-cast truncates in Spark but rounds in DuckDB)
    val h = col("hour_ts").cast("long")
    val obsH = when(col("v").isNotNull, h)
    val prevV = last(col("v"), ignoreNulls = true).over(wPrev)
    val prevH = last(obsH, ignoreNulls = true).over(wPrev)
    val nextV = first(col("v"), ignoreNulls = true).over(wNext)
    val nextH = first(obsH, ignoreNulls = true).over(wNext)
    joined.select(col("event_type"), col("hour_ts"), col("v"),
        prevV.as("pv"), prevH.as("ph"), nextV.as("nv"), nextH.as("nh"), h.as("h"))
      .select(col("event_type"), col("hour_ts"),
        col("v").isNotNull.as("observed"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("h") - col("ph")).cast("double") /
              (col("nh") - col("ph")).cast("double")))
          .as("filled_value"))
  }

  /** Top-k event-type paths — the most common length-`len` step
    * sequences across user timelines (the "what do users do next"
    * navigation report). A lead() chain over each user's (ts, id)
    * sort builds every consecutive window in ONE pass — zero
    * explode, one user-keyed shuffle — and the global count groups
    * on the tiny type^len path domain. Tie-break (n desc, path asc)
    * pins the top-k cut.
    */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, idCol: String, len: Int = 3,
               k: Int = 25): DataFrame = {
    require(len >= 2 && len <= 8, "len in [2, 8]")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = (0 until len).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .select(steps.zipWithIndex.map { case (c, i) => c.as(s"t$i") }: _*)
      .filter(steps.indices.map(i => col(s"t$i").isNotNull).reduce(_ && _))
      .groupBy(concat_ws(">", steps.indices.map(i => col(s"t$i")): _*).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Theil–Sen robust trend per key (r9-cont; Sen '68): the median of
    * all pairwise slopes (v_j − v_i)/(t_j − t_i) over a key's time
    * series — 29% breakdown, so a burst of outliers can't fake or
    * hide a drift the way it drags an OLS slope (the robust
    * companion to [[madOutliers]] for LEVELS, this is for TRENDS).
    *
    * Exact Theil–Sen is intrinsically O(n²) per key, so the operator
    * bounds it structurally: only the `maxPoints` MOST RECENT points
    * per key enter (row_number over the key-partitioned (ts, id)
    * order — the standard top-N-per-key single shuffle), giving a
    * hard fan-out cap of maxPoints²/2 pairs per key regardless of
    * history length — the 100 TB contract. Pairs with equal
    * timestamps are skipped (slope undefined), pair generation is a
    * key-equi self-join of the capped frame, and the median is the
    * same cross-engine-stable interpolated `percentile` the MAD/
    * decile oracles grade, round(6)-guarded. Returns (key, n_points,
    * n_pairs, trend) for every key with ≥ 1 valid pair.
    */
  def theilSenTrend(events: DataFrame, keyCol: String, idCol: String,
                    tsCol: String, valCol: String,
                    maxPoints: Int = 200): DataFrame = {
    require(maxPoints >= 2, "maxPoints >= 2")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us").desc, col(idCol).desc)
    val pts = events
      .select(col(keyCol), col(idCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(valCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPoints)
    val tracked = graft.Par.persistTracked(pts)
    val a = tracked.select(col(keyCol), col("__us").as("__u1"), col("__v").as("__v1"))
    val b = tracked.select(col(keyCol), col("__us").as("__u2"), col("__v").as("__v2"))
    val slopes = a.join(b, Seq(keyCol))
      .filter(col("__u1") < col("__u2"))
      .select(col(keyCol),
        ((col("__v2") - col("__v1")) /
          ((col("__u2") - col("__u1")).cast("double") / lit(1000000.0)))
          .as("__slope"))
    val trend = slopes.groupBy(col(keyCol))
      .agg((round(expr("percentile(__slope, 0.5)"), 6) + lit(0.0)).as("trend"),
        count(lit(1)).as("n_pairs"))
    val np = tracked.groupBy(col(keyCol)).agg(count(lit(1)).as("n_points"))
    trend.join(np, Seq(keyCol))
      .select(col(keyCol), col("n_points"), col("n_pairs"), col("trend"))
  }

  /** Frequent ORDERED event-type sequences (r9-cont) — sequential
    * pattern mining à la GSP/PrefixSpan, restricted to lengths 2–3:
    * a user supports pattern (a,b) iff some a-event precedes some
    * b-event in their timeline (any gap — subsequence, not adjacency:
    * the order-aware upgrade of [[basketPairs]]' co-occurrence and
    * the gap-tolerant relaxation of [[transitionMatrix]]'s adjacent
    * bigrams). Support = #users, threshold `minSupportFrac` of all
    * active users.
    *
    * The containment tests collapse to occurrence STATISTICS, never
    * event pairs: with per-(user, type) first/last positions over the
    * (ts, id) ordering, (a,b) holds iff minpos(a) < maxpos(b) — and
    * because positions are strictly increasing distinct integers this
    * stays correct for a = b (needs two occurrences) — and (a,b,c)
    * holds iff SOME b-position lies strictly between minpos(a) and
    * maxpos(c), which covers every repeated-symbol case including
    * (x,x,x) ⇔ ≥ 3 occurrences. So the per-user work is |types|²
    * rows, not |events|² — one position window (a single user-keyed
    * shuffle), one (user, type) aggregate, and joins whose fan-out is
    * bounded by type cardinality, with length-3 candidates
    * Apriori-pruned to pairs of frequent length-2 patterns
    * (broadcast, the [[basketTriples]] discipline) and verified by
    * ONE equi-semi-join against the position table with the
    * between-range as residual. The user count for the threshold is
    * one bounded driver scalar (the IVF-centroid discipline).
    *
    * Returns (len, p1, p2, p3 — null for pairs, support).
    */
  def frequentSequences(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, idCol: String,
                        minSupportFrac: Double = 0.2): DataFrame = {
    require(minSupportFrac > 0.0 && minSupportFrac <= 1.0,
      "minSupportFrac in (0, 1]")
    val w = Window.partitionBy(col("u")).orderBy(col(tsCol), col(idCol))
    val pos = graft.Par.persistTracked(
      events.select(col(userCol).as("u"), col(typeCol).as("t"),
          col(tsCol), col(idCol))
        .withColumn("p", row_number().over(w).cast("long"))
        .select(col("u"), col("t"), col("p")))
    val occ = graft.Par.persistTracked(
      pos.groupBy(col("u"), col("t"))
        .agg(min(col("p")).as("minp"), max(col("p")).as("maxp")))
    val nUsers = occ.select(col("u")).distinct().count()
    val minCount = math.max(1L, math.ceil(minSupportFrac * nUsers).toLong)
    val freq2 = graft.Par.persistTracked(
      occ.select(col("u"), col("t").as("p1"), col("minp").as("__minp1"))
        .join(occ.select(col("u"), col("t").as("p2"), col("maxp").as("__maxp2")),
          Seq("u"))
        .filter(col("__minp1") < col("__maxp2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= minCount))
    // Apriori: (a,b,c) needs (a,b) and (b,c) frequent; candidate set
    // is bounded by frequent-pair fan-in, broadcast to the verify join
    val cand = freq2.select(col("p1").as("a"), col("p2").as("b"))
      .join(freq2.select(col("p1").as("b"), col("p2").as("c")), Seq("b"))
      .select(col("a"), col("b"), col("c"))
    val withBounds = occ.select(col("u"), col("t").as("a"), col("minp").as("__minpa"))
      .join(broadcast(cand), Seq("a"))
      .join(occ.select(col("u"), col("t").as("c"), col("maxp").as("__maxpc")),
        Seq("u", "c"))
    val pb = pos.select(col("u").as("__pu"), col("t").as("__pt"), col("p").as("__pp"))
    val freq3 = withBounds
      .join(pb,
        col("u") === col("__pu") && col("b") === col("__pt") &&
          col("__pp") > col("__minpa") && col("__pp") < col("__maxpc"),
        "left_semi")
      .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minCount)
    freq2.select(lit(2L).as("len"), col("p1"), col("p2"),
        lit(null).cast("string").as("p3"), col("support"))
      .unionByName(freq3.select(lit(3L).as("len"), col("a").as("p1"),
        col("b").as("p2"), col("c").as("p3"), col("support")))
  }

  /** Classical additive seasonal decomposition per key (the moving-
    * average method behind R's `decompose` / statsmodels'
    * `seasonal_decompose`): value = trend + seasonal + residual, with
    *
    *   trend_t    = centered MA over 2·halfWindow+1 points,
    *   seasonal_s = mean of detrended values at season index s,
    *                grand-mean-centered so Σ seasonal ≈ 0,
    *   resid_t    = value − trend − seasonal.
    *
    * Cross-engine discipline: every SUM here is over INTEGERS. The
    * detrended value is carried ×w (w = window size): detr_w =
    * w·value − Σ_window value, an exact integer, so the seasonal
    * means and the grand mean are each ONE correctly-rounded double
    * division of integer sums — no order-dependent double
    * accumulation anywhere, and the remaining subtraction chain is
    * fixed-order IEEE. Only rows with a FULL window (the series
    * interior) are emitted; seasonal means use exactly those rows.
    *
    * Plan shape: three window families all partitioned by the key
    * (plus season index) — thousands of series decompose on one
    * exchange, the [[operators.Recurrence.pettitt]] property.
    *
    * @param seasonCol season index expression over the series frame
    *                  (e.g. `hour(col("hr"))` for period-24 hourly)
    * @param valueCol  an integral column (counts); integrality is
    *                  what makes the result hash-stable
    */
  def seasonalDecompose(series: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, seasonCol: org.apache.spark.sql.Column,
                        halfWindow: Int = 12, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(halfWindow > 0, "halfWindow must be positive")
    val w = 2 * halfWindow + 1
    val win = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(-halfWindow, halfWindow)
    val interior = series
      .select(col(keyCol), col(tsCol), col(valueCol).cast("long").as("__v"),
        seasonCol.as("__s"))
      .withColumn("__tsum", sum(col("__v")).over(win))
      .withColumn("__wcnt", count(lit(1)).over(win))
      .filter(col("__wcnt") === w)
      .withColumn("__detr", lit(w.toLong) * col("__v") - col("__tsum"))
    val bySeason = Window.partitionBy(col(keyCol), col("__s"))
    val byKey = Window.partitionBy(col(keyCol))
    interior
      .withColumn("__ssum", sum(col("__detr")).over(bySeason))
      .withColumn("__sn", count(lit(1)).over(bySeason))
      .withColumn("__gsum", sum(col("__detr")).over(byKey))
      .withColumn("__gn", count(lit(1)).over(byKey))
      .withColumn("trend", col("__tsum").cast("double") / lit(w.toDouble))
      .withColumn("seasonal",
        col("__ssum").cast("double") / (lit(w.toDouble) * col("__sn"))
          - col("__gsum").cast("double") / (lit(w.toDouble) * col("__gn")))
      .withColumn("resid",
        col("__v").cast("double") - col("trend") - col("seasonal"))
      .select(col(keyCol), col(tsCol), col("__v").as("value"),
        round(col("trend"), roundTo).as("trend"),
        round(col("seasonal"), roundTo).as("seasonal"),
        round(col("resid"), roundTo).as("resid"))
  }

  /** Seasonal-residual anomaly detection — [[seasonalDecompose]]
    * composed with the robust MAD rule (the [[madOutliers]]
    * discipline) on the RESIDUAL: a point is anomalous when its
    * residual deviates from the key's median residual by more than
    * k·MAD. Deseasonalizing first is what separates "3am spike"
    * from "every 3am looks like this" — the raw-value MAD screen
    * flags the daily peak forever; this flags departures from the
    * expected shape. Input to the MAD stage is the decomposition's
    * ROUNDED residual, so the whole chain replays in SQL.
    *
    * @return every interior point with (value, resid, med, mad,
    *         is_anomaly); the k·MAD compare runs on round-6 values
    *         (the madOutliers cross-engine guard)
    */
  def stlAnomaly(series: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, seasonCol: org.apache.spark.sql.Column,
                 halfWindow: Int = 12, k: Double = 3.0): DataFrame = {
    val dec = seasonalDecompose(series, keyCol, tsCol, valueCol,
        seasonCol, halfWindow)
      // the MAD stage runs on ×10⁶-SCALED residuals: resid is
      // round-6, so __r6 is an exact integer and every percentile
      // interpolation below lands on dyadic values (k or k.5 /
      // k.25) — bit-identical across engines, where interpolating
      // raw doubles puts the two engines' ulp-different medians on
      // opposite sides of the round-6 boundary (observed at sf0.001)
      .withColumn("__r6", round(col("resid") * lit(1e6)).cast("long"))
    val med = dec.groupBy(col(keyCol).as("__g"))
      .agg(expr("percentile(__r6, 0.5)").as("__med_s"))
    val withMed = dec.join(med, col(keyCol) === col("__g")).drop("__g")
      .withColumn("__dev_s", abs(col("__r6").cast("double") - col("__med_s")))
    val mad = withMed.groupBy(col(keyCol).as("__g"))
      .agg(expr("percentile(__dev_s, 0.5)").as("__mad_s"))
    withMed.join(mad, col(keyCol) === col("__g")).drop("__g")
      .select(col(keyCol), col(tsCol), col("value"), col("resid"),
        round(col("__med_s") / lit(1e6), 6).as("med"),
        round(col("__mad_s") / lit(1e6), 6).as("mad"),
        (col("__dev_s") > lit(k) * col("__mad_s")).as("is_anomaly"))
  }

  /** 2-D skyline / Pareto frontier (Börzsönyi et al. '01, "The
    * Skyline Operator"): rows not DOMINATED on two maximized
    * criteria — r dominates s iff r.x ≥ s.x ∧ r.y ≥ s.y with at
    * least one strict. The multi-criteria curation cut ("keep docs
    * on the quality × freshness frontier") that no single scoring
    * function expresses: any weighted sum picks ONE point of the
    * frontier; the skyline keeps them all.
    *
    * The 2-D case needs no O(n²) dominance join: group to one row
    * per distinct x (the per-x max y — anything below is dominated
    * at equal x), then a row survives iff its y exceeds the best y
    * among STRICTLY greater x — a lagged running max over the
    * x-descending order. One small sorted window over the |distinct
    * x|-sized frame, one semi-join back; equal (x, y) duplicates all
    * survive (nothing dominates them — they tie).
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per distinct x: the frontier candidate y
    val perX = df.groupBy(col(xCol).as("__x")).agg(max(col(yCol)).as("__ymax"))
    val byXDesc = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // best y among strictly greater x (null for the max x — survives)
    val frontierX = perX
      .withColumn("__prior", max(col("__ymax")).over(byXDesc))
      .filter(col("__prior").isNull || col("__ymax") > col("__prior"))
      .select(col("__x"), col("__ymax"))
    df.join(frontierX,
      col(xCol) === col("__x") && col(yCol) === col("__ymax"), "left_semi")
  }

  /** Mann–Kendall monotone-trend TEST per key (Mann '45, Kendall '75)
    * — the significance half of the [[theilSenTrend]] pairing (MK
    * answers "IS there a trend", Theil–Sen "how steep"; the two are
    * the standard non-parametric trend kit): over the key's ordered
    * series, S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    * continuity-corrected z = (S∓1)/√Var — verdict at |z| > 1.96.
    *
    * Portability: x is an integer series (period counts), so S, the
    * variance NUMERATOR (kept ×18 as an exact integer), and the
    * n/tie terms are all exact; z is one double tree, rounded once.
    * The pair space is an intra-key self-join — O(n²) per key by
    * DEFINITION (n = periods, bounded by the calendar: decades of
    * weeks is ~10³ → ≤10⁶ pairs per key, each a subtraction);
    * tie groups aggregate separately, one key exchange each.
    * Keys need n ≥ 3 (below that Var(S) degenerates); zero variance
    * (all-tied series) reports z null, verdict 'no_trend'.
    */
  def mannKendall(series: DataFrame, keyCol: String, periodCol: String,
                  valueCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val base = graft.Par.persistTracked(
      series.select(col(keyCol).as("__k"), col(periodCol).cast("long").as("__p"),
        col(valueCol).cast("long").as("__x")))
    val pairs = base
      .join(base.select(col("__k").as("__k2"), col("__p").as("__p2"),
          col("__x").as("__x2")),
        col("__k") === col("__k2") && col("__p") < col("__p2"))
      .groupBy(col("__k"))
      .agg(sum(signum(d(col("__x2") - col("__x"))).cast("long")).as("s_stat"))
    val ties = base.groupBy(col("__k"), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__groups"), sum(col("__t")).as("__n"),
        sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5))
          .as("__tieTerm"))
      .withColumn("__var18",
        col("__n") * (col("__n") - 1) * (lit(2) * col("__n") + 5)
          - col("__tieTerm"))
    pairs.join(ties, Seq("__k"))
      .filter(col("__n") >= 3)
      .withColumn("z",
        when(col("__var18") > 0,
          when(col("s_stat") === 0, lit(0.0)).otherwise(
            round((d(col("s_stat"))
                - signum(d(col("s_stat")))) // continuity correction
              / sqrt(d(col("__var18")) / lit(18.0)), roundTo))))
      .select(col("__k").as(keyCol), col("__n").as("n_periods"),
        col("s_stat"), col("__var18").as("var18"), col("z"),
        when(col("z").isNull, lit("no_trend"))
          .when(col("z") > 1.959964, lit("increasing"))
          .when(col("z") < -1.959964, lit("decreasing"))
          .otherwise(lit("no_trend")).as("verdict"))
  }

  /** Two-regressor OLS per key (closed-form multiple regression —
    * the rung above olsTrend's single slope: fit
    * y = a + b₁·t + b₂·w jointly so the trend coefficient is no
    * longer confounded by the dummy, e.g. daily volume on a time
    * index PLUS a weekend indicator; "is volume really declining, or
    * do weekends just land late in the window?"): the 3×3 normal
    * equations solved by Cramer's rule — four determinants, each an
    * EXACT integer expression over the nine sufficient sums
    * (n, Σt, Σw, Σt², Σtw, Σw², Σy, Σty, Σwy; decimal(38,0) /
    * HUGEINT — triple products fit to sums ≈ 1e12, far past the
    * graded magnitudes), betas = det ratios, R² from the closed-form
    * SSE = Σy² − a·Σy − b₁·Σty − b₂·Σwy. One key aggregate; singular
    * designs (a constant regressor — e.g. a span with no weekend)
    * report null betas rather than exploding.
    */
  def olsMulti(df: DataFrame, keyCol: String, tCol: String, wCol: String,
               yCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = df.select(col(keyCol), dec(col(tCol)).as("__t"),
        dec(col(wCol)).as("__w"), dec(col(yCol)).as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__t")).as("__st"), sum(col("__w")).as("__sw"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("__t") * col("__w")).as("__stw"),
        sum(col("__w") * col("__w")).as("__sww"),
        sum(col("__y")).as("__sy"),
        sum(col("__t") * col("__y")).as("__sty"),
        sum(col("__w") * col("__y")).as("__swy"),
        sum(col("__y") * col("__y")).as("__syy"))
    // first-row cofactor expansion, all in exact decimals
    def det3(a: Column, b: Column, c0: Column,
             dd: Column, e: Column, ff: Column,
             g: Column, h: Column, i: Column): Column =
      a * (e * i - ff * h) - b * (dd * i - ff * g) + c0 * (dd * h - e * g)
    val out = agg
      .withColumn("__det", det3(col("__n"), col("__st"), col("__sw"),
        col("__st"), col("__stt"), col("__stw"),
        col("__sw"), col("__stw"), col("__sww")))
      .withColumn("__deta", det3(col("__sy"), col("__st"), col("__sw"),
        col("__sty"), col("__stt"), col("__stw"),
        col("__swy"), col("__stw"), col("__sww")))
      .withColumn("__detb1", det3(col("__n"), col("__sy"), col("__sw"),
        col("__st"), col("__sty"), col("__stw"),
        col("__sw"), col("__swy"), col("__sww")))
      .withColumn("__detb2", det3(col("__n"), col("__st"), col("__sy"),
        col("__st"), col("__stt"), col("__sty"),
        col("__sw"), col("__stw"), col("__swy")))
      .withColumn("__a", when(col("__det") =!= 0,
        d(col("__deta")) / d(col("__det"))))
      .withColumn("__b1", when(col("__det") =!= 0,
        d(col("__detb1")) / d(col("__det"))))
      .withColumn("__b2", when(col("__det") =!= 0,
        d(col("__detb2")) / d(col("__det"))))
      .withColumn("__sse",
        d(col("__syy")) - col("__a") * d(col("__sy"))
          - col("__b1") * d(col("__sty")) - col("__b2") * d(col("__swy")))
      .withColumn("__sst",
        d(col("__syy")) - d(col("__sy")) * d(col("__sy")) / d(col("__n")))
    out.select(col(keyCol), col("__n").cast("long").as("n"),
      round(col("__a"), roundTo).as("intercept"),
      round(col("__b1"), roundTo).as("beta_t"),
      round(col("__b2"), roundTo).as("beta_w"),
      round(when(col("__det") =!= 0 && col("__sst") > 0,
        lit(1.0) - col("__sse") / col("__sst")), roundTo).as("r2"))
  }

  /** Safety-stock / reorder-point sizing per part (the textbook
    * z·σ·√L inventory formula — the PRESCRIPTIVE rung above
    * [[Analytics]]' ABC/XYZ descriptive classifications: given the
    * measured demand variability, how much buffer does a target
    * service level need?): over the corpus's month span with absent
    * months counted as ZERO demand (zero months shift both mean and
    * variance — ignoring them systematically undersizes the buffer),
    *
    *   σ_d    = √((n·Σq² − (Σq)²)/(n·(n−1))),
    *   safety = z·σ_d·√L,   reorder = μ_d·L + safety.
    *
    * The zero-fill is CLOSED-FORM: zero months add nothing to Σq or
    * Σq², so only n needs the corpus span — one window over the
    * already-aggregated (part, month) frame (the surprisal
    * discipline, no scalar cross join), never a materialized grid.
    * z rides as a LITERAL (1.644854 = 95% service; no inverse CDF),
    * sums are exact integers/decimals, each output one fixed double
    * tree rounded once. Spans of one month report null σ.
    */
  def safetyStock(lineitem: DataFrame, partFilter: Column,
                  leadMonths: Double = 2.0, zService: Double = 1.644854,
                  roundTo: Int = 6): DataFrame = {
    require(leadMonths > 0, "leadMonths must be positive")
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dem = lineitem.filter(partFilter)
      .select(col("l_partkey").as("part"),
        ((year(col("l_shipdate").cast("timestamp")) - 1970) * 12
          + month(col("l_shipdate").cast("timestamp")) - 1).cast("long")
          .as("m"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("part"), col("m"))
      .agg(sum(col("q")).as("qty"))
    val withSpan = dem
      .withColumn("__lo", min(col("m")).over(wAll))
      .withColumn("__hi", max(col("m")).over(wAll))
    withSpan.groupBy(col("part"))
      .agg(max(col("__hi") - col("__lo") + 1).as("n_months"),
        sum(col("qty")).as("__s"),
        sum(dec(col("qty")) * dec(col("qty"))).as("__q"))
      .withColumn("__mu", d(col("__s")) / d(col("n_months")))
      .withColumn("__sd",
        when(col("n_months") > 1, sqrt(
          (d(col("n_months")) * d(col("__q")) - d(col("__s")) * d(col("__s")))
            / (d(col("n_months")) * (d(col("n_months")) - lit(1.0))))))
      .select(col("part"), col("n_months"),
        round(col("__mu"), roundTo).as("mean_demand"),
        round(col("__sd"), roundTo).as("sd_demand"),
        round(lit(zService) * col("__sd") * sqrt(lit(leadMonths)), roundTo)
          .as("safety_stock"),
        round(col("__mu") * lit(leadMonths)
          + lit(zService) * col("__sd") * sqrt(lit(leadMonths)), roundTo)
          .as("reorder_point"))
  }

  /** Time-weighted average per key (the TWAP/irregular-sampling
    * correction — a plain mean over unevenly-spaced samples
    * overweights bursts: fifty readings in a hot minute count fifty
    * times, the quiet day once; the time-weighted form weights each
    * value by how long it HELD): value v_i holds from its timestamp
    * until the key's next sample, twa = Σ v_i·Δt_i / (t_N − t_1) —
    * the last sample holds nothing (the standard left-step
    * convention, documented).
    *
    * Engine-exact: epoch seconds are integers, values enter as
    * 1e2-scaled integers (the clean-2-decimal money contract), so
    * the weighted numerator Σ v100·Δsec is an exact decimal(38,0)
    * sum and twa is ONE double division. One lead window + one
    * aggregate on a single key exchange; zero-span keys (one sample,
    * or all samples on one timestamp) report twa null.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val byTs = Window.partitionBy(col(keyCol))
      .orderBy(col("__sec"), col(idCol))
    val base = df.select(col(keyCol),
        unix_timestamp(col(tsCol).cast("timestamp")).as("__sec"),
        col(idCol),
        round(col(valueCol).cast("double") * lit(100.0)).cast("long")
          .as("__v100"))
      .withColumn("__nsec", lead(col("__sec"), 1).over(byTs))
    base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        (max(col("__sec")) - min(col("__sec"))).as("span_sec"),
        sum(when(col("__nsec").isNotNull,
          dec(col("__v100")) * dec(col("__nsec") - col("__sec")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__w"))
      .select(col(keyCol), col("n"), col("span_sec"),
        round(when(col("span_sec") > 0,
          d(col("__w")) / (lit(100.0) * d(col("span_sec")))), roundTo)
          .as("twa"))
  }

  /** Lagged cross-correlation between two event-type count series
    * (Box–Jenkins CCF — the lead/lag identification step before any
    * "did views DRIVE purchases" claim): both types bucket to hourly
    * counts on a shared gap-filled spine (a missing hour is a REAL
    * zero — skipping it would splice non-adjacent hours together),
    * then for each lag 0..maxLag, Pearson r between x_t and y_{t+lag}
    * over the N−lag overlapping buckets.
    *
    * Scale shape: the series frame is bounded by the time span
    * (hours), never event volume — counts aggregate map-side first;
    * the lag joins are equi-joins on the hour index against that
    * bounded frame. Moments are exact integer sums; r is one fixed
    * double tree rounded once (the house discipline). Zero variance
    * on either side → null r.
    */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
                       xType: String, yType: String, maxLag: Int,
                       roundTo: Int = 6): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val hourly = events
      .filter(col(typeCol).isin(xType, yType))
      .groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(sum(when(col(typeCol) === xType, 1L).otherwise(0L)).as("x"),
        sum(when(col(typeCol) === yType, 1L).otherwise(0L)).as("y"))
    val spine = hourly
      .agg(min(col("hour_ts")).as("mn"), max(col("hour_ts")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val series = spine.join(hourly, Seq("hour_ts"), "left")
      .select(
        (unix_timestamp(col("hour_ts")) / 3600L).cast("long").as("k"),
        coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val lags = series.sparkSession.range(0, maxLag + 1)
      .select(col("id").as("lag"))
    val a = series.select(col("k"), col("x"))
      .crossJoin(broadcast(lags))
    val b = series.select(col("k").as("kb"), col("y"))
    val pairs = a.join(b, a("k") + a("lag") === b("kb"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(dec(col("x")) * dec(col("x"))).as("__sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("__syy"),
        sum(dec(col("x")) * dec(col("y"))).as("__sxy"))
      .filter(col("n") >= 2)
      .withColumn("__cnum",
        d(col("n")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy")))
      .withColumn("__cdx",
        d(col("n")) * d(col("__sxx")) - d(col("__sx")) * d(col("__sx")))
      .withColumn("__cdy",
        d(col("n")) * d(col("__syy")) - d(col("__sy")) * d(col("__sy")))
      .select(col("lag"), col("n"),
        round(when(col("__cdx") > 0 && col("__cdy") > 0,
          col("__cnum") / sqrt(col("__cdx") * col("__cdy"))), roundTo)
          .as("r"))
      .orderBy(col("lag"))
  }
}
