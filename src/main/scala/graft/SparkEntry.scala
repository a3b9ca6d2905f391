package graft

import graft.operators._
import graft.pipeline.{Analytics, Dag, DayReplay, IncrementalModel, Models, Schedule}
import graft.sources.SchemaEvolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query here has a matching DuckDB oracle in [[oracleSql]]
  * unless its arithmetic isn't portable (hash-based ops), in which
  * case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  // cutoff splitting the events log for CDC scenarios
  private val CdcCutoff = "2024-01-20 00:00:00"

  private def eventCols(df: DataFrame): DataFrame =
    df.select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the session value after. The streaming graded queries
    * use this: a stateful streaming op instantiates one STATE STORE
    * per shuffle partition per microbatch, so the session's
    * batch-sized width (32 here) pays ~32 store open/commit cycles
    * per stateful op per batch for state that is tiny — a fixed
    * overhead the watermark logic never amortizes. The stream picks
    * its width from the conf at CHECKPOINT CREATION (each graded run
    * uses a fresh temp checkpoint, so the pin applies); on a real
    * deployment this is the `spark.sql.shuffle.partitions` you set
    * for the streaming job, sized to state volume, not batch width.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Snapshot a Derby in-memory warehouse table to a tracked temp
    * parquet dir and DROP the database before returning the graded
    * read-back (r10 verdict: per-invocation `jdbc:derby:memory` DBs
    * were never dropped, pinning a full orders-table copy in JVM heap
    * per bench/verify pass — the prime suspect for the broad ~8%
    * no-code-change bench drift). The snapshot decouples the lazy
    * result frame from the database so the drop can happen eagerly.
    */
  private def derbySnapshotAndDrop(s: SparkSession, url: String, db: String,
      table: String, prefix: String): DataFrame = {
    val snap = graft.TempDirs.create(prefix) + "/snap"
    s.read.format("jdbc").option("url", url).option("dbtable", table).load()
      .write.parquet(snap)
    graft.sources.Sink.dropDerbyInMemory(db)
    s.read.parquet(snap)
  }

  /** pk-sampled co-purchase edge list shared by the graph_* queries:
    * parts that appear on the same order, ¼ of parts pushed to the
    * scan to bound the (dense) graph's wedge count — the same slice
    * every graph query grades on.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.select(col("ok"), col("pk").as("pa"))
      .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- analytics (§2.4) ----
    "q1_pricing_summary" -> ((s, d) => Analytics.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Analytics.q3ShippingPriority(s, d)),
    "q5_regional_revenue" -> ((s, d) => Analytics.q5RegionalRevenue(s, d)),
    "q10_returned_revenue" -> ((s, d) => Analytics.q10ReturnedRevenue(s, d)),
    "q14_promo_share" -> ((s, d) => Analytics.q14PromoShare(s, d)),
    "top_orders_per_cust" -> ((s, d) => Analytics.topOrdersPerCust(s, d)),
    "events_hourly" -> ((s, d) => Analytics.eventsHourly(s, d)),
    "q4_returned_priority" -> ((s, d) => Analytics.q4ReturnedByPriority(s, d)),
    "q21_waiting_supplier" -> ((s, d) => Analytics.q21WaitingSupplier(s, d)),
    // r8 wave 3: the remaining TPC-H shapes (adapted where the schema
    // lacks partsupp/commitdate — each adaptation is stated in the
    // operator's doc and replayed verbatim by its oracle)
    "q6_forecast_revenue" -> ((s, d) => Analytics.q6ForecastRevenue(s, d)),
    "q7_volume_shipping" -> ((s, d) => Analytics.q7VolumeShipping(s, d)),
    "q8_market_share" -> ((s, d) => Analytics.q8MarketShare(s, d)),
    "q9_product_profit" -> ((s, d) => Analytics.q9ProductProfit(s, d)),
    "q11_important_parts" -> ((s, d) => Analytics.q11ImportantParts(s, d)),
    "q12_late_priority" -> ((s, d) => Analytics.q12LateByPriority(s, d)),
    "q15_top_supplier" -> ((s, d) => Analytics.q15TopSupplier(s, d)),
    "q16_supplier_counts" -> ((s, d) => Analytics.q16SupplierCounts(s, d)),
    "q17_small_qty_revenue" -> ((s, d) => Analytics.q17SmallQtyRevenue(s, d)),
    "q19_banded_revenue" -> ((s, d) => Analytics.q19BandedRevenue(s, d)),
    "q20_excess_shippers" -> ((s, d) => Analytics.q20ExcessShippers(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => Analytics.q2MinCostSupplier(s, d)),
    // bloom semi-join reduction (r8 wave 3): the fact is pruned at
    // the scan side of the shuffle by a broadcast 1-row sketch of the
    // filtered dim keys; the oracle is the PLAIN join — the bloom is
    // semantically transparent (no false negatives)
    // r8 wave 3: grouping-sets/time-series/segment analytics staples
    "cube_revenue" -> ((s, d) => Analytics.cubeRevenue(s, d)),
    "events_gapfill" -> ((s, d) => Analytics.eventsGapfill(s, d)),
    // r8 wave 5: linear-interpolation twin of the LOCF gapfill
    "events_interpolate" -> ((s, d) =>
      Analytics.eventsInterpolate(s, d)
        .orderBy(col("event_type"), col("hour_ts"))),
    // r8 wave 5: rolling distinct actives (DAU + trailing-7d)
    "events_active_users" -> ((s, d) =>
      Analytics.activeUsers(Tables.events(s, d), "user_id", "ts", 7)
        .orderBy(col("day"))),
    // r8 wave 5: top event-type trigram paths across user timelines
    "events_top_paths" -> ((s, d) =>
      Analytics.topPaths(Tables.events(s, d), "user_id", "event_type",
        "ts", "event_id", len = 3, k = 25)),
    // r8 wave 5: per-type coverage islands — event windows [ts, ts+10min]
    // merged into disjoint covered intervals
    "sessions_coverage" -> ((s, d) => {
      val iv = Tables.events(s, d).select(col("event_type"),
        col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("hi"))
      Sessionize.mergeIntervals(iv, Seq("event_type"), "lo", "hi")
        .withColumn("covered_sec",
          col("island_end").cast("long") - col("island_start").cast("long"))
        .orderBy(col("event_type"), col("island_seq"))
    }),
    // r8 wave 5: generalized MERGE INTO — conditional update, ordered
    // matched-clause chain (update wins over delete), conditional
    // insert, source-driven retirement; one full-outer key join
    "merge_into" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val source = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("o_orderstatus", lit("M"))
      Merge.mergeInto(target, source, Seq("o_orderkey"),
        matched = Seq(
          Merge.MatchedUpdate(
            Map("o_totalprice" -> col("s.o_totalprice"),
              "o_orderstatus" -> lit("U")),
            Some(col("s.o_totalprice") > 200000.0)),
          Merge.MatchedDelete(Some(col("t.o_orderstatus") === "F"))),
        notMatched = Seq(
          Merge.NotMatchedInsert(cond = Some(col("s.o_totalprice") > 150000.0))),
        notMatchedBySource = Seq(
          Merge.NotMatchedBySourceDelete(
            Some(col("t.o_orderpriority") === "1-URGENT"))))
        .orderBy(col("o_orderkey"))
    }),
    // Versioned-table MERGE INTO (r10): the same clause chain as
    // merge_into, committed atomically through the manifest CAS —
    // graded across BOTH committed versions (version 1 must still
    // time-travel to the pre-merge snapshot after the merge lands,
    // version 2 is the merge result)
    "versioned_merge_into" -> ((s, d) => {
      import graft.sources.Versioned
      val root = graft.TempDirs.create("graft_vmi_") + "/t"
      val o = Tables.orders(s, d)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val source = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("o_orderstatus", lit("M"))
      val v1 = Versioned.commit(target, root, replace = true)
      require(v1 == 1, s"expected bootstrap commit at version 1, got $v1")
      val v2 = Versioned.mergeInto(source, root, Seq("o_orderkey"),
        matched = Seq(
          Merge.MatchedUpdate(
            Map("o_totalprice" -> col("s.o_totalprice"),
              "o_orderstatus" -> lit("U")),
            Some(col("s.o_totalprice") > 200000.0)),
          Merge.MatchedDelete(Some(col("t.o_orderstatus") === "F"))),
        notMatched = Seq(
          Merge.NotMatchedInsert(cond = Some(col("s.o_totalprice") > 150000.0))),
        notMatchedBySource = Seq(
          Merge.NotMatchedBySourceDelete(
            Some(col("t.o_orderpriority") === "1-URGENT"))))
      require(v2 == 2, s"expected the merge to commit version 2, got $v2")
      Versioned.read(s, root, version = Some(1))
        .withColumn("version", lit(1L))
        .unionByName(Versioned.read(s, root).withColumn("version", lit(2L)))
        .orderBy(col("version"), col("o_orderkey"))
    }),
    // write-audit-publish (r11): a dirty candidate (null custkeys
    // injected) STAGES but fails its not-null audit → head untouched,
    // segment reclaimed; the corrected candidate publishes v2. The
    // graded read-back proves the gate: the dirty rows can never
    // appear, and published_version counts only CLEAN publishes.
    "versioned_wap" -> ((s, d) => {
      import graft.sources.Versioned
      val root = graft.TempDirs.create("graft_wap_") + "/t"
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val audit = (df: DataFrame) => df.filter(col("o_custkey").isNull)
      val day1 = o.filter(col("o_orderkey") % 2 === 0)
      val (p1, _) = Versioned.writeAuditPublish(day1, root, audit)
      require(p1.contains(1), s"clean bootstrap must publish v1, got $p1")
      val dirty = day1.unionByName(o.filter(col("o_orderkey") % 2 =!= 0)
        .withColumn("o_custkey", when(col("o_orderkey") % 97 === 0,
          lit(null).cast("long")).otherwise(col("o_custkey"))))
      val (p2, fail2) = Versioned.writeAuditPublish(dirty, root, audit)
      require(p2.isEmpty && !fail2.isEmpty,
        "the dirty candidate must be rejected with failure rows")
      val (p3, _) = Versioned.writeAuditPublish(
        dirty.filter(col("o_custkey").isNotNull), root, audit)
      require(p3.contains(2), s"corrected candidate must publish v2, got $p3")
      Versioned.read(s, root)
        .withColumn("published_version",
          lit(Versioned.currentVersion(s, root).toLong))
        .orderBy(col("o_orderkey"))
    }),

    // r8 wave 5: Apriori frequent triples — the oracle states the
    // definitional (unpruned) triple self-join, so the gate proves the
    // anti-monotonic candidate pruning lossless
    "basket_triples" -> ((s, d) =>
      Analytics.frequentTriples(s, d)
        .orderBy(col("brand_a"), col("brand_b"), col("brand_c"))),
    // r8 wave 5: late-arriving dimension — facts referencing dim keys
    // the dim feed hasn't delivered get placeholder "inferred members"
    "dim_late_arriving" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))
        .filter(col("c_custkey") % 11 =!= 0) // simulate the lagging feed
      Models.inferredMembers(dim, Tables.orders(s, d), "c_custkey",
          "o_custkey",
          Map("c_name" -> lit("UNKNOWN"), "c_mktsegment" -> lit("UNKNOWN"),
            "c_acctbal" -> lit(0.0)))
        .orderBy(col("c_custkey"))
    }),
    // r8 wave 5: Benford's-law audit screen over order amounts
    "dq_benford" -> ((s, d) =>
      Quality.benford(Tables.orders(s, d), "o_totalprice",
          Seq("o_orderpriority"))
        .orderBy(col("o_orderpriority"), col("digit"))),
    // r8 wave 5: functional-dependency violations — "is l_partkey →
    // l_suppkey an FD?" (it isn't: parts ship from many suppliers)
    "dq_fd_violations" -> ((s, d) =>
      Quality.fdViolations(Tables.lineitem(s, d), Seq("l_partkey"), "l_suppkey")
        .orderBy(col("l_partkey"))),
    // cohort LTV curves (r11): cumulative decimal revenue per
    // first-order-month cohort, normalized by cohort size
    "cohort_ltv" -> ((s, d) =>
      Analytics.cohortLtv(Tables.orders(s, d))
        .orderBy(col("cohort_month"), col("period_m"))),
    // ABC classification per brand (r11): part revenue in exact
    // 1e-4 integer units, class thresholds as integer
    // cross-products — no float share anywhere
    "abc_parts" -> ((s, d) => {
      val units = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1) - col("l_discount").cast("decimal(12,2)"))
            * lit(10000)).cast("long").as("u"))
        .groupBy(col("l_partkey")).agg(sum(col("u")).as("rev_u"))
      val df = units.join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_partkey"), col("rev_u"))
      Analytics.abcClassification(df, "p_brand", "p_partkey", "rev_u")
        .orderBy(col("p_brand"), col("rank"))
    }),
    // column-level snapshot diff (r11): which FIELDS drift between
    // snapshots — per-column null-safe change counts from one
    // full-outer join + one wide aggregate, then a bounded unpivot
    "cdc_column_diff" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderpriority"))
      val newer = base.filter(col("o_orderkey") % 31 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 13 === 0, lit("9-RECLASSED"))
            .otherwise(col("o_orderpriority")))
        .unionByName(base.filter(col("o_orderkey") % 17 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 900000000L))
      operators.Cdc.columnDiff(base, newer, Seq("o_orderkey"),
          Seq("o_custkey", "o_totalprice", "o_orderpriority"))
        .orderBy(col("column_name"))
    }),
    // semi-additive month-end balance snapshots (r11): the Kimball
    // periodic-snapshot fact — exact-decimal running balances carried
    // through quiet months on a per-account month grid
    "fact_balance_snapshots" -> ((s, d) =>
      Analytics.periodEndBalances(Tables.orders(s, d), "o_custkey",
          "o_orderdate", "o_totalprice")
        .orderBy(col("o_custkey"), col("month_start"))),
    // week-over-week growth per event type (r11): Δ and Δ% vs the
    // preceding CALENDAR week — gap weeks null the comparison
    "events_wow_growth" -> ((s, d) =>
      Analytics.weekOverWeek(eventCols(Tables.events(s, d)),
          "event_type", "ts")
        .orderBy(col("event_type"), col("week_start"))),
    // XYZ demand-variability classes (r11): ABC's companion axis —
    // CV of monthly shipped quantity per part, class boundaries
    // compared in EXACT integer arithmetic (4·varNum < Σv² etc.)
    "inventory_xyz" -> ((s, d) =>
      Analytics.xyzClassification(Tables.lineitem(s, d)
          .select(col("l_partkey"),
            date_trunc("month", col("l_shipdate")).as("period"),
            col("l_quantity")),
        "l_partkey", "period", "l_quantity")
        .orderBy(col("l_partkey"))),
    // per-nation revenue Gini (r11): customer-revenue concentration
    // — exact decimal rank sums, one double division
    "revenue_gini" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      val df = rev
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          rev("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("c_custkey"), col("rev"))
      Analytics.giniConcentration(df, "nation", "c_custkey", "rev")
        .orderBy(col("nation"))
    }),
    // referential-integrity audit (r11): dbt's relationships test —
    // orphan child keys per declared FK edge
    "dq_referential" -> ((s, d) =>
      Quality.referentialIntegrity(Seq(
          ("orders.custkey->customer", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey"),
          ("lineitem.orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"),
          ("lineitem.partkey->part", Tables.lineitem(s, d), "l_partkey",
            Tables.part(s, d), "p_partkey"),
          ("lineitem.suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
            Tables.supplier(s, d), "s_suppkey")))
        .orderBy(col("relationship"))),
    // 2-D skyline (r11): orders on the price × recency Pareto
    // frontier — the sorted-window form, no dominance self-join; the
    // oracle is the definitional NOT EXISTS dominance scan
    "skyline_frontier" -> ((s, d) =>
      Analytics.skyline2d(
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
          "o_totalprice", "o_orderdate")
        .orderBy(col("o_orderkey"))),
    // candidate-key discovery (r11): uniqueness profiling of proposed
    // key combos in ONE scan — run before wiring a key into an
    // upsert/SCD2 merge
    "dq_candidate_keys" -> ((s, d) =>
      Quality.candidateKeys(Tables.orders(s, d), Seq(
          Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderstatus"),
          Seq("o_orderdate"), Seq("o_custkey", "o_orderdate"),
          Seq("o_orderdate", "o_orderstatus")))
        .orderBy(col("columns"))),
    "audience_overlap" -> ((s, d) =>
      Analytics.audienceOverlap(Tables.events(s, d), "event_type", "user_id")
        .orderBy(col("type_a"), col("type_b"))),
    "events_value_histogram" -> ((s, d) =>
      Analytics.valueHistogram(Tables.events(s, d), "event_type", "value")
        .orderBy(col("event_type"), col("bin"))),
    // melt (unpivot) round trip of the wide per-user pivot — the
    // long form carries explicit zero cells, same as the pivot
    "events_pivot_melt" -> ((s, d) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "n_events")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // per-file bloom index point lookup (r8 wave 3): the layout is
    // clustered by PRICE, so orderkey min/max can't prune — the
    // bloom sketches do; oracle = the plain equality filter
    "bloom_point_read" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_bloompt_")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sources.Sink.clusteredWrite(o, dir, Seq("o_totalprice"), numFiles = 16)
      graft.sources.Sink.writeFileBloom(s, dir, "o_orderkey",
        expectedItemsPerFile = 100000L)
      graft.sources.Sink.bloomPointRead(s, dir, "o_orderkey", 1234L)
    }),

    "events_winsorized" -> ((s, d) =>
      Analytics.winsorize(eventCols(Tables.events(s, d))
          .select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"), col("clipped"))
        .orderBy(col("event_id"))),
    "events_transitions" -> ((s, d) =>
      Analytics.transitionMatrix(Tables.events(s, d), "user_id", "event_type",
          "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))),
    // Markov next-event accuracy (r11): is "predict the modal
    // successor" worth deploying? — per-state argmax + one division
    "events_markov_accuracy" -> ((s, d) =>
      Analytics.markovAccuracy(Tables.events(s, d), "user_id",
          "event_type", "ts", "event_id")
        .orderBy(col("from_type"))),
    "events_rolling_range" -> ((s, d) =>
      Analytics.eventsRollingRange(s, d)
        .orderBy(col("user_id"), col("event_id"))),
    "events_value_deciles" -> ((s, d) =>
      Analytics.valueDeciles(Tables.events(s, d), "event_type", "value",
          "event_id")
        .orderBy(col("event_type"), col("decile"))),

    "bloom_reduced_join" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(12,2)"))
      val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val eu = Tables.supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("s_suppkey"), col("n_name"))
      BloomJoin.reducedJoin(
          Tables.lineitem(s, d).select(col("l_suppkey"), rev.as("rev")),
          "l_suppkey", eu, "s_suppkey")
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),
    "q22_no_orders" -> ((s, d) => Analytics.q22NoOrders(s, d)),
    "rollup_revenue" -> ((s, d) => Analytics.rollupRevenue(s, d)),
    "segment_distincts" -> ((s, d) => Analytics.segmentDistincts(s, d)),
    "events_sessions" -> ((s, d) =>
      Sessionize.byGap(Tables.events(s, d), "user_id", "ts", 1800L)
        .orderBy(col("user_id"), col("session_seq"))),
    // per-session entry/exit/bounce readout (r11): landing and exit
    // event types via (ts, id, type) struct extrema — one exchange
    "sessions_entry_exit" -> ((s, d) =>
      Sessionize.entryExit(eventCols(Tables.events(s, d)), "user_id",
          "event_id", "event_type", "ts", 1800L)
        .orderBy(col("user_id"), col("session_seq"))),
    // peak concurrent sessions per hour (r11): bucketed sweep line
    // with grid carry — a spanning session counts in EVERY bucket
    "sessions_concurrency" -> ((s, d) =>
      Sessionize.concurrency(
          Sessionize.byGap(Tables.events(s, d), "user_id", "ts", 1800L),
          "session_start", "session_end", bucketSeconds = 3600L)
        .orderBy(col("bucket_ts"))),
    // calendar date-spine dimension (r11): dbt-utils date_spine /
    // Kimball dim_date over the orders range, engine-safe attributes
    "dim_date_spine" -> ((s, d) =>
      graft.pipeline.Models.dimDate(Tables.orders(s, d), "o_orderdate")
        .orderBy(col("day_ts"))),
    // incremental sessionization (r11): stored sessions + a day's
    // batch — untouched users carry forward, touched users replay
    // from history; ≡ the full resessionization (the shared oracle)
    "events_sessions_incr" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val cut = lit(java.sql.Timestamp.valueOf(CdcCutoff))
      val hist = ev.filter(col("ts") < cut)
      val delta = ev.filter(col("ts") >= cut)
      val stored = Sessionize.byGap(hist, "user_id", "ts", 1800L)
      Sessionize.byGapIncremental(stored, hist, delta, "user_id", "ts", 1800L)
        .orderBy(col("user_id"), col("session_seq"))
    }),
    "q18_large_orders" -> ((s, d) => Analytics.q18LargeOrders(s, d)),
    // interval-OVERLAP join (r8-cont): concurrent sessions across
    // users — each overlapping pair accepted only in its
    // overlap-left-edge bucket, so the bucketed join needs no dedup
    "sessions_overlap" -> ((s, d) => {
      val sess = Sessionize.byGap(Tables.events(s, d), "user_id", "ts", 1800L)
        .select(col("user_id"), col("session_seq"),
          col("session_start"), col("session_end"))
      RangeJoin.intervalOverlap(sess, sess, Seq.empty,
          "session_start", "session_end", bucketSeconds = 3600L)
        .filter(col("a_user_id") < col("b_user_id"))
        .select(col("a_user_id"), col("a_session_seq"),
          col("b_user_id"), col("b_session_seq"))
        .orderBy(col("a_user_id"), col("a_session_seq"),
          col("b_user_id"), col("b_session_seq"))
    }),
    "q13_custdist" -> ((s, d) => Analytics.q13CustDist(s, d)),
    // co-purchase part pairs (r7): order-keyed self-join, per-order
    // fan-out bounded by line count
    // association rules (r11): directional confidence/lift over the
    // co-purchase pairs — {a}→{b} and {b}→{a} differ exactly when the
    // item frequencies do
    "basket_rules" -> ((s, d) =>
      Analytics.basketRules(Tables.lineitem(s, d), minCount = 4L)
        .orderBy(col("antecedent"), col("consequent"))),
    // RFM segmentation (r11): recency/frequency/monetary quintiles
    // against the corpus's own max date; decimal money, ties pinned
    "customer_rfm" -> ((s, d) =>
      Analytics.rfm(Tables.orders(s, d))
        .orderBy(col("o_custkey"))),
    "basket_pairs" -> ((s, d) =>
      Analytics.basketPairs(Tables.lineitem(s, d), minCount = 2L)
        .orderBy(col("part_a"), col("part_b"))),
    // per-label embedding centroid vs the global centroid (r11):
    // cosine + norm from exact integer per-dim sums (n cancels in
    // the cosine) — the embedding-space drift/coherence monitor
    "embedding_centroid_shift" -> ((s, d) =>
      operators.Similarity.centroidShift(Tables.embeddings(s, d),
          "label", "embedding")
        .orderBy(col("label"))),
    // repurchase cycle per segment (r11): days between consecutive
    // orders per customer — reorder-cadence mean/p50/p90
    "repurchase_cycle" -> ((s, d) =>
      Analytics.repurchaseCycle(Tables.orders(s, d), Tables.customer(s, d))
        .orderBy(col("c_mktsegment"))),
    // share-of-parent hierarchy rollup (r11): nation revenue as a
    // share of ITS region, region share of global — one leaf row
    "rollup_share" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"),
          col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("o_totalprice"))
      Analytics.shareOfParent(rev, "r_name", "n_name", "o_totalprice")
        .orderBy(col("r_name"), col("n_name"))
    }),
    // new-vs-returning revenue split per month (r11): acquisition vs
    // retention decomposition — first-order-month customers are NEW
    "revenue_new_vs_returning" -> ((s, d) =>
      Analytics.newVsReturning(Tables.orders(s, d), "o_custkey",
          "o_orderdate", "o_totalprice")
        .orderBy(col("month_start"))),
    // fulfillment cycle-time SLA per priority (r11): exact integer
    // order→ship days, interpolated p50/p90, 90-day breach share
    "fulfillment_cycle_sla" -> ((s, d) => {
      val joined = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))),
          col("l_orderkey") === col("o_orderkey"))
      Analytics.cycleSla(joined, "o_orderpriority", "o_orderdate",
          "l_shipdate", slaDays = 90)
        .orderBy(col("o_orderpriority"))
    }),
    // log-log price elasticity per brand (r11): OLS slope of monthly
    // ln(qty) on ln(unit price) over r6-scaled exact integer sums
    "price_elasticity" -> ((s, d) =>
      Analytics.priceElasticity(Tables.lineitem(s, d), Tables.part(s, d))
        .orderBy(col("p_brand"))),
    // item-item cosine affinity (r11): co-occurrence normalized by
    // √(c_a·c_b) — niche affinity outranks bestseller incidence
    "basket_cosine" -> ((s, d) =>
      Analytics.basketCosine(Tables.lineitem(s, d), minCount = 2L,
          topK = 100)
        .orderBy(col("rank"))),
    "events_rolling" -> ((s, d) => Analytics.eventsRolling(s, d)),
    // ordered-step conversion funnel (r7): one shuffle + per-user
    // sorted fold; oracle replays the min-join recurrence
    "events_funnel" -> ((s, d) =>
      Analytics.funnel(Tables.events(s, d), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),
    // weekly cohort retention matrix (r7)
    "events_retention" -> ((s, d) =>
      Analytics.retention(Tables.events(s, d), "user_id", "ts")
        .orderBy(col("cohort_ts"), col("period_n"))),
    // windowed funnel (r7): conversion within 1 h of the step-1
    // start, every start evaluated; oracle replays the per-start
    // min-join recurrence + deepest/earliest tie-break
    "events_funnel_windowed" -> ((s, d) =>
      Analytics.funnelWindowed(Tables.events(s, d), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"), windowSeconds = 3600L)
        .orderBy(col("user_id"))),

    // ---- temporal joins (§2.4b) ----
    // as-of BACKWARD: each purchase gets the user's latest view
    // at-or-before it (single shuffle on user_id — never a range join)
    "asof_last_view" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOf.backward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("event_id", "ts"), "view_")
        .orderBy(col("event_id"))
    }),
    // same as-of lookup with a 1-hour staleness bound: a last view
    // older than the tolerance is nulled out, the purchase row is kept
    // (merge_asof `tolerance` semantics)
    "asof_last_view_tol" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOf.backward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("event_id", "ts"), "view_", toleranceSec = Some(3600L))
        .orderBy(col("event_id"))
    }),
    // as-of FORWARD: each purchase gets the user's next error after it
    "asof_next_error" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOf.forward(purchases, errors, Seq("user_id"), "ts", "ts",
          Seq("event_id", "ts"), "err_")
        .orderBy(col("event_id"))
    }),
    // bucketed interval join: events → containing session, counted per
    // session (equi-join on (user, time-bucket) + exact containment)
    "range_join_sessions" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val sessions = Sessionize.byGap(Tables.events(s, d), "user_id", "ts", 1800L)
        .select(col("user_id"), col("session_seq"),
          col("session_start"), col("session_end"))
      RangeJoin.pointInInterval(ev, sessions, Seq("user_id"), "ts",
          "session_start", "session_end", bucketSeconds = 1800L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_in_session"))
        .orderBy(col("user_id"), col("session_seq"))
    }),
    // DECLARATIVE containment join — no equi key at all, the shape
    // that plans as a BroadcastNestedLoopJoin unless
    // plans.RangeJoinRewrite (registered via spark.sql.extensions in
    // the graded sessions) rewrites it to the bucketed equi-join.
    // Correct either way; PlansSpec asserts the rewrite actually fires
    "range_join_rewrite" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("ts"))
      val days = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day_start"))
        .distinct()
        .withColumn("day_end",
          col("day_start") + expr("INTERVAL '0 23:59:59.999999' DAY TO SECOND"))
      ev.join(days, col("ts") >= col("day_start") && col("ts") <= col("day_end"))
        .groupBy(col("day_start")).agg(count(lit(1)).as("n_events"))
        .orderBy(col("day_start"))
    }),

    // ---- continuous CDC apply, graded batch-side (§2.6) ----
    // the reference's 15-min load loop run as a real Structured
    // Streaming job on STATIC input: batch 1 lands → bootstrap, batch
    // 2 lands → keyed upsert via foreachBatch; the FINAL parquet table
    // is the graded output (= latest event per user, the cdc_upsert
    // invariant), so the streaming path gets a full DuckDB oracle
    "stream_cdc_apply" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_cdc")
      val inDir = s"$base/in"; val target = s"$base/target"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.applyUpserts(
          graft.streaming.EventStream.read(s, inDir),
          target, ckpt, Seq("user_id"), "ts", Seq("event_id"))
        try {
          q.processAllAvailable() // microbatch 1: bootstrap load
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable() // microbatch 2: upsert the delta
        } finally q.stop()
      }
      s.read.parquet(target)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- exactly-once JDBC CDC apply, graded batch-side (r9) ----
    // the reference's ClickHouse sink protocol run as a REAL stream
    // into embedded Derby: batch 0 bootstraps the warehouse table,
    // batch 1 merges the delta (ledger mark inside the merge tx).
    // Then the crash-redelivery case is DRIVEN, not just spec'd: a
    // fresh-checkpoint restart replays ALL input as a new batch 0 —
    // plus a POISON row that would corrupt the table if applied — and
    // the (sink_table, batch_id) ledger must skip it untouched. The
    // final warehouse table is graded against the latest-per-user
    // oracle over the ORIGINAL events; an applied poison row or a
    // double-applied batch fails the hash.
    "stream_cdc_jdbc_exactly_once" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_jx")
      val inDir = s"$base/in"
      val dbName = "jx" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$dbName;create=true"
      val table = "events_sink"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        def start(ckpt: String) = graft.streaming.EventStream
          .applyUpsertsJdbcExactlyOnce(
            graft.streaming.EventStream.read(s, inDir), url, table,
            ckpt, Seq("user_id"), "ts", Seq("event_id"))
        val q = start(s"$base/ckpt1")
        try {
          q.processAllAvailable() // batch 0: bootstrap load
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 1: staged merge + ledger mark
        } finally q.stop()
        // redelivery: fresh checkpoint ⇒ every file replays as batch 0
        // again, now including a poison row newer than everything —
        // applying it would win the latest-per-key merge and corrupt
        // the graded output; the ledger row for batch 0 must skip it
        import s.implicits._
        Seq((-999L, -999L,
            new java.sql.Timestamp(ev.agg(max(col("ts"))).head
              .getTimestamp(0).getTime + 3600000L),
            "__poison", -1.0))
          .toDF("user_id", "event_id", "ts", "event_type", "value")
          .write.mode("append").parquet(inDir)
        val q2 = start(s"$base/ckpt2")
        try q2.processAllAvailable() finally q2.stop()
      }
      derbySnapshotAndDrop(s, url, dbName, table, "graft_jx_")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- watermarked windowed agg, graded batch-side (§2.6) ----
    // the REAL hourlyCounts stream (watermark + tumbling window,
    // append mode, parquet sink) on static input. Append mode only
    // emits a window once the watermark passes its end, so two
    // sentinel microbatches beyond max(ts)+watermark flush every real
    // window; the sentinels' own windows stay in state (never emitted)
    // and the query is stopped. Final sink vs the events_hourly oracle.
    "stream_hourly_counts" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_hr")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      ev.write.parquet(inDir)
      val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
      def sentinel(offsetMs: Long) = {
        import s.implicits._
        Seq((-1L, -1L, new java.sql.Timestamp(maxTs.getTime + offsetMs),
          "__sentinel", 0.0)).toDF("user_id", "event_id", "ts", "event_type", "value")
      }
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream
          .hourlyCounts(graft.streaming.EventStream.read(s, inDir))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1: all real events, wm = 0
          sentinel(4L * 3600 * 1000).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 2: wm = maxTs - 2h
          sentinel(4L * 3600 * 1000 + 60000).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 3: wm = maxTs + 2h → all real windows out
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .filter(col("event_type") =!= "__sentinel")
        .orderBy(col("hour_ts"), col("event_type"))
    }),

    // native session_window sessions, graded through the REAL stream
    // (r8 wave 3): sentinel events advance the watermark so every
    // real session finalizes; oracle = lag-islands in SQL with the
    // same strict-gap break and end-padding
    "stream_session_windows" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_sw")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      ev.write.parquet(inDir)
      val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
      def sentinel(offsetMs: Long) = {
        import s.implicits._
        Seq((-1L, -1L, new java.sql.Timestamp(maxTs.getTime + offsetMs),
          "__sentinel", 0.0)).toDF("user_id", "event_id", "ts", "event_type", "value")
      }
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream
          .sessionCounts(graft.streaming.EventStream.read(s, inDir))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1: all real events, wm = 0
          sentinel(4L * 3600 * 1000).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 2: wm = maxTs - 2h
          sentinel(4L * 3600 * 1000 + 60000).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 3: wm > all session ends
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .filter(col("user_id") =!= -1L)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ---- streaming dedup, graded batch-side (§2.6) ----
    // the REAL dropDuplicatesWithinWatermark stream on static input
    // with injected at-least-once redelivery: batch 1 carries every
    // event plus bit-identical duplicates of every 10th user's events
    // (same-batch dupes), batch 2 redelivers the last hour of events
    // (cross-batch dupes, inside the watermark horizon). The sink must
    // equal the events table exactly once per event_id.
    "stream_dedup" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_dd")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      ev.write.parquet(inDir)
      ev.filter(col("user_id") % 10 === 0).write.mode("append").parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream
          .dedup(graft.streaming.EventStream.read(s, inDir))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1: originals + same-batch dupes
          val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
          ev.filter(col("ts") > lit(new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)))
            .write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 2: cross-batch redelivery
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // ---- streaming as-of enrichment, graded batch-side (§2.6) ----
    // the real stream-static validity-window join on static input,
    // two microbatches (the second re-plans the dim side); every
    // event must pick the SCD2 version true at ITS timestamp
    "stream_enrich_asof" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ao")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      val hist = Scd2.historyFromLog(ev, Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"))
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.enrichAsOf(
            graft.streaming.EventStream.read(s, inDir), hist, Seq("user_id"), "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("dim_event_id").as("version_id"),
            col("dim_event_type").as("state_at_event"))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 2: dim side re-planned
        } finally q.stop()
      }
      s.read.parquet(outDir).orderBy(col("event_id"))
    }),

    // ---- stream-STREAM interval join, graded batch-side (r10) ----
    // the REAL EventStream.correlate: each purchase joined to the
    // views that preceded it by <= 6h on the same user, both sides
    // watermarked so state stays bounded. Two microbatches split at
    // the CDC cutoff; an INNER interval join emits on match (no
    // sentinel flush needed), and the state-retention math — needed
    // views have ts > cutoff - 6h, expiry floor after batch 1 is
    // (cutoff - 1h) - 6h — guarantees no cross-batch match is lost.
    // Sink vs the DuckDB interval-join oracle.
    "stream_correlate" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_cx")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val src = graft.streaming.EventStream.read(s, inDir)
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val q = graft.streaming.EventStream.correlate(purchases, views,
            Seq("user_id"), "purchase_ts", "view_ts",
            withinSeconds = 6L * 3600)
          .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
            col("view_id"), col("view_ts"))
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1: both sides <= cutoff
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable() // batch 2: cross-batch matches
        } finally q.stop()
      }
      s.read.parquet(outDir).orderBy(col("purchase_id"), col("view_id"))
    }),

    // ---- streaming stratified sampler, graded batch-side (§2.6) ----
    // two days land as microbatches, then an at-least-once replay of
    // early docs (must bump no version); the current view (max version
    // per stratum) is graded against the SAME full-corpus xxHash64
    // ranking oracle as the batch sampler — streaming state ≡ batch
    // operator over everything seen
    "stream_stratified_sample" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ss")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      docs.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.sampleTopN(stream, "doc_id", "lang", n = 100)
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // day 1
          docs.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2
          docs.filter(col("doc_id") < 50).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      val out = s.read.parquet(outDir)
      val mx = out.groupBy(col("stratum")).agg(max(col("version")).as("version"))
      out.join(mx, Seq("stratum", "version"))
        .select(col("id").as("doc_id"), col("stratum").as("lang"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // streaming WEIGHTED sampler (r8-cont): same two-day + redelivery
    // runner as stream_stratified_sample; streaming state ≡ the batch
    // per-stratum PPS operator over everything seen, so the oracle is
    // the SAME per-stratum ξ ranking replay
    "stream_weighted_sample" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ws")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.sampleWeightedTopN(stream,
            "doc_id", "lang", "n_chars", n = 50)
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try {
          q.processAllAvailable() // day 1
          docs.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2
          docs.filter(col("doc_id") < 50).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      val out = s.read.parquet(outDir)
      val mx = out.groupBy(col("stratum")).agg(max(col("version")).as("version"))
      out.join(mx, Seq("stratum", "version"))
        .select(col("id").as("doc_id"), col("stratum").as("lang"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // streaming ingest-time NEAR-DUP gate (r11): the REAL
    // nearDupGate stream run over two id-split document microbatches
    // with the md5-portable shingle hash, graded on the final
    // VersionedGroup corpus table. The two-stage semantics are NOT
    // the batch pairs-losers run: a day-2 doc whose only near-dup
    // was itself gated out on day 1 SURVIVES (its loser never
    // entered the index) — the oracle encodes exactly that, deriving
    // day-1 losers from pairs wholly inside day 1, then day-2 losers
    // from pairs whose earlier side survived day 1 or is intra-day-2
    "stream_neardup_gate" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ng")
      val inDir = s"$base/in"; val root = s"$base/store"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.nearDupGate(stream, root,
          s"$base/ckpt", "doc_id", "text", n = 3, numHashes = 32,
          bands = 16, threshold = 0.5,
          shingleHash = functions.Text.portableHash60)
        try {
          q.processAllAvailable() // day 1: bootstrap commit
          docs.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2: checked against the index
        } finally q.stop()
      }
      graft.sources.VersionedGroup.read(s, root, "docs")
        .orderBy(col("doc_id"))
    }),

    // streaming SEGMENT-dedup gate (r11): the REAL segmentDedupGate
    // stream over the same two id-split microbatches plus a full
    // redelivery of early docs (deterministically a no-op: surviving
    // ids anti-join out on the corpus frame, dropped docs' segments
    // are all in the index). Because batches split on ascending
    // doc_id and the batch operator's keep-first rule orders by
    // (doc_id, seg_no), the gate's final corpus EQUALS the
    // full-corpus batch segmentDedup restricted to its survivors —
    // the oracle is the dedup_segments oracle with the
    // dropped-boilerplate docs filtered out
    "stream_segdedup_gate" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_sg")
      val inDir = s"$base/in"; val root = s"$base/store"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.segmentDedupGate(stream, root,
          s"$base/ckpt", "doc_id", "text", window = 20)
        try {
          q.processAllAvailable() // day 1: bootstrap commit
          docs.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2: deduped against the index
          docs.filter(col("doc_id") < 50).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      graft.sources.VersionedGroup.read(s, root, "docs")
        .orderBy(col("doc_id"))
    }),

    // streaming k-NN weak-labeling door (r11): the REAL knnLabelDoor
    // stream over two id-split microbatches of unlabeled vectors
    // plus a redelivery (no-op). The labeled seed corpus is FIXED
    // and predictions never feed back into the vote, so the output
    // is batch-split invariant — the oracle is ann_knn_label's vote
    // replay verbatim
    "stream_knn_label" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_kl")
      val inDir = s"$base/in"; val root = s"$base/store"
      val embs = Tables.embeddings(s, d)
      val labeled = embs.filter(col("vec_id") % 50 =!= 0)
      val unlabeled = embs.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), col("embedding"))
      unlabeled.filter(col("vec_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(unlabeled.schema).parquet(inDir)
        val q = graft.streaming.EventStream.knnLabelDoor(stream, labeled,
          root, s"$base/ckpt", "vec_id", "embedding", "label", k = 10)
        try {
          q.processAllAvailable() // day 1
          unlabeled.filter(col("vec_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2: same static seed corpus
          unlabeled.filter(col("vec_id") < 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      graft.sources.VersionedGroup.read(s, root, "labels")
        .orderBy(col("vec_id"))
    }),

    // streaming ingest-time DECONTAMINATION gate (r11): the REAL
    // decontamGate stream over two id-split training microbatches
    // plus a full redelivery (no-op). The eval gram index is STATIC,
    // so unlike the near-dup gate the final corpus is batch-split
    // invariant — the oracle is simply "train docs minus those
    // sharing ≥3 trigrams with any eval doc"
    // streaming banned-phrase gate (r11): batch-local positional
    // index per microbatch (per-doc predicate ⇒ batch-split
    // invariant); two days + a redelivery, survivors versioned
    "stream_phrase_gate" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ph")
      val inDir = s"$base/in"; val root = s"$base/store"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.phraseGate(stream,
          Seq(Seq("table", "table"), Seq("value", "table")),
          root, s"$base/ckpt", "doc_id", "text")
        try {
          q.processAllAvailable() // day 1: bootstrap commit
          docs.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2: same fixed phrase list
          docs.filter(col("doc_id") < 50).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      graft.sources.VersionedGroup.read(s, root, "docs")
        .orderBy(col("doc_id"))
    }),

    "stream_decontam_gate" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_dc")
      val inDir = s"$base/in"; val root = s"$base/store"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val evalIdx = graft.operators.Dedup.evalGramIndex(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 3)
      train.filter(col("doc_id") < 250).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(docs.schema).parquet(inDir)
        val q = graft.streaming.EventStream.decontamGate(stream, evalIdx,
          root, s"$base/ckpt", "doc_id", "text", n = 3, minCommon = 3)
        try {
          q.processAllAvailable() // day 1: bootstrap commit
          train.filter(col("doc_id") >= 250).write.mode("append").parquet(inDir)
          q.processAllAvailable() // day 2: checked against the same index
          train.filter(col("doc_id") < 50).write.mode("append").parquet(inDir)
          q.processAllAvailable() // redelivery: idempotent no-op
        } finally q.stop()
      }
      graft.sources.VersionedGroup.read(s, root, "docs")
        .orderBy(col("doc_id"))
    }),

    // clustered write → per-file stats manifest → driver-side
    // file-pruned read (r8-cont): the graded query drives the whole
    // data-skipping path end to end — prunedRead ≡ the plain filtered
    // read, so the oracle is ordinary SQL over the same rows. Fresh
    // temp dir per invocation (idempotent re-runs)
    "clustered_prune_read" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_prune_")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      graft.sources.Sink.clusteredWrite(o, dir, Seq("o_totalprice"), numFiles = 16)
      graft.sources.Sink.writeFileStats(s, dir, Seq("o_totalprice"))
      graft.sources.Sink.prunedRead(s, dir, "o_totalprice", 50000.0, 100000.0)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // z-order 2D data skipping (r8 wave 3): the SAME table answers a
    // two-column box query through the interleaved-bit layout +
    // per-file stats; oracle = the plain filtered scan (layout is
    // invisible in results)
    "zorder_prune_read" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_zorder_")
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      graft.sources.Sink.zorderWrite(l, dir, Seq("l_partkey", "l_suppkey"),
        numFiles = 16)
      graft.sources.Sink.writeFileStats(s, dir, Seq("l_partkey", "l_suppkey"))
      graft.sources.Sink.prunedReadMulti(s, dir,
          Seq(("l_partkey", 100L, 400L), ("l_suppkey", 10L, 40L)))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"))
    }),

    // small-file compaction graded end-to-end (r9): a deliberately
    // fragmented copy of orders (64 shards) is compacted through the
    // checked-rename swap; the entry eagerly requires the file count
    // actually DROPPED (a no-op compaction fails the gate), and the
    // graded output is the post-maintenance table content — the row
    // set a daily maintenance run must never change
    "sink_compact" -> ((s, d) => {
      // subpath of the pre-created temp dir: the bootstrap write below
      // uses default ErrorIfExists mode, which must target a
      // not-yet-existing path (TempDirs.create pre-creates its dir)
      val dir = graft.TempDirs.create("graft_compact_") + "/t"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
        .repartition(64).write.parquet(dir)
      val nAfter = graft.sources.Sink.compact(s, dir, targetBytes = 64L << 20)
      require(nAfter < 64, s"compaction was a no-op: $nAfter files")
      s.read.parquet(dir)
        .orderBy(col("o_orderkey"))
    }),
    // range-clustered write graded end-to-end (r9): orders clustered
    // on o_orderdate into 8 sorted files; the entry eagerly requires
    // the files own DISJOINT key ranges (the property all three
    // pruning levels hang off) and grades the table content — the
    // layout must be invisible in the row set
    "sink_clustered_write" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_clustered_")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val n = graft.sources.Sink.clusteredWrite(o, dir, Seq("o_orderdate"),
        numFiles = 8)
      require(n > 1 && n <= 8, s"unexpected file count: $n")
      // disjoint ranges: sort files by min date — each file's min must
      // be strictly after the previous file's max (equal keys never
      // span files by range-partitioning construction)
      val ranges = s.read.parquet(dir)
        .groupBy(col("_metadata.file_path"))
        .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
        .orderBy(col("lo"))
        .collect()
      ranges.sliding(2).foreach {
        case Array(a, b) =>
          // ISO date/datetime strings compare lexically
          require(b.getAs[Any]("lo").toString > a.getAs[Any]("hi").toString,
            s"overlapping file ranges: $a vs $b")
        case _ => ()
      }
      s.read.parquet(dir)
        .orderBy(col("o_orderkey"))
    }),

    // ---- r9: the daily-maintenance write paths, graded end-to-end ----
    // (each was spec-only until now; the graded output is always the
    // READ-BACK table content — what a downstream consumer sees)

    // keyed parquet upsert through the checked-rename swap: updates
    // replace their keys (latest tracking wins), new keys append
    "sink_upsert" -> ((s, d) => {
      // subpath for the same ErrorIfExists-bootstrap reason as
      // sink_compact above
      val dir = graft.TempDirs.create("graft_upsert_") + "/t"
      val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate"))
      base.write.parquet(dir)
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("o_orderdate", lit("1999-12-31 00:00:00").cast("timestamp"))
        .unionByName(base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      graft.sources.Sink.upsert(s, dir, updates, Seq("o_orderkey"), "o_orderdate")
      s.read.parquet(dir).orderBy(col("o_orderkey"))
    }),

    // JDBC APPEND into a live warehouse (r10): bootstrap load creates
    // the table, a second append ACCUMULATES (no dedup, no replace) —
    // graded on the read-back through the same JDBC source, so type
    // round-tripping (BIGINT/DOUBLE/VARCHAR/TIMESTAMP) is in scope
    "sink_jdbc_append" -> ((s, d) => {
      val db = "ja" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      graft.sources.Sink.jdbcAppend(base, url, "wh_orders")
      graft.sources.Sink.jdbcAppend(
        base.filter(col("o_orderkey") % 3 === 0), url, "wh_orders")
      derbySnapshotAndDrop(s, url, db, "wh_orders", "graft_ja_")
        .orderBy(col("o_orderkey"), col("o_custkey"))
    }),

    // JDBC truncate+insert full refresh (r10): a full load then an
    // overwrite with the post-cutoff slice — the read-back must be
    // the second slice ONLY (base_loader.py full-load semantics)
    "sink_jdbc_overwrite" -> ((s, d) => {
      val db = "jo" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      graft.sources.Sink.jdbcOverwrite(base, url, "wh_orders")
      graft.sources.Sink.jdbcOverwrite(
        base.filter(col("o_orderdate") > lit("1998-01-01 00:00:00").cast("timestamp")),
        url, "wh_orders")
      derbySnapshotAndDrop(s, url, db, "wh_orders", "graft_jo_")
        .orderBy(col("o_orderkey"))
    }),

    // JDBC staged UPSERT into a live warehouse (r11): the reference's
    // incremental-load protocol run end-to-end against embedded Derby
    // — bootstrap creates the table from the batch, the delta stages
    // into a temp table and merges SET-BASED inside the warehouse
    // (keyed delete + insert, one transaction). Graded on the
    // read-back: updated keys carry the delta's values (latest
    // tracking wins), new keys append, and no key appears twice —
    // the same post-maintenance content sink_upsert grades on the
    // parquet path
    "sink_jdbc_upsert" -> ((s, d) => {
      val db = "ju" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      graft.sources.Sink.jdbcUpsert(base, url, "wh_orders",
        Seq("o_orderkey"), "o_orderdate")
      val delta = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("o_orderdate", lit("1999-12-31 00:00:00").cast("timestamp"))
        .unionByName(base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      graft.sources.Sink.jdbcUpsert(delta, url, "wh_orders",
        Seq("o_orderkey"), "o_orderdate")
      derbySnapshotAndDrop(s, url, db, "wh_orders", "graft_ju_")
        .orderBy(col("o_orderkey"))
    }),

    // dynamic partition overwrite: the delta touches ONE partition
    // (1-URGENT, halved to even keys, doubled price); every other
    // partition must come through byte-identical
    "sink_dynamic_overwrite" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_dynow_")
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice"), col("o_orderpriority"))
      graft.sources.Sink.partitioned(base, dir, Seq("o_orderpriority"))
      val delta = base
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      graft.sources.Sink.overwritePartitions(delta, dir, Seq("o_orderpriority"))
      s.read.parquet(dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // truncate+insert full load, run TWICE: converging on re-run is
    // the property that makes it safe to schedule
    "cdc_full_snapshot" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_fullload_")
      Cdc.fullLoad(Models.stgCustomer(s, d), dir)
      Cdc.fullLoad(Models.stgCustomer(s, d), dir)
      s.read.parquet(dir).orderBy(col("customer_id"))
    }),

    // dbt is_incremental() materialization end-to-end: bootstrap full
    // load, watermark append, and a third pass that must append
    // NOTHING (the target's own max(ts) is the progress record)
    "incr_model_materialize" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_incrmodel_") + "/t"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      val n1 = IncrementalModel.run(s, ev.filter(col("ts") <= cutoff), dir, "ts")
      val n2 = IncrementalModel.run(s, ev, dir, "ts")
      val n3 = IncrementalModel.run(s, ev, dir, "ts")
      require(n1 > 0 && n2 > 0 && n3 == 0,
        s"incremental passes not incremental: $n1/$n2/$n3")
      s.read.parquet(dir).orderBy(col("event_id"))
    }),

    // staged extract → manifest commit → load → loaded marker, with
    // both restart windows exercised: the re-stage returns the
    // committed manifest without re-extracting, the re-load no-ops
    "staged_load" -> ((s, d) => {
      val root = graft.TempDirs.create("graft_staged_")
      val staging = s"$root/staging"; val target = s"$root/target"
      val src = Models.stgCustomer(s, d)
      val m1 = graft.sources.Staging.stage(src, staging, "batch_001",
        Some("customer_id"))
      val m2 = graft.sources.Staging.stage(src, staging, "batch_001",
        Some("customer_id"))
      require(m1.rows == m2.rows && m1.watermark == m2.watermark,
        s"re-stage diverged: $m1 vs $m2")
      require(graft.sources.Staging.pending(s, staging) == Seq("batch_001"),
        "staged batch not pending")
      val loaded = graft.sources.Staging.loadStaged(s, staging, "batch_001")(
        df => graft.sources.Sink.fullOverwrite(df, target))
      require(loaded, "first load must run")
      require(!graft.sources.Staging.loadStaged(s, staging, "batch_001")(
        df => graft.sources.Sink.fullOverwrite(df, target)),
        "replayed load must no-op")
      s.read.parquet(target).orderBy(col("customer_id"))
    }),

    // versioned table: commit v1, upsert to v2, then time-travel —
    // BOTH versions graded from one immutable table
    // data-contract compatibility gate (r11): the schema-only check
    // a load runs before any data movement — one batch exercising
    // all five classifications (unchanged / widened / changed /
    // removed / added); the oracle states the verdict table
    // literally, proving the classification rules, not a data pass
    "schema_compat_report" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val contract = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("event_type", StringType),
        StructField("ts", TimestampType)))
      val incoming = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", IntegerType),  // widened: int ⊂ bigint
        StructField("value", StringType),     // changed: lossy drift
        StructField("event_type", StringType),
        StructField("props", StringType)))    // added; ts removed
      graft.sources.SchemaEvolution.compatReport(s, contract, incoming)
        .orderBy(col("column"))
    }),

    // storage-reclaim vacuum graded end-to-end (r11): three committed
    // versions, vacuum keeps only the head — the entry eagerly
    // requires segment dirs were actually removed AND the vacuumed
    // version is no longer readable, then grades the head content
    // (the row set maintenance must never change)
    "versioned_vacuum" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_vac_")
      val base = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"))
      require(graft.sources.Versioned.commit(base, dir) == 1)
      require(graft.sources.Versioned.commit(
        base.withColumn("account_balance", col("account_balance") + 10.0),
        dir, replace = true) == 2)
      require(graft.sources.Versioned.commit(
        base.filter(col("customer_id") % 2 === 0)
          .withColumn("account_balance", col("account_balance") * 2.0),
        dir, replace = true) == 3)
      val removed = graft.sources.Versioned.vacuum(s, dir,
        keepVersions = 1, retentionMs = 0L)
      require(removed >= 2, s"vacuum removed only $removed segment dirs")
      val v1Gone =
        try { graft.sources.Versioned.read(s, dir, Some(1)).count(); false }
        catch { case _: Exception => true }
      require(v1Gone, "vacuumed version 1 is still readable")
      graft.sources.Versioned.read(s, dir).orderBy(col("customer_id"))
    }),

    "versioned_time_travel" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_vtt_")
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val base = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val v1rows = base.filter(col("customer_id") % 2 === 0)
        .withColumn("updated_at", t0)
      val v1 = graft.sources.Versioned.commit(v1rows, dir)
      require(v1 == 1, s"expected version 1, got $v1")
      val updates = base.filter(col("customer_id") % 4 === 0)
        .withColumn("account_balance", col("account_balance") + 1000.0)
        .withColumn("updated_at", t1)
        .unionByName(base
          .filter(col("customer_id") % 2 === 1 && col("customer_id") % 3 === 0)
          .withColumn("updated_at", t1))
      val v2 = graft.sources.Versioned.upsert(updates, dir,
        Seq("customer_id"), "updated_at")
      require(v2 == 2, s"expected version 2, got $v2")
      graft.sources.Versioned.read(s, dir, Some(1))
        .withColumn("version_tag", lit("v1"))
        .unionByName(graft.sources.Versioned.read(s, dir, Some(2))
          .withColumn("version_tag", lit("v2")))
        .orderBy(col("version_tag"), col("customer_id"))
    }),

    // bucketed fact + dim on the join key: the join itself must plan
    // with ZERO exchanges (broadcast disabled while checking — AQE
    // would otherwise hide the shuffle question at small SF)
    "bucketed_join" -> ((s, d) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val factT = s"bj_fact_$tag"; val dimT = s"bj_dim_$tag"
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
        col("c_mktsegment"))
      graft.sources.Sink.bucketedTable(o, factT, "o_custkey", 8)
      graft.sources.Sink.bucketedTable(c, dimT, "c_custkey", 8)
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = s.table(factT)
          .join(s.table(dimT), col("o_custkey") === col("c_custkey"))
        val plan = j.queryExecution.executedPlan.toString
        require(!plan.contains("Exchange"),
          s"bucketed join still plans an exchange:\n$plan")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.table(factT).join(s.table(dimT), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // orchestrated mart build: Dag.run drives staging → mart through
    // real parquet hops; the graded output is the mart the graph built
    "dag_run_mart" -> ((s, d) => {
      val root = graft.TempDirs.create("graft_dag_")
      val stg = s"$root/stg_customer"; val mart = s"$root/dim_customer"
      val nodes = Seq(
        Dag.Node("stg_customer", Nil, () =>
          Models.stgCustomer(s, d).write.parquet(stg), group = "staging"),
        Dag.Node("dim_customer", Seq("stg_customer"), () => {
          val c = s.read.parquet(stg)
          val n = Tables.nation(s, d).select(col("n_nationkey"),
            col("n_name").as("nation_name"), col("n_regionkey"))
          val r = Tables.region(s, d).select(col("r_regionkey"),
            col("r_name").as("region_name"))
          c.join(broadcast(n), c("nation_id") === n("n_nationkey"), "left")
            .join(broadcast(r), col("n_regionkey") === r("r_regionkey"), "left")
            .select(c("customer_id"), c("customer_name"),
              concat(c("customer_name"), lit(" ["), c("market_segment"),
                lit("]")).as("display_name"),
              c("account_balance"), c("market_segment"),
              col("nation_name"), col("region_name"))
            .write.parquet(mart)
        }, group = "marts"))
      val statuses = Dag.run(nodes)
      require(statuses.values.forall(_ == Dag.Succeeded),
        s"dag did not complete cleanly: $statuses")
      s.read.parquet(mart).orderBy(col("customer_id"))
    }),

    // cron-schedule replay (r10): two Schedule.step windows over a
    // real three-job graph — the reference's per-table cadences
    // (all_schedules.py) driven end to end. Window 1 fires the daily
    // extract (01:40 Lagos) + mart (02:00) but NOT the Sunday report
    // (Jan 1 2026 is a Thursday); window 2 spans THREE missed daily
    // ticks plus the Sunday tick, and the catch-up contract folds
    // each job into ONE run (idempotent delete+insert loaders). The
    // graded mart carries run_seq, so a scheduler that double-fires
    // a folded tick, skips a due job, or breaks dependency order
    // changes the table — hash-graded against the two watermark
    // slices stated directly in SQL.
    // partitioned backfill (r11): the Dagster "backfill a partition
    // range" operation — the daily mart's whole history rebuilt as
    // 2-day chunk runs through dynamic partition overwrite, then the
    // FIRST chunk deliberately relaunched (a retry) — the graded
    // read-back must equal the one-shot full rebuild exactly
    "pipeline_backfill" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_backfill_") + "/t"
      val ev = eventCols(Tables.events(s, d))
      val mart = (slice: DataFrame) => slice
        .groupBy(col("ts").cast("date").as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
      // calendar bounds from the source: two bounded driver scalars
      val r = ev.agg(min(col("ts").cast("date")).cast("string"),
        max(col("ts").cast("date")).cast("string")).head()
      val runs = graft.pipeline.Backfill.runDaily(s, ev, "ts", mart, dir,
        "event_date", r.getString(0), r.getString(1), chunkDays = 2)
      require(runs.nonEmpty && runs.map(_.rows).sum > 0,
        "backfill landed nothing")
      // idempotency: relaunch chunk 1 — the table must not change
      graft.pipeline.Backfill.runChunk(s, ev, "ts", mart, dir,
        "event_date", runs.head.fromDay, runs.head.toDay)
      s.read.parquet(dir)
        .select(col("event_date").cast("timestamp").as("event_date"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("event_date"), col("event_type"))
    }),
    "pipeline_schedule_replay" -> ((s, d) => {
      val root = graft.TempDirs.create("graft_sched_")
      val stg = s"$root/stg_orders"; val mart = s"$root/mart_revenue"
      val cutoffs = Iterator("1995-06-30 00:00:00", "1996-12-31 00:00:00")
      var runSeq = 0
      def staged = s.read.parquet(stg)
      def revenueByPriority(df: DataFrame) = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
      val nodes = Seq(
        Dag.Node("extract_orders", Nil, () => {
          require(cutoffs.hasNext, "extract fired more often than its ticks")
          runSeq += 1
          Tables.orders(s, d)
            .filter(col("o_orderdate") <= lit(cutoffs.next()).cast("timestamp"))
            .write.mode("overwrite").parquet(stg)
        }, group = "sources"),
        Dag.Node("mart_revenue", Seq("extract_orders"), () =>
          revenueByPriority(staged)
            .withColumn("run_seq", lit(runSeq).cast("long"))
            .write.mode("append").parquet(mart), group = "marts"),
        Dag.Node("weekly_report", Seq("mart_revenue"), () =>
          revenueByPriority(staged)
            .agg(sum(col("n")).as("n"),
              sum(col("revenue").cast("decimal(18,2)")).cast("double")
                .as("revenue"))
            .select(lit("__TOTAL__").as("o_orderpriority"), col("n"),
              col("revenue"), lit(runSeq).cast("long").as("run_seq"))
            .write.mode("append").parquet(mart), group = "reports"))
      val lagos = java.time.ZoneId.of("Africa/Lagos")
      val specs = Seq(
        Schedule.CronSpec("extract_orders", "40 1 * * *", lagos),
        Schedule.CronSpec("mart_revenue", "0 2 * * *", lagos),
        Schedule.CronSpec("weekly_report", "0 3 * * 0", lagos))
      val st1 = Schedule.step(nodes, specs,
        java.time.Instant.parse("2026-01-01T00:00:00Z"),
        java.time.Instant.parse("2026-01-01T01:30:00Z"))
      require(st1.keySet == Set("extract_orders", "mart_revenue") &&
        st1.values.forall(_ == Dag.Succeeded),
        s"window 1 expected extract+mart only, got $st1")
      val st2 = Schedule.step(nodes, specs,
        java.time.Instant.parse("2026-01-01T01:30:00Z"),
        java.time.Instant.parse("2026-01-04T02:00:00Z"))
      require(st2.keySet ==
        Set("extract_orders", "mart_revenue", "weekly_report") &&
        st2.values.forall(_ == Dag.Succeeded),
        s"window 2 expected all three jobs, got $st2")
      s.read.parquet(mart).orderBy(col("run_seq"), col("o_orderpriority"))
    }),

    // N-snapshot SCD2 fold: three scheduled snapshot merges (with a
    // lineage checkpoint mid-fold) must converge to the change-log
    // window construction the oracle states directly
    "scd2_mergeall_fold" -> ((s, d) => {
      val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
      val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
      val t2 = lit("2026-03-01 00:00:00").cast("timestamp")
      val t3 = lit("2026-04-01 00:00:00").cast("timestamp")
      val s0 = Models.stgCustomer(s, d).select(col("customer_id"),
        col("customer_name"), col("account_balance"), col("market_segment"))
      val history0 = s0.withColumn(Scd2.ValidFrom, t0)
        .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
      val snap1 = s0.withColumn("market_segment",
        when(col("customer_id") % 5 === 0, lit("SEG_T1"))
          .otherwise(col("market_segment")))
      val snap2 = snap1.withColumn("account_balance",
        when(col("customer_id") % 3 === 0, col("account_balance") + 100.0)
          .otherwise(col("account_balance")))
      val snap3 = snap2.withColumn("market_segment",
        when(col("customer_id") % 7 === 0, lit("SEG_T3"))
          .otherwise(col("market_segment")))
      Scd2.mergeAll(history0, Seq((snap1, t1), (snap2, t2), (snap3, t3)),
          Seq("customer_id"),
          Seq("customer_name", "account_balance", "market_segment"),
          checkpointEvery = 2)
        .orderBy(col("customer_id"), col("valid_from"))
    }),

    // PERMISSIVE quarantine split (r8): bad records neither kill the
    // load nor vanish — schema-true rows parse, failures keep their
    // raw text for replay; graded via a VALUES-literal oracle over a
    // deterministic crafted file
    // non-parquet source/sink roundtrips (r11): orders written
    // through each format and read back via the schema-enforced
    // readers — the oracle is the parquet table itself, so ANY
    // serialization loss (timestamp precision, float text
    // round-trip, header/quoting) fails the hash. Text formats pin
    // an explicit microsecond timestampFormat on BOTH sides (the
    // schema-at-read discipline: never trust format defaults).
    "source_orc_roundtrip" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_orc") + "/t"
      val o = Tables.orders(s, d)
      o.write.orc(dir)
      graft.sources.Sources.orc(s, dir, o.schema)
        .orderBy(col("o_orderkey"))
    }),
    "source_csv_roundtrip" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_csvrt") + "/t"
      val o = Tables.orders(s, d)
      val tf = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      o.write.option("header", "true").option("timestampFormat", tf)
        .csv(dir)
      graft.sources.Sources.csv(s, dir, o.schema,
          options = Map("timestampFormat" -> tf))
        .orderBy(col("o_orderkey"))
    }),
    "source_jsonl_roundtrip" -> ((s, d) => {
      val dir = graft.TempDirs.create("graft_jsonrt") + "/t"
      val o = Tables.orders(s, d)
      val tf = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      o.write.option("timestampFormat", tf).json(dir)
      graft.sources.Sources.jsonl(s, dir, o.schema,
          options = Map("timestampFormat" -> tf))
        .orderBy(col("o_orderkey"))
    }),
    "source_quarantine" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val dir = graft.TempDirs.create("graft_quar")
      val lines = Seq(
        """{"id": 1, "name": "alpha", "qty": 10}""",
        """{"id": 2, "name": "beta", "qty": 20}""",
        """this is not json""",
        """{"id": "x", "name": "gamma", "qty": 3}""",
        """{"id": 4, "qty": 40}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "batch.jsonl"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("name", StringType), StructField("qty", LongType)))
      val (good, quarantine) = graft.sources.Sources.readQuarantined(
        s, dir, schema, format = "json")
      good.select(lit("good").as("kind"), col("id"), col("name"), col("qty"),
          lit(null).cast("string").as("raw_record"))
        .unionByName(quarantine.select(lit("quarantine").as("kind"),
          lit(null).cast("long").as("id"), lit(null).cast("string").as("name"),
          lit(null).cast("long").as("qty"), col("raw_record")))
        .orderBy(col("kind"), coalesce(col("raw_record"), lit("")),
          coalesce(col("id"), lit(-1L)))
    }),

    // salted skew JOIN (r8): the fact-to-dim join where some users own
    // a huge share of events — hot keys spread over 16 salted
    // reducers, cold keys untouched; must equal the plain join
    "skew_salted_join" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
        .select(col("event_id"), col("user_id"), col("value"))
      val cust = Tables.customer(s, d).select(
        col("c_custkey").as("user_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("market_segment"))
      operators.Skew.saltedJoin(ev, cust, Seq("user_id"), hotThreshold = 50L)
        .select(col("event_id"), col("user_id"), col("customer_name"),
          col("market_segment"), col("value"))
        .orderBy(col("event_id"))
    }),

    // banded dim join: orders priced into fixed tiers (broadcast
    // non-equi join against a FIXED-cardinality band table)
    "band_join_price" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("tier_0_100k", 0.0, 100000.0),
        ("tier_100_200k", 100000.0, 200000.0),
        ("tier_200_300k", 200000.0, 300000.0),
        ("tier_300k_plus", 300000.0, 1e15)).toDF("price_tier", "lo", "hi")
      RangeJoin.bandJoin(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
          bands, "o_totalprice", "lo", "hi")
        .groupBy(col("price_tier"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"))
        .orderBy(col("price_tier"))
    }),

    // ---- CDC / ELT core (§2.1) ----
    // filter in the STORED nanos domain so the cutoff reaches the
    // parquet scan (PushedFilters: GreaterThan(ts, ...)) — filtering
    // the converted timestamp column would scan the full table
    "cdc_incremental_filter" -> ((s, d) => {
      val cutoffNanos = java.time.LocalDateTime.parse(CdcCutoff.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
      val raw = Tables.eventsRaw(s, d)
      Tables.convertEventTs(
          Cdc.incrementalFilter(raw, "ts", Tables.eventCutoffNanos(raw, cutoffNanos)))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),
    "cdc_last_loaded" -> ((s, d) =>
      Cdc.lastLoadedValue(Tables.events(s, d), "ts")),
    "cdc_dedup_latest" -> ((s, d) =>
      Cdc.dedupLatestPerKey(eventCols(Tables.events(s, d)),
          Seq("user_id"), "ts", Seq("event_id"))
        .orderBy(col("user_id"))),
    "cdc_upsert" -> ((s, d) => {
      val ev = eventCols(Tables.events(s, d))
      val target  = Cdc.dedupLatestPerKey(ev, Seq("user_id"), "ts", Seq("event_id"))
      val updates = ev.filter(col("event_type") === "purchase")
      Cdc.upsert(target, updates, Seq("user_id"), "ts", Seq("event_id"))
        .orderBy(col("user_id"))
    }),
    "cdc_snapshot_load" -> ((s, d) =>
      Cdc.withIngestionDate(Models.stgCustomer(s, d), "snapshot_date",
          lit("2026-08-12"))
        // parquet/pandas compare: date vs timestamp normalize differently
        // across engines — emit timestamp for the oracle diff
        .withColumn("snapshot_date", col("snapshot_date").cast("timestamp"))
        .orderBy(col("customer_id"))),
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
    // rolling 64-bit content fingerprint (xxhash64 arithmetic is not
    // DuckDB-portable → rows-only; TextSpec pins the semantics)
    "doc_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), functions.Text.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
    // portable-hash twin (r7): the same fingerprint with the md5-slice
    // hash, which both engines compute bit-identically → hash-green
    "doc_fingerprint_md5" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          functions.Text.fingerprintPortable(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
    // winnowing fingerprint set (MOSS): hash arithmetic not portable →
    // rows-only; TextSpec pins the shared-run guarantee. Exploded to
    // one (doc_id, fingerprint) row per selected hash: scalar cells
    // only, so the driver's comparator can count and sort the result
    // (a raw array<long> column broke its row hash in round 3)
    "doc_winnow" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(functions.Text.winnow(col("text"))).as("fingerprint"))
        .orderBy(col("doc_id"), col("fingerprint"))),
    // portable-hash twin (r7): identical winnowing arithmetic (k-gram
    // sequence → w-window min → distinct sort) over the md5-slice
    // hash, fully replayed in the DuckDB oracle → hash-green
    "doc_winnow_md5" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(functions.Text.winnow(col("text"), 5, 4,
            functions.Text.portableHash60)).as("fingerprint"))
        .orderBy(col("doc_id"), col("fingerprint"))),
    // substring-run pair detection over winnow fingerprints (hash
    // arithmetic → rows-only; DedupSpec pins the run/boilerplate
    // semantics)
    "doc_shared_runs" -> ((s, d) =>
      Dedup.sharedRuns(Tables.documents(s, d), "doc_id", "text",
          k = 5, w = 4, minShared = 1, maxDocFreq = 200)
        .orderBy(col("id_a"), col("id_b"))),
    // portable-hash twin (r7): the whole pair pipeline — winnow sets,
    // df-cap, pair counts — replayed in SQL over the md5-slice hash
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
    // it with that one restriction
    "dedup_ngram_jaccard_incr" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val cut = lit(250L)
      val frames = Dedup.ngramIndexFrames(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", n = 3, maxDocFreq = 1000)
      Dedup.ngramJaccardIncremental(frames, corpus.filter(col("doc_id") >= cut),
          "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000,
          includeIntraBatch = true)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_minhash" -> ((s, d) =>
      Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),
    // portable-hash twin (r7): ONLY the shingle hash swaps to the
    // md5-slice; the Kirsch–Mitzenmacher double hashing (h2 is still
    // Spark's xxhash64 on the shingle hash, replayed via the xxHash64
    // SQL chain), min-signatures, banding, and exact-Jaccard verify
    // are the REAL production arithmetic, graded bit-exact in DuckDB
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
    // blocks and blow up the candidate space
    "dedup_simhash" -> ((s, d) =>
      Dedup.simHash(Tables.documents(s, d), "doc_id", "text", n = 3, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),
    // portable-hash twin (r7): per-bit votes, majority signature,
    // pigeonhole blocks, and the hamming verify all replay in DuckDB
    // over the md5-slice shingle hash → hash-green
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
    // keep-BEST-per-cluster (r8): the curation form — the longest doc
    // of each near-dup cluster survives (ties to the lowest id),
    // unclustered docs survive as their own cluster
    "dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"),
        functions.Text.tokenCountWs(col("text")).as("n_words"))
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000)
      Dedup.keepBestPerCluster(scored, "doc_id", pairs, "n_words")
        .select(col("comp"), col("doc_id").as("keeper_id"), col("n_words"))
        .orderBy(col("comp"))
    }),
    // cluster-maintenance twin (r7): the same pair stream split into
    // "yesterday" (both ids < cut → labeled) and "today" (the rest,
    // folded via the star-edge incremental) — provably identical to
    // the full replay, so the SAME recursive oracle grades it
    "dedup_components_incr" -> ((s, d) => {
      // persisted: the day-1/day-2 filters both read this pair stream
      val pairs = graft.Par.persistTracked(
        Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5, maxDocFreq = 1000))
      val cut = lit(250L)
      val day1 = pairs.filter(col("id_a") < cut && col("id_b") < cut)
      val day2 = pairs.filter(!(col("id_a") < cut && col("id_b") < cut))
      Dedup.connectedComponentsIncremental(
          Dedup.connectedComponents(day1), day2)
        .orderBy(col("id"))
    }),

    // ---- sampling / splitting (§2.5b) ----
    // modulo split: the bit-portable oracle for the assignment chain
    "sample_split" -> ((s, d) =>
      Sampling.modSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),
    // hash split: the production path, graded with FULL rows since r7 —
    // the oracle replays Spark's xxHash64-of-long itself (HUGEINT
    // modular arithmetic in DuckDB), so the real hash assignment is
    // checked, not a twin
    "sample_split_hash" -> ((s, d) =>
      Sampling.hashSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),
    // leakage-safe split (r8): near-dup clusters never straddle
    // train/val — split key = transitive-cluster label over the
    // graded ngram-Jaccard pair graph, own id for unclustered docs
    "sample_split_leakage_safe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000)
      Sampling.leakageSafeSplit(docs.select(col("doc_id")), "doc_id", pairs,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),
    // exact-n-per-stratum sample (r8): each language contributes its
    // 100 lowest-hash docs — the two-phase bounded-heap top-n; the
    // oracle replays the xxHash64 ranking over the FULL stratum, so
    // the phase-1 candidate pruning is proven lossless on real data
    "sample_stratified_n" -> ((s, d) =>
      Sampling.stratifiedTopN(Tables.documents(s, d), "doc_id", "lang", n = 100)
        .select(col("doc_id"), col("lang"), col("rank"))
        .orderBy(col("lang"), col("rank"))),
    // sequential Poisson PPS sample (r8-cont): ξ = uniform(h)/weight,
    // n smallest — every step cross-engine exact (53-bit logical
    // shift, power-of-two scale, one IEEE division), so the oracle
    // replays the full ranking
    "sample_weighted_n" -> ((s, d) =>
      Sampling.weightedSampleN(Tables.documents(s, d), "doc_id", "n_chars",
          n = 200)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))
        .orderBy(col("rank"))),
    // per-stratum PPS (r8-cont): each language keeps its n smallest
    // ξ — same bit-portable rank variable, ranking replayed per
    // stratum
    "sample_weighted_n_stratum" -> ((s, d) =>
      Sampling.weightedSampleNPerStratum(Tables.documents(s, d), "doc_id",
          "lang", "n_chars", n = 50)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))
        .orderBy(col("lang"), col("rank"))),
    // PPS-maintenance twin: day 1's sample folded with day 2's batch —
    // the n-smallest-ξ reduction is associative and idempotent, so the
    // SAME full-corpus ranking oracle grades the fold
    "sample_weighted_n_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cut = lit(250L)
      val day1 = Sampling.weightedSampleN(docs.filter(col("doc_id") < cut),
        "doc_id", "n_chars", n = 200)
      Sampling.weightedSampleNIncremental(day1,
          docs.filter(col("doc_id") >= cut), "doc_id", "n_chars", n = 200)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))
        .orderBy(col("rank"))
    }),
    // sample-maintenance twin: day 1's sample folded with day 2's
    // batch — provably identical to the full run (top-n by hash is an
    // associative idempotent reduction), so the SAME oracle grades it
    "sample_stratified_n_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cut = lit(250L)
      val day1 = Sampling.stratifiedTopN(docs.filter(col("doc_id") < cut),
        "doc_id", "lang", n = 100)
      Sampling.stratifiedTopNIncremental(day1,
          docs.filter(col("doc_id") >= cut), "doc_id", "lang", n = 100)
        .select(col("doc_id"), col("lang"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),
    // proportional low-discrepancy interleave (r8-cont): every prefix
    // of the output order carries each source within ±1 of its exact
    // proportional share; pos = (r−0.5)/n is bit-identical IEEE
    // arithmetic in both engines, so the FULL ordering is graded (the
    // operator runs the 256-bucket scale path, the oracle the naive
    // per-group rank window; seq added here — the operator itself
    // ends at the distributed range sort, never a global row_number)
    "corpus_interleave" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("pos").asc, col("source").asc, col("doc_id").asc)
      Sampling.interleaveByGroup(Tables.documents(s, d), "doc_id", "source")
        .select(col("doc_id"), col("group_key").as("source"), col("pos"))
        .withColumn("seq", row_number().over(w))
        .orderBy(col("seq"))
    }),
    // training-shard writer manifest (r8-cont): the graded result IS
    // the manifest the REAL writer returns — the query routes the
    // corpus through Sink.writeShards into a fresh temp dir (files +
    // _manifest written as a side effect), and the oracle replays the
    // pmod(xxhash64) shard assignment per shard
    "corpus_shards" -> ((s, d) => {
      val out = s"/tmp/graft-shards-${java.util.UUID.randomUUID()}"
      graft.sources.Sink.writeShards(Tables.documents(s, d), "doc_id",
          nShards = 8, path = out)
        .orderBy(col("shard"))
    }),

    // ---- corpus vocabulary stats (§2.5) ----
    "corpus_top_terms" -> ((s, d) =>
      functions.Text.topTerms(Tables.documents(s, d), "doc_id", "text", k = 100)),

    // BM25 top-k retrieval (r8-cont): Lucene-IDF BM25 over the corpus
    // for a fixed query — ranking on the ROUNDED score (ties to the
    // lower doc id) so the cross-engine order is stable; the oracle
    // replays the identical left-to-right IEEE arithmetic
    "corpus_bm25_topk" -> ((s, d) =>
      functions.Text.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          queryTerms = Seq("spark", "hash", "join"), k = 50)
        .orderBy(col("rank"))),
    // nDCG@50 over that same BM25 ranking (r11): graded term-overlap
    // relevance, rounded-term DCG/IDCG integer sums, one division —
    // the search-quality eval harness
    "search_ndcg" -> ((s, d) =>
      functions.Text.ndcgAtK(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("spark", "hash", "join"), k = 50)),
    // PMI collocations (r11, Church & Hanks): strongly-associated
    // adjacent pairs, hapax-pair pathology cut by minCount, top-k on
    // the rounded score
    "corpus_collocations" -> ((s, d) =>
      functions.Text.collocations(Tables.documents(s, d), "doc_id", "text",
        minCount = 5L, k = 50)),

    // maintained BM25 inverted index (r11): two corpus halves indexed
    // separately (per-doc postings + lens rows — the daily-append
    // shape), the query runs against the UNIONED index frames and
    // must answer exactly like the full re-scan — integer tf/len/df
    // adds and the shared scoring tail make the equality structural
    "corpus_bm25_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (p1, l1) = functions.Text.bm25IndexFrames(
        docs.filter(col("doc_id") < 250), "doc_id", "text")
      val (p2, l2) = functions.Text.bm25IndexFrames(
        docs.filter(col("doc_id") >= 250), "doc_id", "text")
      functions.Text.bm25TopKIndexed(p1.unionByName(p2), l1.unionByName(l2),
          queryTerms = Seq("spark", "hash", "join"), k = 50)
        .orderBy(col("rank"))
    }),

    // word-level repetition signals (Gopher A1.1-style): type-token
    // ratio + top-word fraction per doc
    "doc_repetition" -> ((s, d) =>
      functions.Text.wordRepetition(Tables.documents(s, d), "doc_id", "text")
        .withColumn("distinct_ratio", round(col("distinct_ratio"), 6))
        .withColumn("top_word_frac", round(col("top_word_frac"), 6))
        .orderBy(col("doc_id"))),

    // Misra–Gries heavy-hitter terms (r7): the bounded-memory top-k
    // whose shuffle is partitions×capacity rows regardless of vocab.
    // count_min depends on the partition layout → rows-only by
    // design; TextSpec pins the presence + bracketing guarantees
    "corpus_top_terms_approx" -> ((s, d) =>
      functions.Text.topTermsApprox(Tables.documents(s, d), "doc_id", "text",
          k = 20, capacity = 256)
        .orderBy(col("count_min").desc, col("term"))),

    // n-gram repetition signals (r7; Gopher A1.1 duplicate/top
    // n-gram filters) — catches looped/templated text whose
    // word-level ratios look normal
    "doc_ngram_repetition" -> ((s, d) =>
      functions.Text.ngramRepetition(Tables.documents(s, d), "doc_id", "text", n = 3)
        .withColumn("top_ngram_frac", round(col("top_ngram_frac"), 6))
        .withColumn("dup_ngram_frac", round(col("dup_ngram_frac"), 6))
        .orderBy(col("doc_id"))),

    // rule filter over those signals: keep + FIRST failing rule
    // (thresholds chosen to split this corpus: median distinct_ratio
    // ≈ 0.46, median top_word_frac ≈ 0.09)
    "doc_quality_filter" -> ((s, d) =>
      functions.Text.qualityFilter(Tables.documents(s, d), "doc_id", "text",
          minWords = 20L, maxWords = 1000L,
          minDistinctRatio = 0.4, maxTopWordFrac = 0.12)
        .orderBy(col("doc_id"))),

    // segment-level exact dedup (r9; CCNet line-dedup with a fixed
    // 20-word window as the unit — this corpus has no newlines):
    // keep each segment's corpus-wide first occurrence, rebuild docs
    "dedup_segments" -> ((s, d) =>
      Dedup.segmentDedup(Tables.documents(s, d), "doc_id", "text", window = 20)
        .orderBy(col("doc_id"))),

    // incremental segment dedup (r9): batch dedups against the
    // persisted segment-hash index; batch ids order after the index
    "dedup_segments_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cut = lit(250L)
      val index = Dedup.segmentIndex(docs.filter(col("doc_id") < cut),
        "doc_id", "text", window = 20)
      Dedup.segmentDedupIncremental(index, docs.filter(col("doc_id") >= cut),
          "doc_id", "text", window = 20)
        .orderBy(col("doc_id"))
    }),

    // Zipf's-law OLS fit over the top-100 vocabulary (r9): the
    // one-row natural-language-vs-template corpus screen
    "corpus_zipf" -> ((s, d) =>
      functions.Text.zipfFit(Tables.documents(s, d), "doc_id", "text", k = 100)),

    // BPE merge learning (r9; Sennrich '16): iterative argmax-pair
    // merges over the word-TYPE table. Deterministic (tie-break by
    // count desc, pair asc) but iterative — not SQL-expressible, so
    // rows-only; BpeSpec pins the merge table on a hand-computed
    // corpus and merge-application semantics
    "corpus_bpe" -> ((s, d) =>
      functions.Bpe.learnMerges(Tables.documents(s, d), "doc_id", "text",
        numMerges = 30)),

    // model-based quality score (r9; GPT-3 appendix A distillation):
    // logistic regression on the repetition/stopword signals with
    // the rule verdict as teacher. L-BFGS coefficients reproduce
    // only to float-sum order → rows-only; QualityModelSpec pins
    // teacher agreement + separation
    "doc_quality_model" -> ((s, d) =>
      QualityModel.trainScore(Tables.documents(s, d), "doc_id", "text",
          minWords = 50L, maxWords = 1000L,
          minDistinctRatio = 0.4, maxTopWordFrac = 0.12)
        .orderBy(col("doc_id"))),

    // per-domain score calibration (r8): z + min-max normalization of
    // the quality score within source — scores comparable across
    // domains before any global threshold
    "doc_quality_normalized" -> ((s, d) => {
      val t = col("text")
      val nWords = functions.Text.tokenCountWs(t)
      val score = functions.Text.stopwordHits(t, functions.Text.StopwordsEn)
        .cast("double") / nullif(nWords, lit(0L)).cast("double")
      val scored = Tables.documents(s, d).select(col("doc_id"), col("source"),
        coalesce(score, lit(0.0)).as("score"))
      Quality.normalizeScores(scored, "source", "score")
        .select(col("doc_id"), col("source"), col("score_z"), col("score_minmax"))
        .orderBy(col("doc_id"))
    }),

    // per-domain fractional quality cut (r8): keep the best 30% of
    // every source by the stopword-ratio score — the operator runs the
    // bucketed per-group scale path, the oracle the naive rank window
    "doc_quality_top_frac" -> ((s, d) => {
      val t = col("text")
      val nWords = functions.Text.tokenCountWs(t)
      val score = functions.Text.stopwordHits(t, functions.Text.StopwordsEn)
        .cast("double") / nullif(nWords, lit(0L)).cast("double")
      val scored = Tables.documents(s, d).select(col("doc_id"), col("source"),
        coalesce(score, lit(0.0)).as("score"))
      Sampling.topFracPerGroup(scored, "doc_id", "source", "score", frac = 0.3)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // greedy token-budget assembly (r8): the maximal prefix of the
    // corpus ordered most-natural-text-first (stopword ratio desc)
    // whose token sum fits the budget; the operator runs the bucketed
    // scale path, the oracle the naive global running-sum window
    "corpus_select_budget" -> ((s, d) => {
      val t = col("text")
      val nWords = functions.Text.tokenCountWs(t)
      val score = functions.Text.stopwordHits(t, functions.Text.StopwordsEn)
        .cast("double") / nullif(nWords, lit(0L)).cast("double")
      val scored = Tables.documents(s, d).select(col("doc_id"),
        nWords.as("n_words"), coalesce(score, lit(0.0)).as("score"))
      Sampling.selectBudget(scored, "doc_id", "n_words", "score",
          budget = 15000L)
        .select(col("doc_id"), col("n_words"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance-resampling selection (r11, Xie et al. '23):
    // non-English candidates ranked by how much they read like the
    // English target under hashed-unigram models (md5-slice buckets —
    // the whole score replays in SQL); deterministic top-k form
    "select_dsir" -> ((s, d) =>
      Sampling.dsirSelect(Tables.documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en", n = 100)
        .orderBy(col("rank"))),

    // per-(doc, term) TF-IDF; nDocs from the raw scan (metadata-only)
    "doc_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      functions.Text.tfIdf(docs, "doc_id", "text", docs.count())
        .withColumn("tfidf", round(col("tfidf"), 6))
        .orderBy(col("doc_id"), col("term"))
    }),

    // corpus-unigram surprisal: the distribution-outlier curation
    // signal; round(4) keeps the cross-engine double-sum comparison
    // far from rounding boundaries
    "doc_surprisal" -> ((s, d) =>
      functions.Text.unigramSurprisal(Tables.documents(s, d), "doc_id", "text")
        .withColumn("avg_logprob", round(col("avg_logprob"), 4))
        .orderBy(col("doc_id"))),
    // conditional (bigram) surprisal — word-ORDER-sensitive quality
    // signal (r7); same round(4) cross-engine double-sum guard
    "doc_bigram_surprisal" -> ((s, d) =>
      functions.Text.bigramSurprisal(Tables.documents(s, d), "doc_id", "text")
        .withColumn("avg_logprob", round(col("avg_logprob"), 4))
        .orderBy(col("doc_id"))),

    // ---- PII redaction (§2.5) ----
    // deterministic synthetic PII seeded INSIDE the query (the raw
    // corpus carries none), so redaction + audit counts grade against
    // a DuckDB regexp oracle — patterns are RE2-compatible by design
    // (functions/Text.scala), so both engines match identically
    "doc_pii_redact" -> ((s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" see https://ex.org/p/"), col("doc_id").cast("string"),
          lit(" from 10.1.2.3")).as("text"))
      seeded.select(col("doc_id"),
          functions.Text.redactPii(col("text")).as("redacted"),
          functions.Text.piiCounts(col("text")).as("pii"))
        .select(col("doc_id"), col("redacted"),
          col("pii.n_emails").as("n_emails"),
          col("pii.n_urls").as("n_urls"),
          col("pii.n_ips").as("n_ips"))
        .orderBy(col("doc_id"))
    }),

    // column-level PII exposure scan (r11): the governance screen a
    // table passes before training/export clearance — every string
    // column × PII kind gets (rows hit, total hits) from ONE scan
    // using the SAME patterns the redaction pass applies. The text
    // column is seeded with one email/url/ip per doc (the
    // doc_pii_redact corpus), lang/source must screen clean
    "pii_column_scan" -> ((s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" see https://ex.org/p/"), col("doc_id").cast("string"),
          lit(" from 10.1.2.3")).as("text"),
        col("lang"), col("source"))
      Quality.piiColumnScan(seeded, Seq("text", "lang", "source"))
        .orderBy(col("column_name"), col("pii_kind"))
    }),
    // k-anonymity / l-diversity audit (r11): equivalence classes on
    // (nation, segment), acctbal as the sensitive attribute — the
    // re-identification screen before export clearance
    "pii_k_anonymity" -> ((s, d) =>
      Quality.kAnonymity(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), k = 10,
        sensitiveCol = Some("c_acctbal"))),
    // t-closeness (r11): the third privacy rung — per (nation,
    // segment) class, total-variation distance of the balance-band
    // distribution from the global one; zero cells via algebra (no
    // grid), rounded-6/1e6-scaled terms summed as integers
    "dq_t_closeness" -> ((s, d) =>
      Quality.tCloseness(Tables.customer(s, d)
          .withColumn("bal_band",
            floor(col("c_acctbal") / lit(2000.0)).cast("int")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", t = 0.2)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // salted pseudonymization (r8-cont): both sides tokenize their
    // key under one salt and the JOIN RUNS ON TOKENS — the graded
    // aggregate (incl. a sample token value) proves referential
    // integrity survives tokenization and the md5-slice tokens are
    // engine-portable
    "pii_pseudonymized_join" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        functions.Text.pseudonymize(col("c_custkey"), "tenant-a").as("token"),
        col("c_mktsegment"))
      val o = Tables.orders(s, d).select(
        functions.Text.pseudonymize(col("o_custkey"), "tenant-a").as("token"))
      c.join(o, Seq("token"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("token")).as("n_customers"),
          min(col("token")).as("sample_token"))
        .orderBy(col("c_mktsegment"))
    }),

    // trigram-indexed substring search (r8-cont, the pg_trgm
    // pattern): candidates from posting-list intersection over the
    // pattern's trigrams, exact contains verify on candidates only —
    // the oracle is the definitional scan
    "doc_substring_search" -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      val idx = Search.trigramFrame(docsDf, "doc_id", "text")
      Search.substringSearch(idx, docsDf, "doc_id", "text", "data group")
        .select(col("id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // batch multi-pattern search (r8-cont): N phrases probe the
    // posting index in ONE pass; oracle = the per-pattern scans
    "doc_multi_search" -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      val idx = Search.trigramFrame(docsDf, "doc_id", "text")
      Search.multiSearch(idx, docsDf, "doc_id", "text",
          Seq("data group", "window dup", "sort merge part", "spark group"))
        .select(col("pattern"), col("id").as("doc_id"))
        .orderBy(col("pattern"), col("doc_id"))
    }),

    // positional-index phrase search (r11, the Lucene PhraseQuery
    // shape): anchor-vote adjacency intersect over (id, term, pos)
    // postings — "table table" exercises repeated phrase terms AND
    // overlapping occurrences; oracle = the definitional padded-text
    // scan counting every (incl. overlapping) occurrence
    "doc_phrase_search" -> ((s, d) => {
      val idx = Search.positionalFrame(Tables.documents(s, d), "doc_id", "text")
      Search.phraseSearch(idx, Seq("table", "table"))
        .select(col("id").as("doc_id"), col("n_matches"), col("first_pos"))
        .orderBy(col("doc_id"))
    }),

    // batch multi-phrase search (r11): N phrases probe the positional
    // index in ONE pass — the banned-phrase-list shape at token
    // level; includes a rare and a no-hit phrase
    "doc_multi_phrase" -> ((s, d) => {
      val idx = Search.positionalFrame(Tables.documents(s, d), "doc_id", "text")
      Search.multiPhraseSearch(idx, Seq(
          Seq("table", "table"), Seq("value", "table"),
          Seq("fast", "sort", "key"), Seq("quantum", "leap")))
        .select(col("pattern"), col("id").as("doc_id"),
          col("n_matches"), col("first_pos"))
        .orderBy(col("pattern"), col("doc_id"))
    }),

    // maintained positional index (r11): two corpus halves indexed
    // separately, the phrase runs against the UNIONED postings and
    // must answer exactly like the fresh build — positions are
    // per-doc, so batch frames append row-for-row
    "doc_phrase_search_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val i1 = Search.positionalFrame(docs.filter(col("doc_id") < 250), "doc_id", "text")
      val i2 = Search.positionalFrame(docs.filter(col("doc_id") >= 250), "doc_id", "text")
      Search.phraseSearch(i1.unionByName(i2), Seq("table", "table"))
        .select(col("id").as("doc_id"), col("n_matches"), col("first_pos"))
        .orderBy(col("doc_id"))
    }),

    // ---- sequence packing (§2.5b) ----
    // bin ids depend on partition layout → rows-only (one row per doc;
    // PackSpec pins the packing invariants)
    "doc_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        functions.Text.tokenCountBpe(col("text")).as("n_tokens"))
      Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 2048L)
        .orderBy(col("doc_id"))
    }),
    // fixed-window chunking with stride overlap (r7): window 32,
    // stride 24 → consecutive chunks share 8 tokens; full oracle
    // (the start/length arithmetic replays exactly in SQL)
    "doc_chunk" -> ((s, d) =>
      Pack.chunkTokens(Tables.documents(s, d), "doc_id", "text",
          window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // ---- numeric distribution profile (§2.3) ----
    // exact percentiles: the oracle baseline (buffers the column —
    // bounded inputs only; the approx variant is the 100 TB path)
    "dq_numeric_profile" -> ((s, d) =>
      Quality.profileNumeric(Tables.orders(s, d),
          Seq("o_custkey", "o_totalprice"))
        .orderBy(col("column_name"))),
    "dq_numeric_profile_approx" -> ((s, d) =>
      Quality.profileNumericApprox(Tables.orders(s, d),
          Seq("o_custkey", "o_totalprice"))
        .orderBy(col("column_name"))),

    // ---- eval-set decontamination (§2.5b) ----
    // eval = every 10th doc; flag eval docs sharing ≥3 shingles with
    // any training doc, reporting the worst-overlapping train doc
    "decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contamination(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 3, minCommon = 3, maxDocFreq = 1000)
        .orderBy(col("eval_id"))
    }),
    // daily-ingest decontamination (r11): the direction-flipped delta
    // form — the eval set's gram index is fixed, today's training
    // batch (second half of the train docs) is checked against it at
    // batch cost, and contaminated BATCH docs are flagged with their
    // worst offending eval doc so they drop before training
    "decontamination_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalIdx = Dedup.evalGramIndex(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 3)
      Dedup.contaminationBatch(evalIdx,
          docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") >= 250),
          "doc_id", "text", n = 3, minCommon = 3, maxDocFreq = 1000)
        .orderBy(col("doc_id"))
    }),

    // ---- end-to-end curation pipeline (§2.5b) ----
    // the whole training-set story composed: quality gate → exact
    // dedup (keep lowest id) → near-dup removal (drop the higher id of
    // every ngram-Jaccard pair) → deterministic split. Each stage is a
    // graded operator; this entry proves they COMPOSE, oracle-checked
    // end to end.
    "curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val quality = docs.filter(
        functions.Text.tokenCountWs(col("text")) >= 5 &&
          functions.Text.stopwordHits(col("text"), functions.Text.StopwordsEn) > 0)
      val keepers = Dedup.exact(quality, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"))
      val survivors = quality.join(keepers, Seq("doc_id"), "left_semi")
      val nearDupLosers = Dedup.ngramJaccard(survivors, "doc_id", "text",
          n = 3, threshold = 0.5, maxDocFreq = 1000)
        .select(col("id_b").as("doc_id")).distinct()
      val curated = survivors.join(nearDupLosers, Seq("doc_id"), "left_anti")
      Sampling.modSplit(curated, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal (§2.5) ----
    // document text as an opaque binary asset through the REAL
    // multimodal batch path (mapPartitions feature extraction);
    // n_bytes + byte entropy are codec-free and oracle-comparable
    // (rounded: the two engines sum -p·log2(p) in different orders)
    "multimodal_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"), lit("text").as("media_type"),
          col("text").cast("binary").as("content"),
          lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
        .as[graft.multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("n_bytes"),
          round(col("byte_entropy"), 6).as("byte_entropy"))
        .orderBy(col("media_id"))
    }),

    // ---- similarity search (§2.5) ----
    // IVF mechanics graded against a FULL DuckDB oracle (r7): the
    // graded quantizer is the deterministic "first nlist corpus
    // vectors" pick, so assignment/probing/scoring replicate exactly
    // in SQL — the trained-KMeans quantizer path keeps its recall
    // ≥0.8 spec in SimilaritySpec (k-means iterations aren't SQL)
    "ann_ivf_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1).toSeq
      Similarity.ivfTopKWith(embs, queries, "vec_id", "embedding", "vec_id",
          k = 10, centroids = cents, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // k-NN weak labeling (r11): every 50th vector plays the
    // unlabeled batch, the rest the labeled seed corpus; each batch
    // vector takes the majority label of its 10 nearest neighbors
    // (integer votes, ties to the lowest label — fully
    // SQL-replayable, no float aggregation)
    "ann_knn_label" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      Similarity.knnLabel(
          embs.filter(col("vec_id") % 50 =!= 0),
          embs.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "label", k = 10)
        .orderBy(col("vec_id"))
    }),
    // incremental IVF index maintenance (r11): the daily-ingest ANN
    // path — the corpus's first half is indexed, the second half is
    // ASSIGNED AT BATCH COST against the frozen centroids and
    // appended through a real parquet store hop, and the query runs
    // against the maintained index. Frozen centroids make per-row
    // assignment deterministic, so the result is IDENTICAL to a full
    // rebuild — the oracle is ann_ivf_topk's replay verbatim
    "ann_ivf_incr_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1).toSeq
      val store = graft.TempDirs.create("graft_ivf_") + "/t"
      Similarity.ivfIndexFrame(embs.filter(col("vec_id") < 250),
        "vec_id", "embedding", cents).write.parquet(store)
      Similarity.ivfIndexFrame(embs.filter(col("vec_id") >= 250),
        "vec_id", "embedding", cents).write.mode("append").parquet(store)
      Similarity.ivfTopKIndexed(s.read.parquet(store), queries,
          "embedding", "vec_id", k = 10, centroids = cents, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_brute_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // hyperplane-LSH ANN path — FULL oracle since r7 (same literal-
    // plane replay as dedup_embedding_lsh); SimilaritySpec still
    // asserts recall ≥0.6 vs brute force
    "ann_lsh_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      Similarity.lshTopK(embs, queries, "vec_id", "embedding", "vec_id",
          k = 10, planes = 8, tables = 4)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // product-quantized ANN (r8-cont): deterministic codebooks — the
    // 16 lowest-id vectors' normalized subvectors (m=4 × 16 dims),
    // the ivf first-16 discipline — so assignment, ADC scoring, the
    // candidate cut at 40, and the exact-cosine rerank all replay in
    // SQL. Driver-side normalization matches unitNorm bit-for-bit
    // (sequential square sum, one sqrt, one division per element)
    "ann_pq_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val first = embs.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val v = r.getSeq[Float](1).map(_.toDouble)
          var ss = 0.0
          v.foreach(x => ss += x * x)
          val n = math.sqrt(ss)
          if (n == 0) v.map(_ => 0.0) else v.map(_ / n)
        }
      val books = (0 until 4).map(j =>
        first.map(_.slice(j * 16, j * 16 + 16).toSeq).toSeq)
      Similarity.pqTopKWith(embs, queries, "vec_id", "embedding", "vec_id",
          k = 10, codebooks = books, rerankMult = 4)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // int8 scalar-quantized ANN (r8-cont): phase-1 candidate ranking
    // by the EXACT integer code dot product (fully deterministic —
    // the oracle replays quantization, candidate cut, and rerank),
    // phase-2 exact-cosine rerank of 4k survivors
    "ann_sq8_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      Similarity.sqTopK(embs, queries, "vec_id", "embedding", "vec_id",
          k = 10, rerankMult = 4)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- r8 wave 4 ----
    // distributed dense surrogate keys: two-phase range-partitioned
    // numbering ≡ row_number() OVER (ORDER BY o_orderdate, o_orderkey)
    // with no SinglePartition exchange (SurrogateKeySpec asserts)
    "surrogate_keys" -> ((s, d) =>
      SurrogateKey.assign(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          Seq("o_orderdate", "o_orderkey"), "sk")
        .orderBy(col("sk"))),
    // incremental materialized aggregate: state over event_id < 8000
    // folded with the ≥ 8000 delta must equal the full recompute the
    // oracle runs (the id split stands in for the daily watermark —
    // same pushed-down predicate shape)
    "mv_incremental" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"), col("event_id"))
      val keys = Seq("user_id", "event_type")
      val cut = lit(8000L)
      val state = IncrementalAgg.init(ev.filter(col("event_id") < cut), keys, "value")
      IncrementalAgg.finalize(
          IncrementalAgg.maintain(state, ev.filter(col("event_id") >= cut), keys, "value"))
        .select(col("user_id"), col("event_type"), col("n_rows"),
          col("sum_value"), col("min_value"), col("max_value"), col("avg_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),
    // derived CDC between two committed versions of a Versioned table
    // (inserts + deletes + null-safe updates; unchanged keys silent)
    "versioned_change_feed" -> ((s, d) => {
      import graft.sources.Versioned
      val root = graft.TempDirs.create("graft_vcf_") + "/t"
      val c = Tables.customer(s, d)
      val v1 = c.filter(col("c_custkey") % 10 =!= 3)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val v2 = c.filter(col("c_custkey") % 10 =!= 7)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      Versioned.commit(v1, root, replace = true)
      Versioned.commit(v2, root, replace = true)
      Versioned.changes(s, root, 1, 2, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
    // robust per-group outlier counts: MAD flags with round(6)-guarded
    // threshold compare (same cross-engine percentile discipline as
    // the dq profiles)
    "events_mad_outliers" -> ((s, d) =>
      Analytics.madOutliers(
          Tables.events(s, d).select(col("event_type"), col("value")),
          "event_type", "value", k = 3.0)
        .orderBy(col("event_type"))),
    // last-touch attribution: purchases credited to the latest
    // click/view at-or-before them within a 7-day lookback — one
    // sorted pass, no conversion×touch join
    "events_attribution" -> ((s, d) =>
      Analytics.attributionLastTouch(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
          touchTypes = Seq("click", "view"), convType = "purchase")
        .orderBy(col("conv_id"))),
    // LINEAR multi-touch attribution (r11): every in-window touch
    // (capped at the 50 most recent) shares the conversion's credit
    // equally — per-row rational credit rounded once, no float sums,
    // one row per (conversion, credited touch)
    "events_attribution_linear" -> ((s, d) =>
      Analytics.attributionLinear(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
          touchTypes = Seq("click", "view"), convType = "purchase")
        .orderBy(col("conv_id"), col("touch_id"))),
    // U-shaped (position-based) attribution (r11): first and last
    // in-window touches carry 40% each, middles split the remainder;
    // same per-row-rational + recency-cap discipline as the linear
    // form
    "events_attribution_ushape" -> ((s, d) =>
      Analytics.attributionPositionBased(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
          touchTypes = Seq("click", "view"), convType = "purchase")
        .orderBy(col("conv_id"), col("touch_id"))),
    // exponentially-decayed activity feature: α=0.5 depth-16 lag
    // chain — power-of-two scaling + pinned add order make the doubles
    // bit-exact cross-engine (no rounding in the output)
    "events_decay" -> ((s, d) =>
      Analytics.decayedFeature(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("ts"), col("value")),
          alpha = 0.5, depth = 16)
        .orderBy(col("user_id"), col("ts"), col("event_id"))),
    // PSI drift monitor: reference = events below the id watermark,
    // current = the rest; equal-depth reference bins, Laplace-smoothed
    // fractions, Σ(q−p)·ln(q/p)
    "dq_drift_psi" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("value"))
      Quality.psiDrift(
          ev.filter(col("event_id") % 5 =!= 0).select(col("value")),
          ev.filter(col("event_id") % 5 === 0).select(col("value")),
          "value", bins = 10)
        .orderBy(col("bin"))
    }),
    // KS two-sample drift: binning-free max-CDF-gap via the two-phase
    // distributed cumsum (no SinglePartition window)
    "dq_drift_ks" -> ((s, d) => {
      // proportional id split (4:1) so both samples are nonempty at
      // every SF (an absolute watermark empties the current side at
      // sf0.001 — KS needs both CDFs to exist)
      val ev = Tables.events(s, d).select(col("event_id"), col("value"))
      Quality.ksDrift(
        ev.filter(col("event_id") % 5 =!= 0).select(col("value")),
        ev.filter(col("event_id") % 5 === 0).select(col("value")),
        "value")
    }),
    // BM25 ranked retrieval over the corpus (Lucene-shifted idf,
    // k1=1.2 b=0.75), scored only on posting-sized frames
    "doc_bm25_search" -> ((s, d) =>
      Search.bm25(Tables.documents(s, d), "doc_id", "text",
          query = Seq("window", "join", "scan"), topK = 20)
        .orderBy(col("score").desc, col("id"))),
    // triangle census of the co-purchase graph (degree-oriented wedge
    // counting — each triangle closed at its min-degree corner)
    "graph_triangles" -> ((s, d) => {
      // pk-sampled subgraph (¼ of parts, pushed to the scan): the
      // full co-purchase graph is DENSE (avg degree >100 at sf0.1 →
      // ~140M wedges); the graded census runs the identical operator
      // on a bounded-density slice, and StressR8d-style scaling is
      // argued on the operator doc (out-degree O(√E) by orientation)
      Graph.triangleStats(coPurchaseEdges(s, d), "pa", "pb")
    }),
    // neighbor-Jaccard link prediction (r11) on the same bounded-
    // density co-purchase slice: top-100 non-adjacent pairs by shared-
    // neighbor Jaccard — ranked on the ROUNDED score, ties to ids
    "graph_link_predict" -> ((s, d) =>
      Graph.linkPredict(coPurchaseEdges(s, d), "pa", "pb", topK = 100)),
    // Adamic–Adar link prediction (r11) on the same slice: shared
    // RARE neighbors outweigh shared hubs — per-center 1/ln(deg)
    // terms, rounded-6/1e6-scaled, summed as order-free integers
    "graph_adamic_adar" -> ((s, d) =>
      Graph.adamicAdar(coPurchaseEdges(s, d), "pa", "pb", topK = 100)),
    // HITS hubs/authorities (r11) on the DIRECTED customer→part
    // purchase graph: 8 integer fixed-point rounds, max-normalized
    // per phase — hash-green where float HITS never could be
    "graph_hits" -> ((s, d) => {
      val edges = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .filter(col("l_partkey") % 4 === 0)
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      Graph.hitsFixedPoint(edges, "cust", "part", iterations = 8, topK = 50)
        .orderBy(col("kind"), col("rank"))
    }),
    // column-level lineage of the fact model, extracted STRUCTURALLY
    // from the analyzed Catalyst plan (nothing executed); the oracle
    // states the expected provenance literally — the gate proves the
    // plan walk, not a data computation
    "pipeline_column_lineage" -> ((s, d) =>
      graft.plans.ColumnLineage.of(graft.pipeline.Models.factLineitem(s, d))
        .orderBy(col("column"), col("source_table"), col("source_column"))),
    // The float-form PageRank is NOT graded (retired r11, verdict
    // item 5): per-node double sums add in partition order, so its
    // output is not cross-engine replayable and the graded key was a
    // permanent rows-only row. The operator stays ([[Graph.pageRank]],
    // PageRankSpec pins semantics against a driver-side reference
    // iteration) and the THREE fixed-point twins below grade the
    // iterative semantics hash-green.
    // fixed-point-arithmetic PageRank twin (r9): long micro-rank
    // units and integer `div` make every round order-free and
    // engine-portable, so THIS form is hash-green — the md5-twin
    // discipline applied to the iterative operator (the double form
    // above stays rows-only with its spec-pinned semantics)
    "graph_pagerank_fixed" -> ((s, d) => {
      Graph.pageRankFixedPoint(coPurchaseEdges(s, d), "pa", "pb",
          iterations = 10)
        .orderBy(col("rank_fp").desc, col("node")).limit(100)
    }),
    // WEIGHTED fixed-point PageRank: edge weight = shared-order
    // count, contributions proportional to exact integer weights
    "graph_pagerank_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val wedges = li.select(col("ok"), col("pk").as("pa"))
        .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
      Graph.pageRankFixedPointWeighted(wedges, "pa", "pb", "w",
          iterations = 10)
        .orderBy(col("rank_fp").desc, col("node")).limit(100)
    }),
    // PERSONALIZED fixed-point PageRank: teleport restarts at the
    // pk % 40 == 0 seed parts — "central relative to THESE products"
    "graph_ppr" -> ((s, d) =>
      Graph.personalizedPageRankFixedPoint(coPurchaseEdges(s, d), "pa", "pb",
          Tables.part(s, d).select(col("p_partkey").as("n"))
            .filter(col("n") % 40 === 0), "n", iterations = 10)
        .orderBy(col("rank_fp").desc, col("node")).limit(100)),
    // k-core of the co-purchase graph (r9): synchronous peeling to
    // the unique fixed point; the oracle unrolls the same peels
    // (monotone set shrinkage ⇒ extra unrolled rounds are idempotent)
    "graph_kcore" -> ((s, d) =>
      Graph.kCore(coPurchaseEdges(s, d), "pa", "pb", k = 16)
        .orderBy(col("node"))),
    // degree assortativity (r9): exact long sufficient statistics,
    // one final double Pearson — hash-green cross-engine
    "graph_assortativity" -> ((s, d) =>
      Graph.assortativity(coPurchaseEdges(s, d), "pa", "pb")),

    // label-propagation communities (r9) on the same co-purchase
    // graph: integer vote counts + (count desc, label asc) argmax
    // make every round a pure function of the edge set, so the
    // iterative operator hash-grades end to end against a round-
    // unrolled DuckDB replay (r10 — the pageRankFixedPoint
    // discipline; W4OpsSpec still pins planted-clique semantics)
    "graph_communities" -> ((s, d) => {
      Graph.labelPropagation(coPurchaseEdges(s, d), "pa", "pb",
          iterations = 6)
        .orderBy(col("node"))
    }),
    // multi-source BFS hop distance (r11): blast-radius analysis
    // from the pk % 40 == 0 seed parts (the PPR teleport set) —
    // integer hops and order-free min() make every synchronous
    // round a pure function of the edge set, so the 6 rounds
    // hash-grade against the same rounds unrolled as MATERIALIZED
    // CTEs (6 ≥ the seed set's eccentricity at the graded SFs ⇒
    // exact BFS distances; extra rounds idempotent by monotonicity)
    "graph_bfs_distance" -> ((s, d) =>
      Graph.bfsDistance(coPurchaseEdges(s, d), "pa", "pb",
          Tables.part(s, d).select(col("p_partkey").as("n"))
            .filter(col("n") % 40 === 0), "n", maxHops = 6)
        .orderBy(col("node"))),
    // weighted SSSP (r11): Bellman-Ford rounds over affinity-derived
    // integer costs (frequent co-purchase = closer) from the same
    // seed set — order-free integer min per round, 6-round contract
    "graph_sssp_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val weighted = li.select(col("ok"), col("pk").as("pa"))
        .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
        .select(col("pa"), col("pb"),
          greatest(lit(1L), lit(20L) - col("n")).as("w"))
      Graph.ssspWeighted(weighted, "pa", "pb", "w",
          Tables.part(s, d).select(col("p_partkey").as("n"))
            .filter(col("n") % 40 === 0), "n", rounds = 6)
        .orderBy(col("node"))
    }),
    // Holt double-exponential smoothing per user (r9): the level+trend
    // recurrence no batch window computes, folded in one keyed
    // mapPartitions pass and replayed BIT-EXACT by a recursive CTE
    // (α = β = ½ → every step is exact halving + ordered adds, the
    // stream_ewma discipline)
    "events_holt_winters" -> ((s, d) =>
      operators.Recurrence.holtWinters(eventCols(Tables.events(s, d)),
          "user_id", "event_id", "ts", "value")
        .orderBy(col("user_id"), col("event_id"))),
    // TRIPLE (seasonal additive) exponential smoothing (r10): the
    // full Holt-Winters recurrence over per-type hourly volumes —
    // level+trend+24 seasonal slots, all-dyadic coefficients, graded
    // bit-exact against a recursive CTE carrying the seasonal ring
    // as 24 columns
    "events_holt_winters_seasonal" -> ((s, d) =>
      operators.Recurrence.holtWintersSeasonal(
          eventCols(Tables.events(s, d)), "event_type", "ts", period = 24)
        .orderBy(col("event_type"), col("bucket"))),
    // two-sided CUSUM drift detector per user (r9): max(0, s + (x−k))
    // recurrences with driver-folded constants, same bit-exact
    // recursive-CTE replay
    "events_cusum" -> ((s, d) =>
      operators.Recurrence.cusum(eventCols(Tables.events(s, d)),
          "user_id", "event_id", "ts", "value",
          target = 100.0, slack = 25.0, h = 200.0)
        .orderBy(col("user_id"), col("event_id"))),
    // EWMA adaptive control band per user (r9-cont): self-tuning
    // mean/variance recurrences, flag vs the PRIOR state's 3σ band
    "events_ewma_band" -> ((s, d) =>
      operators.Recurrence.ewmaBand(eventCols(Tables.events(s, d)),
          "user_id", "event_id", "ts", "value")
        .orderBy(col("user_id"), col("event_id"))),
    // classical additive seasonal decomposition (r11): centered-MA
    // trend + grand-mean-centered seasonal means per hour-of-day —
    // every sum integer (detrended carried ×25), so the doubles are
    // single correctly-rounded divisions
    "events_seasonal_decompose" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.seasonalDecompose(grid, "event_type", "hr", "cnt",
          seasonCol = hour(col("hr")), halfWindow = 12)
        .orderBy(col("event_type"), col("hr"))
    }),
    // quantile normalization (r11): per-source n_chars mapped onto
    // the global distribution at the same within-source rank fraction
    "quality_quantile_norm" -> ((s, d) =>
      Quality.quantileNormalize(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("n_chars")),
          "source", "n_chars", "doc_id")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("norm_value"))
        .orderBy(col("doc_id"))),
    // two-proportion z (r11): conversion-rate A/B over a
    // deterministic user split (user_id parity as the holdout)
    "ab_proportions" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", lit(1L))
          .otherwise(lit(0L))).as("converted"))
        .withColumn("variant", pmod(col("user_id"), lit(2)))
      Quality.twoProportionZ(users, "variant", "converted")
    }),
    // rank-based ROC AUC per user-parity cohort (r11): does raw
    // activity (event count) predict purchase? — exact U-statistic
    // arithmetic, one division
    "model_auc" -> ((s, d) => {
      val units = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(when(col("event_type") === "purchase", lit(1L))
            .otherwise(lit(0L))).as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(2)))
      Quality.auc(units, "cohort", "n_events", "converted")
        .orderBy(col("cohort"))
    }),
    // decile gains/lift table per cohort (r11): the targeting
    // readout behind the AUC number
    "model_gains" -> ((s, d) => {
      val units = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(when(col("event_type") === "purchase", lit(1L))
            .otherwise(lit(0L))).as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(2)))
      Quality.gainsTable(units, "cohort", "user_id", "n_events",
          "converted", buckets = 10)
        .orderBy(col("cohort"), col("bucket"))
    }),
    // WoE/IV (r11): how predictive is a user's FIRST event type of
    // eventual purchase conversion — half-unit-smoothed shares,
    // rounded-WoE contributions, order-free integer IV sum
    "dq_woe_iv" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = eventCols(Tables.events(s, d))
      val first = ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_type").as("first_event"))
      val conv = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", lit(1L))
          .otherwise(lit(0L))).as("converted"))
      Quality.weightOfEvidence(first.join(conv, Seq("user_id")),
          "first_event", "converted")
        .orderBy(col("first_event"))
    }),
    // Spearman rank correlation per nation (r11): does account
    // balance move with lifetime revenue? — doubled tie-averaged
    // ranks, decimal-exact big-integer sums, one double tree
    "corr_spearman" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      val df = rev.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
        rev("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("c_acctbal"), col("rev"))
      Quality.spearman(df, "nation", "c_acctbal", "rev")
        .orderBy(col("nation"))
    }),
    // chi-squared independence (r11): market segment × nation over
    // customers — full R×C grid, 6-decimal-rounded cell
    // contributions summed as integers (order-free)
    "dq_chi2" -> ((s, d) =>
      Quality.chiSquareIndependence(Tables.customer(s, d),
        "c_mktsegment", "c_nationkey")),
    // Mann-Whitney U per hour-of-day (r11): purchase vs view value
    // distributions — the nonparametric A/B primitive, integer-rank
    // exact with tie-corrected z
    "ab_mannwhitney" -> ((s, d) =>
      Quality.mannWhitney(
          eventCols(Tables.events(s, d)).withColumn("hod", hour(col("ts"))),
          "hod", "event_type", "value", "purchase", "view")
        .orderBy(col("hod"))),
    // Welch's t per event type (r11): do even- vs odd-parity users
    // differ in MEAN per-user activity — unequal-variance t on exact
    // integer sums, one fixed double tree
    "ab_welch_t" -> ((s, d) => {
      val units = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("grp", pmod(col("user_id"), lit(2)).cast("string"))
      Quality.welchT(units, "event_type", "grp", "n_events", "1", "0")
        .orderBy(col("event_type"))
    }),
    // CUPED variance-reduced A/B per event type (r11): pre-cutoff
    // activity as the covariate, post-cutoff activity as the metric,
    // user-parity variants — exact integer sufficient statistics,
    // θ/adjusted-diff/ρ² one double tree each
    "ab_cuped" -> ((s, d) => {
      val cutoff = lit(CdcCutoff).cast("timestamp")
      val units = eventCols(Tables.events(s, d))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(when(col("ts") <= cutoff, 1L).otherwise(0L)).as("x_pre"),
          sum(when(col("ts") > cutoff, 1L).otherwise(0L)).as("y_post"))
        .withColumn("grp", pmod(col("user_id"), lit(2)).cast("string"))
      Quality.cuped(units, "event_type", "grp", "x_pre", "y_post",
          "1", "0")
        .orderBy(col("event_type"))
    }),
    // mutual information event_type × hour-of-day (r11): the
    // information-theoretic strength reading next to dq_chi2 —
    // rounded per-cell terms summed as order-free integers
    "dq_mutual_info" -> ((s, d) =>
      Quality.mutualInformation(
        eventCols(Tables.events(s, d)).withColumn("hod", hour(col("ts"))),
        "event_type", "hod")),
    // per-key OLS trend (r11): slope/intercept/R² from five exact
    // integer sums — the least-squares complement of events_theilsen
    "events_ols_trend" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.olsTrend(grid, "event_type", "hr", "cnt")
        .orderBy(col("event_type"))
    }),
    // seasonal-residual anomalies (r11): decompose, then the robust
    // MAD rule on the ROUNDED residual — "departure from the expected
    // shape", not "the daily peak again"
    "events_stl_anomaly" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.stlAnomaly(grid, "event_type", "hr", "cnt",
          seasonCol = hour(col("hr")), halfWindow = 12)
        .orderBy(col("event_type"), col("hr"))
    }),
    // per-key ACF at lags 1-3 over the hourly-count grid (r11):
    // every statistic an exact integer sum (the OLS discipline), one
    // double division per (key, lag)
    "events_acf" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.acf(grid, "event_type", "hr", "cnt", maxLag = 3)
        .orderBy(col("event_type"), col("lag"))
    }),
    // forecast-accuracy scorecard (r11): MAE/RMSE/sMAPE/MASE for the
    // naive and seasonal-naive baselines over the hourly grid — the
    // Hyndman-Koehler harness a fitted forecaster must beat
    "events_forecast_accuracy" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.forecastAccuracy(grid, "event_type", "hr", "cnt",
          season = 24)
        .orderBy(col("event_type"), col("model"))
    }),
    // M4 downsampling (r11): the hourly grid reduced to 6-hour pixel
    // columns keeping first/last/min/max — the error-free-at-pixel-
    // resolution reduction, one order-free group-by
    "events_m4_downsample" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      Analytics.m4Downsample(grid, "event_type", "hr", "cnt",
          bucketSeconds = 6L * 3600)
        .orderBy(col("event_type"), col("ts"), col("value"))
    }),
    // inter-event burstiness per user (r11): B = (σ−μ)/(σ+μ) over
    // integer-second gaps — bots → −1, Poisson → 0, bursts → 1
    "events_burstiness" -> ((s, d) =>
      Analytics.burstiness(eventCols(Tables.events(s, d)),
          "user_id", "ts")
        .orderBy(col("user_id"))),
    // weekly growth accounting (r11): the new/retained/resurrected/
    // churned ledger + quick ratio — what a bare WAU curve hides
    "events_growth_accounting" -> ((s, d) =>
      Analytics.growthAccounting(eventCols(Tables.events(s, d)),
          "user_id", "ts")
        .orderBy(col("week_start"))),
    // per-user debounce (r11): keep an event only ≥6h after the last
    // KEPT one — a true recurrence on the last survivor (lag() sees
    // dropped rows too), folded in the one-exchange sorted pass
    "events_debounce" -> ((s, d) =>
      operators.Recurrence.debounce(eventCols(Tables.events(s, d)),
          "user_id", "event_id", "ts", gapSeconds = 21600L)
        .orderBy(col("user_id"), col("ts"), col("event_id"))),
    // price-volume-mix revenue bridge (r11): 1997→1998 shipped
    // revenue per brand decomposed into volume/price/cross effects —
    // exact-decimal sums, one double tree per effect
    "revenue_bridge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")).isin(1997, 1998))
        .withColumn("period",
          when(year(col("l_shipdate")) === 1997, 0).otherwise(1))
        .withColumn("rev",
          col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1) - col("l_discount").cast("decimal(12,2)")))
      val withBrand = li.join(
        Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      Analytics.revenueBridge(withBrand, "p_brand", "period",
          "l_quantity", "rev")
        .orderBy(col("p_brand"))
    }),
    // Pettitt change-point test per event_type over the hourly-count
    // series (r11): rank-based U_t is exact integer arithmetic end to
    // end — only the final p-value touches a double
    "events_pettitt" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      operators.Recurrence.pettitt(grid, "event_type", "hr", "cnt")
        .orderBy(col("event_type"))
    }),
    // Kaplan-Meier time-to-first-purchase per user-parity cohort
    // (r11): duration = whole hours from a user's first event to
    // their first purchase, administratively CENSORED at the
    // 48-hour horizon — conversions past the window count as
    // at-risk exposure, never as events (the estimator's point)
    "events_survival" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
      val subj = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__first"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__fp"))
        .withColumn("__gap_h",
          (unix_timestamp(col("__fp")) - unix_timestamp(col("__first")))
            .divide(lit(3600)).cast("long"))
        .select(pmod(col("user_id"), lit(2)).as("cohort"),
          when(col("__gap_h") <= 48, col("__gap_h")).otherwise(lit(48L))
            .as("dur"),
          when(col("__gap_h") <= 48, lit(1L)).otherwise(lit(0L))
            .as("converted"))
      operators.Recurrence.kaplanMeier(subj, "cohort", "dur", "converted")
        .orderBy(col("cohort"), col("t_duration"))
    }),
    // Nelson-Aalen cumulative hazard over the SAME cohorts (r11):
    // the additive risk curve — integer risk sets, rounded-6/1e6-
    // scaled d/n increments, integer running sum (no recursion)
    "survival_hazard" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
      val subj = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__first"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__fp"))
        .withColumn("__gap_h",
          (unix_timestamp(col("__fp")) - unix_timestamp(col("__first")))
            .divide(lit(3600)).cast("long"))
        .select(pmod(col("user_id"), lit(2)).as("cohort"),
          when(col("__gap_h") <= 48, col("__gap_h")).otherwise(lit(48L))
            .as("dur"),
          when(col("__gap_h") <= 48, lit(1L)).otherwise(lit(0L))
            .as("converted"))
      operators.Recurrence.nelsonAalen(subj, "cohort", "dur", "converted")
        .orderBy(col("cohort"), col("t_duration"))
    }),
    // funnel step latency (r11): seconds between the funnel chain's
    // first-qualifying events per consecutive step pair — exact µs
    // gaps, double-tree mean, exact interpolated p50
    "events_funnel_latency" -> ((s, d) =>
      Analytics.funnelLatency(Tables.events(s, d), "user_id",
          "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("step_from"))),
    // log-rank test over the SAME two survival cohorts (r11): is the
    // parity split's time-to-purchase difference real? — exact
    // integer risk sets, rounded-6/1e6-scaled per-time E/V terms
    // summed order-free, one double tree for z/χ²
    "survival_logrank" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
      val subj = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__first"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__fp"))
        .withColumn("__gap_h",
          (unix_timestamp(col("__fp")) - unix_timestamp(col("__first")))
            .divide(lit(3600)).cast("long"))
        .select(pmod(col("user_id"), lit(2)).cast("string").as("cohort"),
          when(col("__gap_h") <= 48, col("__gap_h")).otherwise(lit(48L))
            .as("dur"),
          when(col("__gap_h") <= 48, lit(1L)).otherwise(lit(0L))
            .as("converted"))
      operators.Recurrence.logRank(subj, "cohort", "dur", "converted",
        "1", "0")
    }),
    // Theil-Sen robust trend per user (r9-cont): median of pairwise
    // slopes over the maxPoints most-recent points — the hard
    // per-key fan-out cap is part of the graded semantics
    "events_theilsen" -> ((s, d) =>
      Analytics.theilSenTrend(eventCols(Tables.events(s, d)),
          "user_id", "event_id", "ts", "value", maxPoints = 200)
        .orderBy(col("user_id"))),
    // dbt delete+insert incremental materialization, end to end: a
    // day-1 load, then a day-2 pass whose watermark delta carries
    // LATE UPDATES of already-loaded keys (%97 keys bumped +30d with
    // changed values) — stale versions must vanish, not duplicate
    "incr_model_delete_insert" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_incr_di")
      val tgt = s"$base/t"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      graft.pipeline.IncrementalModel.runDeleteInsert(s,
        ev.filter(col("ts") <= cutoff), tgt, "ts", Seq("event_id"))
      val upd = col("event_id") % 97 === 0
      val src = ev.select(col("user_id"), col("event_id"),
        when(upd, col("ts") + expr("INTERVAL 30 DAYS")).otherwise(col("ts")).as("ts"),
        col("event_type"),
        when(upd, col("value") + 1000.0).otherwise(col("value")).as("value"))
      graft.pipeline.IncrementalModel.runDeleteInsert(s, src, tgt, "ts",
        Seq("event_id"))
      s.read.parquet(tgt)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),
    // Jensen-Shannon categorical drift on event_type (ref = events
    // off the %5 slice, cur = on it — the dq_drift_psi split),
    // Laplace-smoothed over the union domain
    "dq_drift_js" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
      Quality.jsDrift(
          ev.filter(col("event_id") % 5 =!= 0),
          ev.filter(col("event_id") % 5 === 0), "event_type")
        .orderBy(col("category"))
    }),
    // key-skew screen on a join key: top-k heavy keys with share and
    // cumulative share — one grouped count + bounded TakeOrdered +
    // k-row window (measure-before-salting, the Skew companion)
    "dq_key_skew" -> ((s, d) =>
      Quality.keySkew(Tables.lineitem(s, d).select(col("l_suppkey")),
          "l_suppkey", topK = 50)
        .orderBy(col("rank"))),
    // frequent ORDERED event-type sequences (subsequence containment,
    // any gap): occurrence-statistics tests, |types|²-bounded fan-out,
    // Apriori-pruned broadcast triples
    "events_frequent_seqs" -> ((s, d) =>
      Analytics.frequentSequences(eventCols(Tables.events(s, d)),
          "user_id", "event_type", "ts", "event_id", minSupportFrac = 0.2)
        .orderBy(col("len"), col("p1"), col("p2"), col("p3"))),
    // incremental COUNT(DISTINCT) maintenance: distinct-pair state
    // folded with the delta must equal the full distinct recompute
    "mv_incremental_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"))
      val cut = lit(8000L)
      val st = IncrementalAgg.initDistinct(
        ev.filter(col("event_id") < cut), Seq("event_type"), "user_id")
      IncrementalAgg.finalizeDistinct(
          IncrementalAgg.maintainDistinct(st, ev.filter(col("event_id") >= cut),
            Seq("event_type"), "user_id"),
          Seq("event_type"), "user_id")
        .orderBy(col("event_type"))
    }),
    // r8 wave 5: the HLL-sketch twin of mv_incremental_distinct — the
    // stated 100 TB fallback when even the distinct pair set is too
    // hot. Rows-only BY DESIGN (the sketch binary and its estimate
    // aren't DuckDB-portable); the fold ≡ one-shot-sketch equality and
    // the 5%-of-exact bracket are pinned in W5OpsSpec.
    "mv_incremental_distinct_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"))
      val cut = lit(8000L)
      val st = IncrementalAgg.initDistinctSketch(
        ev.filter(col("event_id") < cut), Seq("event_type"), "user_id")
      IncrementalAgg.finalizeDistinctSketch(
          IncrementalAgg.maintainDistinctSketch(st,
            ev.filter(col("event_id") >= cut), Seq("event_type"), "user_id"),
          Seq("event_type"))
        .orderBy(col("event_type"))
    }),
    // transparent MV QUERY-REWRITE graded end-to-end: a copy of the
    // events fact gets an IncrementalAgg state + MvCatalog
    // registration; the query is the PLAIN aggregate over the fact —
    // MvRewrite must answer it from the state (asserted eagerly on
    // the optimized plan, so the entry FAILS rather than silently
    // grading the unrewritten scan), and the answer must equal the
    // DuckDB recompute over the original events table. Exercises the
    // subset-grain path (state at (user_id, event_type), query at
    // event_type) plus a group-key filter.
    "mv_rewrite" -> ((s, d) => {
      import graft.plans.{MvCatalog, MvRewrite}
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      val base = graft.TempDirs.create("graft_mvrw_")
      val factPath = s"$base/fact"; val statePath = s"$base/state"
      val keys = Seq("user_id", "event_type")
      Tables.events(s, d).select(col("user_id"), col("event_type"), col("value"))
        .write.parquet(factPath)
      IncrementalAgg.init(s.read.parquet(factPath), keys, "value")
        .write.parquet(statePath)
      MvCatalog.register(s,
        MvCatalog.MvDef(factPath, keys, "value", statePath))
      val df = s.read.parquet(factPath)
        .filter(col("event_type") =!= lit("__none__"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value").cast("decimal(18,6)")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .withColumn("sum_value", col("sum_value").cast("double"))
        .orderBy(col("event_type"))
      // non-vacuous: the optimized plan must read the STATE, not the
      // fact — a rewrite that fails to fire fails the graded entry
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r
      }.flatMap(_.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty
      })
      require(scans.exists(_.contains("/state")) && !scans.exists(_.contains("/fact")),
        s"MvRewrite did not fire: scans=$scans " +
          s"(enabled=${s.conf.get(MvRewrite.EnabledConf, "true")})")
      df
    }),
    // streaming versioned MV graded batch-side (§2.6): two
    // microbatches fold into the Versioned aggregate state, one
    // atomic version each; the final finalized read must equal the
    // batch mv_incremental oracle (decimal partials make the fold
    // arithmetic exact)
    "stream_mv_versioned" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_mv")
      val inDir = s"$base/in"; val root = s"$base/state"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
        .select(col("user_id"), col("event_type"), col("value"), col("ts"))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).drop("ts").write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.maintainAggVersioned(
          s.readStream.schema(s.read.parquet(inDir).schema).parquet(inDir),
          root, ckpt, Seq("user_id", "event_type"), "value")
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).drop("ts")
            .write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      IncrementalAgg.finalize(graft.sources.Versioned.read(s, root))
        .select(col("user_id"), col("event_type"), col("n_rows"),
          col("sum_value"), col("min_value"), col("max_value"), col("avg_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),
    // streaming unbounded EWMA graded batch-side (§2.6): the true
    // recurrence no batch window computes, replayed bit-exact by a
    // recursive CTE (α = 0.5 → every step is one exact scale + one
    // identically-ordered add)
    // streaming debounce graded batch-side (r11, §2.6): the
    // last-survivor clock carries across the cutoff-split
    // microbatches; sink ≡ batch Recurrence.debounce row-for-row,
    // so it shares events_debounce's recursive-CTE oracle
    // streaming funnel graded batch-side (r11, §2.6): two microbatches
    // split at the cutoff; per-user (stage, t_first, t_last) state
    // must carry across the boundary (a user's view can land in batch
    // 1 and the click completing the chain in batch 2); the sink's
    // max-version row per user is the current view and must equal the
    // batch fold — the oracle is events_funnel's, verbatim
    "stream_funnel" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_fn")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.funnel(
            graft.streaming.EventStream.read(s, inDir),
            Seq("view", "click", "purchase"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      val out = s.read.parquet(outDir)
      val mx = out.groupBy(col("user_id")).agg(max(col("version")).as("version"))
      out.join(mx, Seq("user_id", "version"))
        .select(col("user_id"), col("stage"), col("t_first"), col("t_last"))
        .orderBy(col("user_id"))
    }),
    "stream_debounce" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_db")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.debounce(
            graft.streaming.EventStream.read(s, inDir),
            gapSeconds = 21600L)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),
    "stream_ewma" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_ew")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.ewma(
            graft.streaming.EventStream.read(s, inDir), alpha = 0.5)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"), col("ewma"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // streaming Holt smoothing graded batch-side (r9-cont, §2.6):
    // level/trend state carries across the cutoff-split microbatches;
    // sink must equal batch Recurrence.holtWinters bit-for-bit
    "stream_holt_winters" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_hw")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.holtWinters(
            graft.streaming.EventStream.read(s, inDir))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          col("level"), col("trend"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // streaming SEASONAL Holt-Winters graded batch-side (r10, §2.6):
    // grid rows stream in two microbatches split at the cutoff (whole
    // buckets only — the grid is built once from all events); level,
    // trend AND the 24-slot seasonal ring must carry across the batch
    // boundary, sink ≡ the batch operator (shared recursive-CTE oracle)
    "stream_holt_winters_seasonal" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_hs")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val grid = ev.groupBy(col("event_type").as("key"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).cast("double").as("x"))
        .withColumn("slot",
          (floor(col("bucket").cast("long") / 3600L) % 24).cast("int"))
        .select(col("key"), col("bucket"), col("x"), col("slot"))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      grid.filter(col("bucket") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(grid.schema).parquet(inDir)
        val q = graft.streaming.EventStream.holtWintersSeasonal(stream, 24)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          grid.filter(col("bucket") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("event_type"), col("bucket"), col("slot"), col("x"),
          col("level"), col("trend"), col("seasonal"))
        .orderBy(col("event_type"), col("bucket"))
    }),
    // streaming CUSUM graded batch-side (r9-cont, §2.6): two
    // microbatches split at the CDC cutoff; the accumulators must
    // carry across the batch boundary and the sink must equal the
    // batch Recurrence.cusum bit-for-bit (shared oracle)
    "stream_cusum" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_cu")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.cusum(
            graft.streaming.EventStream.read(s, inDir),
            target = 100.0, slack = 25.0, h = 200.0)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          col("cusum_pos"), col("cusum_neg"), col("breach"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // streaming last-touch attribution graded batch-side (§2.6): two
    // microbatches split at the CDC cutoff; the final sink must equal
    // the BATCH attribution oracle (state carries the latest touch
    // across the batch boundary)
    "stream_attribution" -> ((s, d) => {
      val base = graft.TempDirs.create("graft_stream_at")
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val ev = eventCols(Tables.events(s, d))
      val cutoff = lit(CdcCutoff).cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      withShufflePartitions(s, 4) {
        val q = graft.streaming.EventStream.attribution(
            graft.streaming.EventStream.read(s, inDir),
            touchTypes = Seq("click", "view"), convType = "purchase")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try {
          q.processAllAvailable() // microbatch 1: ≤ cutoff
          ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
          q.processAllAvailable() // microbatch 2: the rest
        } finally q.stop()
      }
      s.read.parquet(outDir)
        .select(col("user_id"), col("conv_id"), col("conv_ts"),
          col("touch_id"), col("touch_ts"))
        .orderBy(col("conv_id"))
    }),
    // SemDeDup-style semantic near-dup pairs: IVF cells (the graded
    // deterministic first-16 quantizer) + within-cell cosine — the
    // cluster-blocked modality beside the LSH one
    "dedup_semantic" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val cents = embs.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1).toSeq
      Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

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
  private val graphEdgesCte: String =
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
  private def hitsFixedSql(iterations: Int, topK: Int): String = {
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

  private def pageRankFixedSql(iterations: Int): String = {
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
  private def pageRankFixedWeightedSql(iterations: Int): String = {
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
  private def pprFixedSql(iterations: Int): String = {
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
  private def holtWintersSeasonalSql(period: Int): String = {
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
  private def ssspWeightedSql(rounds: Int): String = {
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

  private def bfsDistanceSql(maxHops: Int): String = {
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
  private def textRankSql(iterations: Int, topK: Int): String = {
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

  private def labelPropagationSql(iterations: Int): String = {
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
  private def kCoreSql(k: Int, peels: Int): String = {
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

  private def lshBucketsCte(tables: Int, planes: Int): String = {
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
  private def xxhash64ChainSql(base: String, hashInputs: Seq[String],
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

  private def xxhash64LongSql(base: String, idCol: String, seedLit: Long,
                              keep: Seq[String] = Nil): String =
    xxhash64ChainSql(base, Seq(idCol, seedLit.toString), idCol +: keep)

  /** Single-argument `xxhash64(col)` replay (seed 42, one fold step). */
  private def xxhash64Long1Sql(base: String, idCol: String,
                               keep: Seq[String] = Nil): String =
    xxhash64ChainSql(base, Seq(idCol), idCol +: keep)

  /** `Text.portableHash60` replayed in DuckDB: both engines md5 the
    * same UTF-8 bytes, and the 15-hex-digit slice parses identically.
    */
  private def md5Hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** The md5-twin SimHash pipeline as DuckDB SQL (n=3, hamming ≤ 3,
    * 4×16-bit blocks). `pairWhere` narrows the candidate join.
    */
  private def simhashMd5Sql(pairWhere: String): String =
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
  private val ivfTopkOracleSql: String =
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
  private val knnLabelOracleSql: String =
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
  private def seasonalDecomposeCoreSql: String =
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
  private def sessionsOracleSql: String =
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
  private def phraseSearchOracleSql: String =
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
  private def bm25TopkOracleSql: String = {
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
  private def funnelOracleSql: String =
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

  private def debounceOracleSql: String =
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
  private def ndcgOracleSql: String = {
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

  private def minhashMd5Sql(pairWhere: String): String =
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
  private def gramsSql(n: Int, distinct: Boolean): String = {
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
  private def winnowSql(k: Int, w: Int): String =
    s"""SELECT doc_id,
          list_sort(list_distinct(
            CASE WHEN len(hs) <= $w THEN [list_min(hs)]
            ELSE [list_min(hs[i:i+${w - 1}])
                  for i in range(1, len(hs) - $w + 2)] END)) AS sel
        FROM (
          SELECT doc_id, [${md5Hash60Sql("x")} for x in grams] AS hs
          FROM (${gramsSql(k, distinct = false)}))"""

  def oracleSql: Map[String, String] = {
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

    val base = Map(
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
             count(*) AS count_order
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1999-01-01'
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",

      "q3_shipping_priority" ->
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-01-01'
             AND l_shipdate > TIMESTAMP '1998-01-01'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, o_orderdate, l_orderkey
           LIMIT 10""",

      "q5_regional_revenue" ->
        """SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM customer, orders, lineitem, supplier, nation, region
           WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY n_name
           ORDER BY revenue DESC, n_name""",

      "q10_returned_revenue" ->
        """SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM lineitem, orders, customer, nation
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n_nationkey AND l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1995-10-01'
             AND o_orderdate < TIMESTAMP '1996-01-01'
           GROUP BY c_custkey, c_name, c_acctbal, n_name
           ORDER BY revenue DESC, c_custkey LIMIT 20""",

      "q14_promo_share" ->
        """SELECT round(100.0 *
             CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
               ELSE 0 END) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS promo_share
           FROM lineitem, part
           WHERE l_partkey = p_partkey
             AND l_shipdate >= TIMESTAMP '1995-09-01'
             AND l_shipdate < TIMESTAMP '1995-10-01'""",

      "top_orders_per_cust" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
             FROM orders)
           WHERE rn <= 3 ORDER BY o_custkey, rn""",

      "events_hourly" ->
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // cohort week = week of first event; period = whole weeks since
      // (Monday-aligned in both engines, so days/7 is exact)
      "events_retention" ->
        """WITH first AS (
             SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort_ts
             FROM events GROUP BY user_id
           ), act AS (
             SELECT DISTINCT f.cohort_ts,
               CAST(date_diff('day', CAST(f.cohort_ts AS DATE),
                 CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)) / 7 AS INT)
                 AS period_n,
               e.user_id
             FROM events e JOIN first f USING (user_id))
           SELECT cohort_ts, period_n, count(*) AS n_active
           FROM act GROUP BY 1, 2 ORDER BY 1, 2""",

      // directional rules: same distinct-items self-join, three
      // single divisions of integer counts under round(6)
      "basket_rules" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           ), n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM items
           ), ic AS (
             SELECT l_partkey, count(*) AS c FROM items GROUP BY 1
           ), p AS (
             SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
               count(*) AS n_both
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 4)
           SELECT antecedent, consequent, n_both,
             round(n_both / CAST(nb AS DOUBLE), 6) AS support,
             round(n_both / CAST(ca.c AS DOUBLE), 6) AS confidence,
             round((n_both * CAST(nb AS DOUBLE))
               / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
           FROM p CROSS JOIN n
           JOIN ic ca ON ca.l_partkey = antecedent
           JOIN ic cb ON cb.l_partkey = consequent
           ORDER BY antecedent, consequent""",

      // ntile bands replay (standard SQL distribution), decimal
      // money, recency vs the corpus's own max date
      "customer_rfm" ->
        """WITH pc AS (
             SELECT o_custkey, max(o_orderdate) AS last_o,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
             FROM orders GROUP BY 1
           ), r AS (
             SELECT *, date_diff('day', last_o,
               (SELECT max(last_o) FROM pc)) AS recency_days FROM pc
           ), sc AS (
             SELECT o_custkey, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
             FROM r)
           SELECT o_custkey, recency_days, frequency,
             CAST(monetary AS DOUBLE) AS monetary,
             r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm
           FROM sc ORDER BY o_custkey""",

      "basket_pairs" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2
           ORDER BY part_a, part_b""",

      // centroid-shift replay: WITH ORDINALITY explode, the same
      // r6-scaled integer per-dim sums, n-cancelling cosine tree
      "embedding_centroid_shift" ->
        """WITH e AS (
             SELECT label AS g,
               unnest(generate_series(1, len(embedding))) AS d,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS s
             FROM embeddings
           ), dims AS (
             SELECT g, d, CAST(sum(s) AS HUGEINT) AS sg,
               count(*) AS n
             FROM e GROUP BY 1, 2
           ), gtot AS (
             SELECT d, CAST(sum(sg) AS HUGEINT) AS st FROM dims GROUP BY 1
           ), pg AS (
             SELECT g, CAST(max(n) AS BIGINT) AS n_vectors,
               sum(sg * st) AS dot, sum(sg * sg) AS a2,
               sum(st * st) AS b2
             FROM dims JOIN gtot USING (d) GROUP BY 1)
           SELECT g AS label, n_vectors,
             round(sqrt(CAST(a2 AS DOUBLE)) / CAST(n_vectors AS DOUBLE)
               / 1000000.0, 6) AS centroid_norm,
             round(CASE WHEN a2 > 0 AND b2 > 0 THEN
               CAST(dot AS DOUBLE)
               / (sqrt(CAST(a2 AS DOUBLE)) * sqrt(CAST(b2 AS DOUBLE)))
               END, 6) AS cos_to_global
           FROM pg ORDER BY label""",

      // repurchase-cycle replay: the same (date, key)-ordered lag
      // recurrence, integer day gaps, quantile_cont percentiles
      "repurchase_cycle" ->
        """WITH g AS (
             SELECT o_custkey,
               date_diff('day',
                 CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap
             FROM orders
           ), j AS (
             SELECT c_mktsegment, gap
             FROM g JOIN customer ON o_custkey = c_custkey
             WHERE gap IS NOT NULL)
           SELECT c_mktsegment, count(*) AS n_gaps,
             round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS mean_days,
             quantile_cont(gap, 0.5) AS p50_days,
             quantile_cont(gap, 0.9) AS p90_days
           FROM j GROUP BY 1 ORDER BY c_mktsegment""",

      // share-of-parent replay: exact decimal level re-aggregations,
      // two round-6 divisions per leaf row
      "rollup_share" ->
        """WITH leaf AS (
             SELECT r_name, n_name,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS v
             FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1, 2
           ), p AS (SELECT r_name, sum(v) AS pv FROM leaf GROUP BY 1
           ), t AS (SELECT sum(pv) AS tv FROM p)
           SELECT leaf.r_name, n_name, CAST(v AS DOUBLE) AS value,
             round(CAST(v AS DOUBLE) / CAST(pv AS DOUBLE), 6)
               AS share_of_parent,
             round(CAST(pv AS DOUBLE) / CAST(tv AS DOUBLE), 6)
               AS parent_share_of_total
           FROM leaf JOIN p USING (r_name) CROSS JOIN t
           ORDER BY r_name, n_name""",

      // new-vs-returning replay: integer month indexes, first-month
      // classification, exact decimal revenue, one share division
      "revenue_new_vs_returning" ->
        """WITH b AS (
             SELECT o_custkey AS c,
               (year(CAST(o_orderdate AS TIMESTAMP)) - 1970) * 12
                 + month(CAST(o_orderdate AS TIMESTAMP)) - 1 AS m,
               CAST(o_totalprice AS DECIMAL(12,2)) AS amt
             FROM orders
           ), f AS (SELECT c, min(m) AS fm FROM b GROUP BY 1
           ), j AS (
             SELECT b.m, b.c, b.amt, b.m = f.fm AS isn
             FROM b JOIN f USING (c)
           ), a AS (
             SELECT m,
               sum(CASE WHEN isn THEN amt
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS rn,
               sum(CASE WHEN NOT isn THEN amt
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS rr,
               count(DISTINCT CASE WHEN isn THEN c END) AS nn,
               count(DISTINCT CASE WHEN NOT isn THEN c END) AS nr
             FROM j GROUP BY 1)
           SELECT CAST(DATE '1970-01-01' + CAST(m AS INT)
               * INTERVAL 1 MONTH AS TIMESTAMP) AS month_start,
             CAST(rn AS DOUBLE) AS rev_new,
             CAST(rr AS DOUBLE) AS rev_returning,
             CAST(nn AS BIGINT) AS n_new_customers,
             CAST(nr AS BIGINT) AS n_returning_customers,
             round(CASE WHEN rn + rr > 0 THEN
               CAST(rn AS DOUBLE) / CAST(rn + rr AS DOUBLE) END, 6)
               AS new_rev_share
           FROM a ORDER BY month_start""",

      // cycle-SLA replay: integer day diffs, quantile_cont p50/p90,
      // one round-6 division each for share and mean
      "fulfillment_cycle_sla" ->
        """WITH li AS (
             SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE),
                 CAST(l_shipdate AS DATE)) AS days
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
           SELECT o_orderpriority, count(*) AS n_lines,
             round(CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS late_share,
             round(CAST(sum(days) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_days,
             quantile_cont(days, 0.5) AS p50_days,
             quantile_cont(days, 0.9) AS p90_days
           FROM li GROUP BY 1 ORDER BY o_orderpriority""",

      // elasticity replay: r6-scaled monthly ln(price)/ln(qty) longs,
      // exact HUGEINT OLS sums, scale cancels in slope and R²
      "price_elasticity" ->
        """WITH m AS (
             SELECT p_brand,
               date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS mo,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS q,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2
             HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 0
               AND sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
           ), s AS (
             SELECT p_brand,
               CAST(round(ln(CAST(r AS DOUBLE) / CAST(q AS DOUBLE))
                 * 1000000.0) AS HUGEINT) AS x,
               CAST(round(ln(CAST(q AS DOUBLE)) * 1000000.0) AS HUGEINT)
                 AS y
             FROM m
           ), a AS (
             SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             FROM s GROUP BY 1 HAVING count(*) >= 3
           ), e AS (
             SELECT p_brand, n,
               CAST(n AS HUGEINT) * sxy - sx * sy AS num,
               CAST(n AS HUGEINT) * sxx - sx * sx AS denx,
               CAST(n AS HUGEINT) * syy - sy * sy AS deny
             FROM a)
           SELECT p_brand, CAST(n AS BIGINT) AS n_months,
             round(CASE WHEN denx > 0 THEN
               CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END, 6)
               AS elasticity,
             round(CASE WHEN denx > 0 AND deny > 0 THEN
               CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS r2
           FROM e ORDER BY p_brand""",

      // cosine replay: same pairs, item frequencies, one
      // sqrt+division tree round-6, rank after the top-k cut
      "basket_cosine" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           ), freq AS (
             SELECT l_partkey, count(*) AS n FROM items GROUP BY 1
           ), pairs AS (
             SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2
           ), sc AS (
             SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders,
               round(CAST(n_orders AS DOUBLE)
                 / sqrt(CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6)
                 AS cosine
             FROM pairs
             JOIN freq fa ON fa.l_partkey = part_a
             JOIN freq fb ON fb.l_partkey = part_b)
           SELECT part_a, part_b, n_orders, cosine, CAST(rank AS INT) AS rank
           FROM (SELECT *, row_number()
               OVER (ORDER BY cosine DESC, part_a, part_b) AS rank FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      // per-start chains: for every step-1 start t0, the windowed
      // recurrence tᵢ = min{ts of step i | tᵢ₋₁ < ts ≤ t0 + W};
      // the user keeps the deepest stage, earliest start on ties
      "events_funnel_windowed" ->
        """WITH f AS (
             SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type IN ('view', 'click', 'purchase')
           ), s0 AS (
             SELECT user_id, ts AS t0,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
             FROM f WHERE event_type = 'view'
           ), s0k AS (SELECT user_id, t0 FROM s0 WHERE rn <= 64
           ), c2 AS (
             SELECT s.user_id, s.t0, min(f.ts) AS t2
             FROM s0k s JOIN f ON f.user_id = s.user_id
             WHERE f.event_type = 'click' AND f.ts > s.t0
               AND f.ts <= s.t0 + INTERVAL 3600 SECONDS
             GROUP BY s.user_id, s.t0
           ), c3 AS (
             SELECT c.user_id, c.t0, min(f.ts) AS t3
             FROM c2 c JOIN f ON f.user_id = c.user_id
             WHERE f.event_type = 'purchase' AND f.ts > c.t2
               AND f.ts <= c.t0 + INTERVAL 3600 SECONDS
             GROUP BY c.user_id, c.t0, c.t2
           ), st AS (
             SELECT s.user_id, s.t0,
               CASE WHEN c3.t3 IS NOT NULL THEN 3
                    WHEN c2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
               coalesce(c3.t3, c2.t2, s.t0) AS t_end
             FROM s0k s
               LEFT JOIN c2 ON c2.user_id = s.user_id AND c2.t0 = s.t0
               LEFT JOIN c3 ON c3.user_id = s.user_id AND c3.t0 = s.t0
           ), best AS (
             SELECT user_id, stage, t0 AS t_first, t_end AS t_last,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY stage DESC, t0 ASC) AS rk
             FROM st
           ), u AS (SELECT DISTINCT user_id FROM f)
           SELECT u.user_id, coalesce(b.stage, 0) AS stage,
             b.t_first, b.t_last
           FROM u LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (user_id)
           ORDER BY u.user_id""",

      // the funnel fold ≡ the earliest-completion recurrence
      // tᵢ = min{ts of step i | ts > tᵢ₋₁}, expressed as k min-joins
      "events_funnel" -> funnelOracleSql,
      // the streaming twin's max-version view ≡ the batch fold —
      // the oracle is events_funnel's own, verbatim
      "stream_funnel" -> funnelOracleSql,

      "events_sessions" -> sessionsOracleSql,
      // the incremental fold must equal the full resessionization —
      // the oracle is events_sessions' own, verbatim
      "events_sessions_incr" -> sessionsOracleSql,

      // entry/exit replay: the same session numbering, endpoints via
      // (ts, id)-ordered row_numbers in each direction
      "sessions_entry_exit" ->
        """WITH flagged AS (
             SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
                   CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           ), numbered AS (
             SELECT user_id, event_id, event_type, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS session_seq
             FROM flagged
           ), ranked AS (
             SELECT *,
               row_number() OVER (PARTITION BY user_id, session_seq
                 ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, session_seq
                 ORDER BY ts DESC, event_id DESC) AS rn_d,
               count(*) OVER (PARTITION BY user_id, session_seq)
                 AS n_events
             FROM numbered)
           SELECT en.user_id, en.session_seq,
             en.ts AS session_start, ex.ts AS session_end,
             date_diff('second', en.ts, ex.ts) AS duration_sec,
             CAST(en.n_events AS BIGINT) AS n_events,
             en.event_type AS entry_type, ex.event_type AS exit_type,
             en.n_events = 1 AS is_bounce
           FROM ranked en JOIN ranked ex
             ON en.user_id = ex.user_id AND en.session_seq = ex.session_seq
           WHERE en.rn_a = 1 AND ex.rn_d = 1
           ORDER BY en.user_id, en.session_seq""",

      // concurrency replay: the same sessions swept as +1/−(end+1)
      // deltas per (bucket, sec), grid carry via one window over the
      // bucket grid, within-bucket peak = carry + max(cum) (count
      // AFTER the second's removals — r11 ADVICE fix); the carry
      // plateau counts only when the first marker is past bucket start
      "sessions_concurrency" ->
        """WITH flagged AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
                   CAST(ts AS TIMESTAMP)) > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), numbered AS (
             SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged
           ), sess AS (
             SELECT date_diff('second', TIMESTAMP '1970-01-01', min(ts))
                 AS st,
               date_diff('second', TIMESTAMP '1970-01-01', max(ts)) AS en
             FROM numbered GROUP BY user_id, session_seq
           ), del AS (
             SELECT st AS sec, 1 AS d FROM sess
             UNION ALL SELECT en + 1, -1 FROM sess
           ), agg AS (
             SELECT sec - sec % 3600 AS bucket, sec,
               CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
                 AS pos,
               CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT)
                 AS neg
             FROM del GROUP BY 1, 2
           ), pb AS (
             SELECT bucket, CAST(sum(pos) AS BIGINT) AS n_started,
               CAST(max(cum) AS BIGINT) AS peak_off,
               CAST(sum(pos - neg) AS BIGINT) AS net,
               min(sec) AS first_sec
             FROM (SELECT *, sum(pos - neg) OVER (PARTITION BY bucket
                 ORDER BY sec ROWS UNBOUNDED PRECEDING) AS cum
               FROM agg)
             GROUP BY 1
           ), en2 AS (
             SELECT en - en % 3600 AS bucket, count(*) AS n_ended
             FROM sess GROUP BY 1
           ), grid AS (
             SELECT unnest(generate_series(
               (SELECT min(bucket) FROM pb),
               (SELECT max(bucket) FROM pb), 3600)) AS bucket
           ), j AS (
             SELECT g.bucket, coalesce(pb.n_started, 0) AS n_started,
               coalesce(pb.peak_off, 0) AS peak_off,
               coalesce(pb.net, 0) AS net,
               pb.first_sec AS first_sec,
               coalesce(en2.n_ended, 0) AS n_ended
             FROM grid g LEFT JOIN pb USING (bucket)
               LEFT JOIN en2 USING (bucket)
           ), c AS (
             SELECT *, CAST(sum(net) OVER (ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) - net AS BIGINT) AS carry
             FROM j)
           SELECT TIMESTAMP '1970-01-01' + bucket * INTERVAL 1 SECOND
               AS bucket_ts,
             carry AS carry_in,
             CASE WHEN first_sec IS NULL THEN carry
               WHEN first_sec > bucket
                 THEN greatest(carry, carry + peak_off)
               ELSE carry + peak_off END AS peak,
             CAST(n_started AS BIGINT) AS n_started,
             CAST(n_ended AS BIGINT) AS n_ended
           FROM c ORDER BY bucket_ts""",

      // date-spine replay: integer epoch-day arithmetic for iso_dow /
      // week_index (engine dayofweek conventions diverge), d+1 month
      // test for month-end
      "dim_date_spine" ->
        """WITH b AS (
             SELECT min(CAST(o_orderdate AS DATE)) AS lo,
               max(CAST(o_orderdate AS DATE)) AS hi
             FROM orders
           ), d AS (
             SELECT lo + CAST(unnest(generate_series(0,
               date_diff('day', lo, hi))) AS INT) AS d
             FROM b)
           SELECT CAST(d AS TIMESTAMP) AS day_ts,
             year(d) * 10000 + month(d) * 100 + day(d) AS date_key,
             year(d) AS year, quarter(d) AS quarter, month(d) AS month,
             day(d) AS day_of_month,
             (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1
               AS iso_dow,
             (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 >= 6
               AS is_weekend,
             month(d + 1) <> month(d) AS is_month_end,
             date_diff('day', DATE '1970-01-05',
               CAST(date_trunc('week', CAST(d AS TIMESTAMP)) AS DATE))
               // 7 AS week_index
           FROM d ORDER BY day_ts""",

      // definitional inequality overlap join over the same
      // session-building SQL as events_sessions (DuckDB IEJoin)
      "sessions_overlap" ->
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
             FROM flagged
           ), sess AS (
             SELECT user_id, session_seq, min(ts) AS lo, max(ts) AS hi
             FROM numbered GROUP BY user_id, session_seq)
           SELECT a.user_id AS a_user_id, a.session_seq AS a_session_seq,
             b.user_id AS b_user_id, b.session_seq AS b_session_seq
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
           ORDER BY 1, 2, 3, 4""",

      "q18_large_orders" ->
        """SELECT c_name, o_custkey AS customer_id, o_orderkey AS order_id,
             o_orderdate AS order_date, o_totalprice AS total_price,
             CAST(total_qty AS DOUBLE) AS total_qty
           FROM orders
           JOIN (SELECT l_orderkey,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
                 FROM lineitem GROUP BY 1 HAVING total_qty > 250) big
             ON o_orderkey = big.l_orderkey
           JOIN customer ON o_custkey = c_custkey
           ORDER BY order_id""",

      "q13_custdist" ->
        """SELECT c_count, count(*) AS custdist FROM (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority NOT LIKE '1%'
             GROUP BY c_custkey)
           GROUP BY c_count
           ORDER BY custdist DESC, c_count DESC""",

      "events_rolling" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value
           FROM events ORDER BY user_id, ts, event_id""",

      "asof_last_view" ->
        """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             v.event_id AS view_event_id, CAST(v.ts AS TIMESTAMP) AS view_ts
           FROM (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
             ON p.user_id = v.user_id AND p.ts >= v.ts
           ORDER BY p.event_id""",

      "asof_last_view_tol" ->
        """SELECT event_id, user_id, ts,
             CASE WHEN ts - view_ts <= INTERVAL 1 HOUR THEN view_event_id END
               AS view_event_id,
             CASE WHEN ts - view_ts <= INTERVAL 1 HOUR THEN view_ts END
               AS view_ts
           FROM (
             SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               v.event_id AS view_event_id, CAST(v.ts AS TIMESTAMP) AS view_ts
             FROM (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase') p
             ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'view') v
               ON p.user_id = v.user_id AND p.ts >= v.ts)
           ORDER BY event_id""",

      "asof_next_error" ->
        """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             e.event_id AS err_event_id, CAST(e.ts AS TIMESTAMP) AS err_ts
           FROM (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'error') e
             ON p.user_id = e.user_id AND p.ts <= e.ts
           ORDER BY p.event_id""",

      "range_join_sessions" ->
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
             FROM flagged
           ), sessions AS (
             SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end
             FROM numbered GROUP BY user_id, session_seq)
           SELECT e.user_id, s.session_seq, count(*) AS n_in_session
           FROM events e JOIN sessions s
             ON e.user_id = s.user_id
            AND CAST(e.ts AS TIMESTAMP) BETWEEN s.session_start AND s.session_end
           GROUP BY e.user_id, s.session_seq
           ORDER BY e.user_id, s.session_seq""",

      "band_join_price" ->
        """SELECT price_tier, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           FROM orders
           JOIN (VALUES ('tier_0_100k', 0, 100000),
                        ('tier_100_200k', 100000, 200000),
                        ('tier_200_300k', 200000, 300000),
                        ('tier_300k_plus', 300000, 1000000000000000)) b(price_tier, lo, hi)
             ON o_totalprice >= lo AND o_totalprice < hi
           GROUP BY price_tier ORDER BY price_tier""",

      "q4_returned_priority" ->
        """SELECT o_orderpriority, count(*) AS n_orders
           FROM orders
           WHERE EXISTS (SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      // definitional EXISTS/NOT-EXISTS form — the gate proves the
      // Spark side's single-aggregate rewrite (Analytics.scala)
      "q21_waiting_supplier" ->
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
           FROM supplier, lineitem l1, orders
           WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             AND o_orderstatus = 'F'
             AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             AND EXISTS (SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey
                 AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
               JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
               WHERE l3.l_orderkey = l1.l_orderkey
                 AND l3.l_suppkey <> l1.l_suppkey
                 AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
           GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",

      "q6_forecast_revenue" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
             AND l_quantity < 24""",

      "q7_volume_shipping" ->
        """SELECT supp_nation, cust_nation, l_year, CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01')
           GROUP BY supp_nation, cust_nation, l_year
           ORDER BY supp_nation, cust_nation, l_year""",

      "q8_market_share" ->
        """SELECT o_year, round(
             CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
             CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
           FROM (
             SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev,
               n2.n_name AS supp_nation
             FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
               AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
               AND o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'
               AND p_type = 'STANDARD')
           GROUP BY o_year ORDER BY o_year""",

      // adapted cost = 0.5 * retail per unit (no partsupp in the
      // schema) — stated in the operator doc, replayed here
      "q9_product_profit" ->
        """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
           FROM (
             SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * 0.5 AS amount
             FROM part, supplier, lineitem, orders, nation
             WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%red%')
           GROUP BY nation, o_year ORDER BY nation, o_year DESC""",

      // multiplicative fraction test (value*1000 > total): no engine
      // divides, so the threshold boundary is exact on both sides
      "q11_important_parts" ->
        """SELECT l_partkey, CAST(value_d AS DOUBLE) AS value FROM (
             SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS value_d
             FROM lineitem, supplier, nation, region
             WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
               AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
             GROUP BY l_partkey
             HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 1000 > (
               SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
               FROM lineitem, supplier, nation, region
               WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                 AND n_regionkey = r_regionkey AND r_name = 'EUROPE'))
           ORDER BY value DESC, l_partkey""",

      "q12_late_priority" ->
        """SELECT l_linestatus,
             CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS BIGINT) AS high_line_count,
             CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS BIGINT) AS low_line_count
           FROM orders, lineitem
           WHERE o_orderkey = l_orderkey
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_shipdate > o_orderdate + INTERVAL 30 DAY
           GROUP BY l_linestatus ORDER BY l_linestatus""",

      // scalar-max subquery; revenue stays decimal through the
      // equality so ties match exactly
      "q15_top_supplier" ->
        """WITH rev AS (
             SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_d
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey)
           SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_revenue
           FROM supplier, rev
           WHERE s_suppkey = l_suppkey AND total_d = (SELECT max(total_d) FROM rev)
           ORDER BY s_suppkey""",

      "q16_supplier_counts" ->
        """SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           FROM lineitem, part
           WHERE l_partkey = p_partkey
             AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
           GROUP BY p_brand, p_type, p_size
           ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

      // correlated form stated verbatim, multiplicatively (2*qty*cnt
      // < sum ⟺ qty < 0.5*avg) — the gate proves the decorrelation
      "q17_small_qty_revenue" ->
        """SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
           FROM lineitem l, part
           WHERE p_partkey = l.l_partkey
             AND p_brand = 'Brand#2' AND p_type = 'ECONOMY'
             AND CAST(l.l_quantity AS DECIMAL(12,2)) * 2 *
                 (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
               < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(12,2)))
                  FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)""",

      "q19_banded_revenue" ->
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM lineitem, part
           WHERE p_partkey = l_partkey AND (
             (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20) OR
             (p_brand = 'Brand#15' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30) OR
             (p_brand = 'Brand#25' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40))""",

      // nested-IN form stated verbatim
      "q20_excess_shippers" ->
        """SELECT s_name, s_acctbal FROM supplier, nation, region
           WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'EUROPE'
             AND s_suppkey IN (
               SELECT l_suppkey FROM lineitem
               WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1997-01-01'
               GROUP BY l_partkey, l_suppkey
               HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 60)
           ORDER BY s_name""",

      // correlated-min form stated verbatim; "offer" = the supplier's
      // min line price for the part (no partsupp in the schema)
      "q2_min_cost_supplier" ->
        """WITH offers AS (
             SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
               min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
             FROM lineitem, part, supplier, nation, region
             WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
               AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
               AND r_name = 'EUROPE' AND p_type = 'LARGE'
               AND p_size BETWEEN 10 AND 15
             GROUP BY l_partkey, s_suppkey, s_name, s_acctbal, n_name)
           SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
             CAST(cost_d AS DOUBLE) AS cost
           FROM offers o
           WHERE cost_d = (SELECT min(cost_d) FROM offers o2
                           WHERE o2.l_partkey = o.l_partkey)
           ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""",

      "cube_revenue" ->
        """SELECT n_name, order_year,
             CAST(GROUPING(n_name, order_year) AS BIGINT) AS gid,
             CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n_name, year(o_orderdate) AS order_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey)
           GROUP BY CUBE (n_name, order_year)
           ORDER BY gid, n_name NULLS FIRST, order_year NULLS FIRST""",

      // spine = per-type generate_series over observed hour bounds;
      // forward fill = last_value IGNORE NULLS — states the Spark
      // computation verbatim
      "events_gapfill" ->
        """WITH h AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
               count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS sv
             FROM events GROUP BY 1, 2
           ), spine AS (
             SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
             FROM (SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
                   FROM h GROUP BY event_type)
           ), j AS (
             SELECT s.event_type, s.hour_ts, h.n, h.sv
             FROM spine s LEFT JOIN h
               ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts)
           SELECT event_type, hour_ts,
             coalesce(n, 0) AS n_events,
             CAST(last_value(sv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS filled_value
           FROM j ORDER BY event_type, hour_ts""",

      // r8 wave 5: linear interpolation — the prev/next observation
      // carry and the straight-line arithmetic stated verbatim
      // (epoch-second abscissa; IEEE double sub/div/mul/add in the
      // same order → bit-identical)
      "events_interpolate" ->
        """WITH h AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2
           ), spine AS (
             SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
             FROM (SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
                   FROM h GROUP BY event_type)
           ), j AS (
             SELECT s.event_type, s.hour_ts, h.v,
               CAST(epoch(s.hour_ts) AS BIGINT) AS hh
             FROM spine s LEFT JOIN h
               ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
           ), c AS (
             SELECT event_type, hour_ts, v, hh,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wn AS nh
             FROM j
             WINDOW wp AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           SELECT event_type, hour_ts,
             v IS NOT NULL AS observed,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) *
                    (CAST(hh - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
             END AS filled_value
           FROM c ORDER BY event_type, hour_ts""",

      // r8 wave 5: DAU + trailing-7d distinct actives — the bounded
      // 7x explode of the distinct user-day frame, replayed via a
      // 0..6 offset cross join
      "events_active_users" ->
        """WITH ud AS (
             SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
             FROM events
           ), dau AS (
             SELECT day, count(*) AS dau FROM ud GROUP BY 1
           ), covered AS (
             SELECT DISTINCT d2 AS day, user_id FROM (
               SELECT unnest(generate_series(ud.day, ud.day + INTERVAL 6 DAY,
                 INTERVAL 1 DAY)) AS d2, ud.user_id
               FROM ud)
           ), roll AS (
             SELECT day, count(*) AS rolling_actives FROM covered GROUP BY 1)
           SELECT d.day, d.dau, r.rolling_actives
           FROM dau d LEFT JOIN roll r ON d.day = r.day
           ORDER BY d.day""",

      // r8 wave 5: top event-type trigram paths — the lead() chain
      // replayed, (n desc, path) tie-break pins the cut
      "events_top_paths" ->
        """WITH t AS (
             SELECT event_type AS t0,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
           FROM t
           WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
           GROUP BY 1 ORDER BY n DESC, path LIMIT 25""",

      // r8 wave 5: interval-union coverage islands — running-max
      // island detection replayed over the same (lo, hi) sort
      "sessions_coverage" ->
        """WITH iv AS (
             SELECT event_type, CAST(ts AS TIMESTAMP) AS lo,
               CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS hi
             FROM events
           ), m AS (
             SELECT event_type, lo, hi,
               max(hi) OVER (PARTITION BY event_type ORDER BY lo, hi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             FROM iv WHERE hi >= lo
           ), fl AS (
             SELECT event_type, lo, hi,
               CASE WHEN pm IS NULL OR lo > pm THEN 1 ELSE 0 END AS ni
             FROM m
           ), num AS (
             SELECT event_type, lo, hi,
               CAST(sum(ni) OVER (PARTITION BY event_type ORDER BY lo, hi
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_seq
             FROM fl)
           SELECT event_type, island_seq,
             min(lo) AS island_start, max(hi) AS island_end,
             count(*) AS n_intervals,
             date_diff('second', min(lo), max(hi)) AS covered_sec
           FROM num GROUP BY 1, 2 ORDER BY 1, 2""",

      // r8 wave 5: MERGE INTO — the definitional FULL OUTER JOIN +
      // ordered CASE form (DuckDB 1.0 has no MERGE statement); clause
      // order and 3-valued condition guards stated verbatim
      "merge_into" ->
        """WITH t AS (
             SELECT * FROM orders WHERE o_orderkey % 3 <> 0
           ), s AS (
             SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice,
               o_orderdate, o_orderpriority
             FROM orders WHERE o_orderkey % 2 = 0
           ), j AS (
             SELECT t.o_orderkey AS tk, t.o_custkey AS tc,
               t.o_orderstatus AS tst, t.o_totalprice AS tp,
               t.o_orderdate AS td, t.o_orderpriority AS tpr,
               s.o_orderkey AS sk, s.o_custkey AS sc,
               s.o_orderstatus AS sst, s.o_totalprice AS sp,
               s.o_orderdate AS sd, s.o_orderpriority AS spr
             FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
           ), f AS (
             SELECT *,
               (tk IS NOT NULL AND sk IS NOT NULL) AS matched,
               (tk IS NULL AND sk IS NOT NULL) AS s_only,
               (tk IS NOT NULL AND sk IS NULL) AS t_only
             FROM j
           ), fired AS (
             SELECT *,
               (matched AND sp > 200000.0) AS upd,
               (matched AND NOT coalesce(sp > 200000.0, FALSE)
                 AND tst = 'F') AS del,
               (s_only AND sp > 150000.0) AS ins,
               (t_only AND tpr = '1-URGENT') AS retire
             FROM f)
           SELECT
             CASE WHEN ins THEN sk ELSE tk END AS o_orderkey,
             CASE WHEN ins THEN sc ELSE tc END AS o_custkey,
             CASE WHEN upd THEN 'U' WHEN ins THEN sst ELSE tst END AS o_orderstatus,
             CASE WHEN upd THEN sp WHEN ins THEN sp ELSE tp END AS o_totalprice,
             CASE WHEN ins THEN sd ELSE td END AS o_orderdate,
             CASE WHEN ins THEN spr ELSE tpr END AS o_orderpriority
           FROM fired
           WHERE (matched AND NOT del) OR (s_only AND ins)
              OR (t_only AND NOT retire)
           ORDER BY o_orderkey""",

      // Versioned MERGE: version 1 = the pre-merge snapshot (time
      // travel must survive the merge commit), version 2 = the same
      // clause chain as merge_into
      // WAP replay: the published content can only be the clean
      // rows; the rejected candidate's nulled keys (%97 odd) are
      // exactly the rows missing from the odd half
      "versioned_wap" ->
        """SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(2 AS BIGINT) AS published_version
           FROM orders
           WHERE o_orderkey % 2 = 0 OR o_orderkey % 97 <> 0
           ORDER BY o_orderkey""",

      "versioned_merge_into" ->
        """WITH t AS (
             SELECT * FROM orders WHERE o_orderkey % 3 <> 0
           ), s AS (
             SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice,
               o_orderdate, o_orderpriority
             FROM orders WHERE o_orderkey % 2 = 0
           ), j AS (
             SELECT t.o_orderkey AS tk, t.o_custkey AS tc,
               t.o_orderstatus AS tst, t.o_totalprice AS tp,
               t.o_orderdate AS td, t.o_orderpriority AS tpr,
               s.o_orderkey AS sk, s.o_custkey AS sc,
               s.o_orderstatus AS sst, s.o_totalprice AS sp,
               s.o_orderdate AS sd, s.o_orderpriority AS spr
             FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
           ), f AS (
             SELECT *,
               (tk IS NOT NULL AND sk IS NOT NULL) AS matched,
               (tk IS NULL AND sk IS NOT NULL) AS s_only,
               (tk IS NOT NULL AND sk IS NULL) AS t_only
             FROM j
           ), fired AS (
             SELECT *,
               (matched AND sp > 200000.0) AS upd,
               (matched AND NOT coalesce(sp > 200000.0, FALSE)
                 AND tst = 'F') AS del,
               (s_only AND sp > 150000.0) AS ins,
               (t_only AND tpr = '1-URGENT') AS retire
             FROM f)
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, CAST(1 AS BIGINT) AS version
           FROM t
           UNION ALL
           SELECT
             CASE WHEN ins THEN sk ELSE tk END AS o_orderkey,
             CASE WHEN ins THEN sc ELSE tc END AS o_custkey,
             CASE WHEN upd THEN 'U' WHEN ins THEN sst ELSE tst END AS o_orderstatus,
             CASE WHEN upd THEN sp WHEN ins THEN sp ELSE tp END AS o_totalprice,
             CASE WHEN ins THEN sd ELSE td END AS o_orderdate,
             CASE WHEN ins THEN spr ELSE tpr END AS o_orderpriority,
             CAST(2 AS BIGINT) AS version
           FROM fired
           WHERE (matched AND NOT del) OR (s_only AND ins)
              OR (t_only AND NOT retire)
           ORDER BY version, o_orderkey""",

      // r8 wave 5: frequent triples — the DEFINITIONAL unpruned
      // triple self-join with relative support; the implementation's
      // Apriori pruning must be invisible here
      "basket_triples" ->
        """WITH items AS (
             SELECT DISTINCT l_orderkey AS o, p_brand AS b
             FROM lineitem JOIN part ON l_partkey = p_partkey
           ), s AS (
             SELECT ceil(0.002 * count(DISTINCT o)) AS s FROM items)
           SELECT x.b AS brand_a, y.b AS brand_b, z.b AS brand_c,
             count(*) AS n_orders
           FROM items x
           JOIN items y ON x.o = y.o AND x.b < y.b
           JOIN items z ON y.o = z.o AND y.b < z.b
           GROUP BY 1, 2, 3
           HAVING count(*) >= (SELECT s FROM s)
           ORDER BY 1, 2, 3""",

      // r8 wave 5: inferred members — the dim plus placeholder rows
      // for fact keys the dim feed hasn't delivered
      "dim_late_arriving" ->
        """WITH dim AS (
             SELECT c_custkey, c_name, c_mktsegment, c_acctbal
             FROM customer WHERE c_custkey % 11 <> 0
           ), missing AS (
             SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM dim))
           SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
             FALSE AS is_inferred
           FROM dim
           UNION ALL
           SELECT c_custkey, 'UNKNOWN', 'UNKNOWN', 0.0, TRUE
           FROM missing
           ORDER BY c_custkey""",

      // r8 wave 5: Benford screen — leading digit from the pinned
      // decimal string (log10/floor boundary arithmetic differs
      // between engines; string extraction does not)
      "dq_benford" ->
        """WITH keyed AS (
             SELECT o_orderpriority,
               CAST(regexp_extract(
                 CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
                 '[1-9]') AS INTEGER) AS digit
             FROM orders
             WHERE regexp_extract(
               CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') <> ''
           ), counts AS (
             SELECT o_orderpriority, digit, count(*) AS n
             FROM keyed GROUP BY 1, 2)
           SELECT o_orderpriority, digit, n,
             round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
               PARTITION BY o_orderpriority) AS DOUBLE), 6) AS obs_share,
             round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
             round(abs(
               round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                 PARTITION BY o_orderpriority) AS DOUBLE), 6) -
               round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
           FROM counts
           ORDER BY o_orderpriority, digit""",

      // r8 wave 5: FD violations — determinant values with >1
      // distinct dependent
      "dq_fd_violations" ->
        """SELECT l_partkey,
             count(DISTINCT l_suppkey) AS n_dependent,
             count(*) AS n_rows,
             min(l_suppkey) AS dep_min, max(l_suppkey) AS dep_max
           FROM lineitem GROUP BY 1
           HAVING count(DISTINCT l_suppkey) > 1
           ORDER BY 1""",

      // integer month indices (y·12+m), decimal cumulative revenue,
      // one export division
      "cohort_ltv" ->
        """WITH first AS (
             SELECT o_custkey,
               year(min(o_orderdate)) * 12 + month(min(o_orderdate)) AS cm
             FROM orders GROUP BY 1
           ), sized AS (
             SELECT cm, count(*) AS n_customers FROM first GROUP BY 1
           ), facts AS (
             SELECT f.cm,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm
                 AS period_m,
               sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS revenue
             FROM orders o JOIN first f USING (o_custkey)
             GROUP BY 1, 2
           ), cum AS (
             SELECT *, sum(revenue) OVER (PARTITION BY cm ORDER BY period_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_revenue
             FROM facts)
           SELECT c.cm AS cohort_month, c.period_m, s.n_customers,
             CAST(c.revenue AS DOUBLE) AS revenue,
             CAST(c.cum_revenue AS DOUBLE) AS cum_revenue,
             round(CAST(c.cum_revenue AS DOUBLE) / s.n_customers, 6) AS ltv
           FROM cum c JOIN sized s USING (cm)
           ORDER BY cohort_month, period_m""",

      // ABC replay: the same 1e-4 integer units, identical ordered
      // windows, identical integer threshold cross-products
      // column-diff replay: the same deterministic mutation, one wide
      // conditional aggregate, bounded per-column union
      "cdc_column_diff" ->
        """WITH base AS (
             SELECT o_orderkey AS k, o_custkey AS c,
               CAST(o_totalprice AS DOUBLE) AS p, o_orderpriority AS pr
             FROM orders
           ), newer AS (
             SELECT k, c,
               CASE WHEN k % 10 = 0 THEN p + 1.0 ELSE p END AS p,
               CASE WHEN k % 13 = 0 THEN '9-RECLASSED' ELSE pr END AS pr
             FROM base WHERE k % 31 <> 0
             UNION ALL
             SELECT k + 900000000, c, p, pr FROM base WHERE k % 17 = 0
           ), j AS (
             SELECT b.k AS ok, n.k AS nk, b.c AS oc, n.c AS nc,
               b.p AS op, n.p AS np, b.pr AS opr, n.pr AS npr
             FROM base b FULL OUTER JOIN newer n ON b.k = n.k
           ), w AS (
             SELECT
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS m,
               CAST(sum(CASE WHEN nk IS NOT NULL AND ok IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS ad,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS rm,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND oc IS DISTINCT FROM nc THEN 1 ELSE 0 END) AS BIGINT)
                 AS chc,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND op IS DISTINCT FROM np THEN 1 ELSE 0 END) AS BIGINT)
                 AS chp,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                 AND opr IS DISTINCT FROM npr THEN 1 ELSE 0 END) AS BIGINT)
                 AS chpr
             FROM j)
           SELECT column_name, n_changed, m AS n_matched,
             round(CASE WHEN m > 0 THEN CAST(n_changed AS DOUBLE)
               / CAST(m AS DOUBLE) END, 6) AS change_share,
             ad AS n_added, rm AS n_removed
           FROM (
             SELECT 'o_custkey' AS column_name, chc AS n_changed,
               m, ad, rm FROM w
             UNION ALL SELECT 'o_totalprice', chp, m, ad, rm FROM w
             UNION ALL SELECT 'o_orderpriority', chpr, m, ad, rm FROM w)
           ORDER BY column_name""",

      // balance-snapshot replay: integer month indexes, exact decimal
      // running sums, per-account grid, IGNORE NULLS carry-forward
      "fact_balance_snapshots" ->
        """WITH t AS (
             SELECT o_custkey AS a,
               (year(CAST(o_orderdate AS TIMESTAMP)) - 1970) * 12
                 + month(CAST(o_orderdate AS TIMESTAMP)) - 1 AS m,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amt
             FROM orders
           ), pm AS (
             SELECT a, m, sum(amt) AS dm FROM t GROUP BY 1, 2
           ), cum AS (
             SELECT a, m, sum(dm) OVER (PARTITION BY a ORDER BY m
               ROWS UNBOUNDED PRECEDING) AS bal
             FROM pm
           ), f AS (
             SELECT a, min(m) AS fm FROM pm GROUP BY 1
           ), grid AS (
             SELECT a, unnest(generate_series(fm,
               (SELECT max(m) FROM pm))) AS m
             FROM f
           ), c AS (
             SELECT g.a, g.m,
               last_value(cum.bal IGNORE NULLS) OVER (PARTITION BY g.a
                 ORDER BY g.m ROWS UNBOUNDED PRECEDING) AS bal
             FROM grid g LEFT JOIN cum ON cum.a = g.a AND cum.m = g.m)
           SELECT a AS o_custkey,
             CAST(DATE '1970-01-01' + CAST(m AS INT) * INTERVAL 1 MONTH
               AS TIMESTAMP) AS month_start,
             CAST(bal AS DOUBLE) AS balance
           FROM c ORDER BY o_custkey, month_start""",

      // WoW replay: integer Monday-week indexes, calendar-consecutive
      // guard, one round-6 division
      "events_wow_growth" ->
        """WITH w AS (
             SELECT event_type AS k,
               date_diff('day', DATE '1970-01-05',
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
                 // 7 AS wk,
               count(*) AS n
             FROM events GROUP BY 1, 2
           ), l AS (
             SELECT k, wk, n,
               lag(wk) OVER (PARTITION BY k ORDER BY wk) AS pwk,
               lag(n) OVER (PARTITION BY k ORDER BY wk) AS pn
             FROM w)
           SELECT k AS event_type,
             CAST(DATE '1970-01-05' + CAST(wk * 7 AS INT) AS TIMESTAMP)
               AS week_start,
             CAST(n AS BIGINT) AS n_events,
             CAST(CASE WHEN pwk IS NOT NULL AND wk - pwk = 1
               THEN n - pn END AS BIGINT) AS wow_delta,
             round(CASE WHEN pwk IS NOT NULL AND wk - pwk = 1 AND pn > 0
               THEN CAST(n - pn AS DOUBLE) / CAST(pn AS DOUBLE) END, 6)
               AS wow_pct
           FROM l ORDER BY event_type, week_start""",

      // XYZ replay: exact HUGEINT variance numerator, integer class
      // cuts (no float can flip a class), one double tree for cv
      "inventory_xyz" ->
        """WITH dem AS (
             SELECT l_partkey AS k,
               date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS p,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS v
             FROM lineitem GROUP BY 1, 2
           ), a AS (
             SELECT k, count(*) AS n, sum(v) AS sv, sum(v * v) AS qv
             FROM dem GROUP BY 1
           ), e AS (
             SELECT k, n, sv,
               CAST(n AS HUGEINT) * qv - sv * sv AS varnum,
               sv * sv AS sv2
             FROM a)
           SELECT k AS l_partkey, CAST(n AS BIGINT) AS n_periods,
             round(CASE WHEN sv > 0 THEN
               sqrt(CAST(varnum AS DOUBLE)) / CAST(sv AS DOUBLE) END, 6)
               AS cv,
             CASE WHEN varnum = 0 THEN 'X'
                  WHEN varnum * 4 < sv2 THEN 'X'
                  WHEN varnum < sv2 THEN 'Y' ELSE 'Z' END AS xyz_class
           FROM e ORDER BY l_partkey""",

      "abc_parts" ->
        """WITH u AS (
             SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000
                 AS BIGINT)) AS BIGINT) AS rev_u
             FROM lineitem GROUP BY 1
           ), j AS (
             SELECT p.p_brand, p.p_partkey, u.rev_u
             FROM u JOIN part p ON u.l_partkey = p.p_partkey
           ), w AS (
             SELECT p_brand, p_partkey, rev_u,
               CAST(row_number() OVER (PARTITION BY p_brand
                 ORDER BY rev_u DESC, p_partkey) AS BIGINT) AS rank,
               CAST(sum(rev_u) OVER (PARTITION BY p_brand
                 ORDER BY rev_u DESC, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(sum(rev_u) OVER (PARTITION BY p_brand) AS BIGINT)
                 AS tot
             FROM j)
           SELECT p_brand, p_partkey, rank, rev_u AS value,
             cum AS cum_value,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
           FROM w ORDER BY p_brand, rank""",

      // Gini replay: identical decimal rank sums, the same double
      // tree — ties rank-broken on custkey in both engines
      "revenue_gini" ->
        """WITH rev AS (
             SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
             FROM orders GROUP BY 1
           ), j AS (
             SELECT n.n_name AS nation, c.c_custkey AS id,
               CAST(r.rev AS DECIMAL(12,2)) AS x
             FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
           ), ix AS (
             SELECT nation, x, row_number() OVER (PARTITION BY nation
               ORDER BY x, id) AS i
             FROM j
           ), s AS (
             SELECT nation, count(*) AS n_units, sum(x) AS sx,
               sum(x * i) AS six
             FROM ix GROUP BY 1)
           SELECT nation, n_units, CAST(sx AS DOUBLE) AS total_value,
             round(CASE WHEN CAST(sx AS DOUBLE) > 0 THEN
               (2.0 * CAST(six AS DOUBLE)
                 - (CAST(n_units AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
               / (CAST(n_units AS DOUBLE) * CAST(sx AS DOUBLE)) END, 6)
               AS gini
           FROM s ORDER BY nation""",

      // per-edge orphan audit; synthetic TPC-H data should be clean —
      // the zero counts ARE the assertion
      "dq_referential" ->
        """SELECT 'orders.custkey->customer' AS relationship,
             count(*) AS n_child, count(DISTINCT o_custkey) AS n_keys,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphan_rows,
             count(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o_custkey END)
               AS n_orphan_keys
           FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o_custkey = c.c_custkey WHERE o_custkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.orderkey->orders',
             count(*), count(DISTINCT l_orderkey),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l_orderkey = o.o_orderkey WHERE l_orderkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.partkey->part',
             count(*), count(DISTINCT l_partkey),
             CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN p.p_partkey IS NULL THEN l_partkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             ON l_partkey = p.p_partkey WHERE l_partkey IS NOT NULL
           UNION ALL
           SELECT 'lineitem.suppkey->supplier',
             count(*), count(DISTINCT l_suppkey),
             CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT CASE WHEN s.s_suppkey IS NULL THEN l_suppkey END)
           FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
             ON l_suppkey = s.s_suppkey WHERE l_suppkey IS NOT NULL
           ORDER BY relationship""",

      // the definitional dominance scan grades the sorted-window
      // frontier (≡ by the per-x-max + strictly-greater-x argument)
      "skyline_frontier" ->
        """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders r
           WHERE NOT EXISTS (
             SELECT 1 FROM orders s
             WHERE s.o_totalprice >= r.o_totalprice
               AND s.o_orderdate >= r.o_orderdate
               AND (s.o_totalprice > r.o_totalprice
                 OR s.o_orderdate > r.o_orderdate))
           ORDER BY o_orderkey""",

      // one row per proposed combo; the tuple count(DISTINCT (...))
      // replays Spark's struct-distinct exactly
      "dq_candidate_keys" ->
        """WITH n AS (SELECT count(*) AS n_rows FROM orders)
           SELECT columns, n_rows, n_distinct,
             round(n_distinct / CAST(n_rows AS DOUBLE), 6) AS uniqueness,
             n_distinct = n_rows AS is_key
           FROM (
             SELECT 'o_orderkey' AS columns, n_rows,
               (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct FROM n
             UNION ALL SELECT 'o_custkey', n_rows,
               (SELECT count(DISTINCT o_custkey) FROM orders) FROM n
             UNION ALL SELECT 'o_orderstatus', n_rows,
               (SELECT count(DISTINCT o_orderstatus) FROM orders) FROM n
             UNION ALL SELECT 'o_orderdate', n_rows,
               (SELECT count(DISTINCT o_orderdate) FROM orders) FROM n
             UNION ALL SELECT 'o_custkey,o_orderdate', n_rows,
               (SELECT count(DISTINCT (o_custkey, o_orderdate)) FROM orders) FROM n
             UNION ALL SELECT 'o_orderdate,o_orderstatus', n_rows,
               (SELECT count(DISTINCT (o_orderdate, o_orderstatus)) FROM orders) FROM n)
           ORDER BY columns""",

      "audience_overlap" ->
        """SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_users
           FROM (SELECT DISTINCT event_type, user_id FROM events) a
           JOIN (SELECT DISTINCT event_type, user_id FROM events) b
             ON a.user_id = b.user_id
           WHERE a.event_type < b.event_type
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // bin arithmetic stated verbatim (pure IEEE double: sub, div,
      // mul, floor — bit-identical cross-engine)
      "events_value_histogram" ->
        """WITH s AS (
             SELECT event_type, min(value) AS mn, max(value) AS mx
             FROM events GROUP BY 1)
           SELECT e.event_type,
             CASE WHEN s.mx > s.mn
               THEN CAST(least(19, floor((e.value - s.mn) / (s.mx - s.mn) * 20)) AS BIGINT)
               ELSE 0 END AS bin,
             count(*) AS n
           FROM events e JOIN s ON e.event_type = s.event_type
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // wide pivot melted back to long: every (user, type) cell
      // explicit, zeros included
      "events_pivot_melt" ->
        """SELECT user_id, t.event_type,
             CAST(count(*) FILTER (WHERE e.event_type = t.event_type) AS BIGINT) AS n_events
           FROM events e
           CROSS JOIN (VALUES ('click'), ('view'), ('purchase'),
             ('signup'), ('error')) AS t(event_type)
           GROUP BY user_id, t.event_type
           ORDER BY user_id, t.event_type""",

      "bloom_point_read" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders WHERE o_orderkey = 1234""",

      // exact interpolated percentiles (the dq_numeric_profile
      // machinery) + per-row clamp
      "events_winsorized" ->
        """WITH b AS (
             SELECT event_type, quantile_cont(value, 0.01) AS lo,
               quantile_cont(value, 0.99) AS hi
             FROM events GROUP BY 1)
           SELECT event_id, e.event_type, value,
             least(greatest(value, lo), hi) AS clipped
           FROM events e JOIN b ON e.event_type = b.event_type
           ORDER BY event_id""",

      "events_transitions" ->
        """WITH o AS (
             SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
             FROM events)
           SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
           FROM o WHERE next_type IS NOT NULL
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // Markov accuracy replay: same lead() bigrams, (count desc,
      // type asc) argmax, one division
      "events_markov_accuracy" ->
        """WITH o AS (
             SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
             FROM events
           ), c AS (
             SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
             FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
           ), p AS (
             SELECT from_type, to_type AS predicted_next, n AS n_correct,
               row_number() OVER (PARTITION BY from_type
                 ORDER BY n DESC, to_type) AS rn
             FROM c
           ), t AS (
             SELECT from_type, CAST(sum(n) AS BIGINT) AS n_transitions
             FROM c GROUP BY 1)
           SELECT t.from_type, t.n_transitions, p.predicted_next,
             p.n_correct,
             round(CAST(p.n_correct AS DOUBLE)
               / CAST(t.n_transitions AS DOUBLE), 6) AS accuracy
           FROM t JOIN p ON t.from_type = p.from_type AND p.rn = 1
           ORDER BY t.from_type""",

      // integral trailing-hour RANGE frame (date_diff = floor'd epoch
      // seconds, matching Spark's unix_timestamp truncation)
      "events_rolling_range" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id
               ORDER BY date_diff('second', TIMESTAMP '1970-01-01', CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_value
           FROM events ORDER BY user_id, event_id""",

      "events_value_deciles" ->
        """WITH d AS (
             SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS decile
             FROM events)
           SELECT event_type, decile, count(*) AS n_rows,
             min(value) AS lo, max(value) AS hi
           FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

      // the PLAIN join — bloom pruning must be invisible in the result
      "bloom_reduced_join" ->
        """SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem, supplier, nation, region
           WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
           GROUP BY n_name ORDER BY n_name""",

      "q22_no_orders" ->
        """SELECT c_mktsegment,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
           FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "rollup_revenue" ->
        """SELECT n_name, order_year,
             CAST(sum(rev) AS DOUBLE) AS revenue
           FROM (
             SELECT n_name, year(o_orderdate) AS order_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey)
           GROUP BY ROLLUP (n_name, order_year)
           ORDER BY n_name NULLS FIRST, order_year NULLS FIRST""",

      "segment_distincts" ->
        """SELECT c_mktsegment,
             count(DISTINCT c_nationkey) AS n_nations,
             count(*) AS n_customers
           FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "dq_profile" ->
        """SELECT column_name, n_rows, n_null, n_distinct, min_value, max_value FROM (
             SELECT 'o_orderstatus' AS column_name, count(*) AS n_rows,
               count(*) FILTER (WHERE o_orderstatus IS NULL) AS n_null,
               count(DISTINCT o_orderstatus) AS n_distinct,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_value FROM orders
             UNION ALL
             SELECT 'o_custkey', count(*),
               count(*) FILTER (WHERE o_custkey IS NULL),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
             UNION ALL
             SELECT 'o_totalprice', count(*),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
           ) ORDER BY column_name""",

      "cdc_incremental_filter" ->
        s"""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
           FROM events WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
           ORDER BY event_id""",

      "cdc_last_loaded" ->
        "SELECT max(CAST(ts AS TIMESTAMP)) AS last_ts FROM events",

      "cdc_dedup_latest" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      "cdc_upsert" ->
        """WITH latest AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
             WHERE rn = 1
           ), latest_p AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events WHERE event_type = 'purchase') t
             WHERE rn = 1)
           SELECT l.user_id AS user_id,
             CASE WHEN p.user_id IS NOT NULL THEN p.event_id ELSE l.event_id END AS event_id,
             CASE WHEN p.user_id IS NOT NULL THEN p.ts ELSE l.ts END AS ts,
             CASE WHEN p.user_id IS NOT NULL THEN p.event_type ELSE l.event_type END AS event_type,
             CASE WHEN p.user_id IS NOT NULL THEN p.value ELSE l.value END AS value
           FROM latest l LEFT JOIN latest_p p ON l.user_id = p.user_id
           ORDER BY user_id""",

      "cdc_snapshot_load" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment, TIMESTAMP '2026-08-12 00:00:00' AS snapshot_date
           FROM customer ORDER BY customer_id""",

      "scd2_history" ->
        """SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS valid_from,
             CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS TIMESTAMP) AS valid_to
           FROM events ORDER BY user_id, valid_from, event_id""",

      "scd2_current" ->
        """SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS valid_from
           FROM (SELECT *, lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS nxt FROM events)
           WHERE nxt IS NULL ORDER BY user_id""",

      "scd2_asof" ->
        s"""SELECT user_id, event_id, event_type, valid_from, valid_to FROM (
             SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS valid_from,
               CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS TIMESTAMP) AS valid_to
             FROM events)
           WHERE valid_from <= TIMESTAMP '$CdcCutoff'
             AND (valid_to IS NULL OR valid_to > TIMESTAMP '$CdcCutoff')
           ORDER BY user_id""",

      "dq_freshness" ->
        """SELECT max_loaded_at, lag_sec,
             CASE WHEN lag_sec IS NULL OR lag_sec > 2592000 THEN 'error'
                  WHEN lag_sec > 3600 THEN 'warn'
                  ELSE 'pass' END AS status
           FROM (
             SELECT max(CAST(ts AS TIMESTAMP)) AS max_loaded_at,
               CAST(epoch(TIMESTAMP '2024-04-01 00:00:00') AS BIGINT)
                 - CAST(epoch(max(CAST(ts AS TIMESTAMP))) AS BIGINT) AS lag_sec
             FROM events)""",

      // variance from Σn (long) and Σn² summed in DOUBLE (the long
      // square overflows at ~3e9-row days; doubles stay bit-exact
      // while Σn² < 2^53, true at any graded SF); z null under 2 days
      "dq_volume_anomaly" ->
        """WITH c AS (
             SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_ts,
               count(*) AS n_rows
             FROM events GROUP BY 1
           ), m AS (
             SELECT bucket_ts, n_rows,
               count(*) OVER () AS nn,
               CAST(sum(n_rows) OVER () AS DOUBLE) AS s1,
               sum(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) OVER () AS s2
             FROM c
           ), z AS (
             SELECT bucket_ts, n_rows,
               CASE WHEN nn < 2
                      OR (s2 - s1 * s1 / CAST(nn AS DOUBLE))
                         / CAST(greatest(nn - 1, 1) AS DOUBLE) <= 0.0 THEN NULL
                 ELSE round((CAST(n_rows AS DOUBLE) - s1 / CAST(nn AS DOUBLE))
                   / sqrt((s2 - s1 * s1 / CAST(nn AS DOUBLE))
                          / CAST(greatest(nn - 1, 1) AS DOUBLE)), 6) END AS z_score
             FROM m)
           SELECT bucket_ts, n_rows, z_score,
             coalesce(abs(z_score) > 3.0, false) AS is_anomaly
           FROM z ORDER BY bucket_ts""",

      // seasonal-naive anomaly (r9): dense hourly grid, trailing-7
      // same-hour-of-day moment sums — identical closed form to the
      // Spark side, round(6) per the cross-engine discipline
      "dq_seasonal_anomaly" ->
        """WITH c AS (
             SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
               count(*) AS n
             FROM events GROUP BY 1
           ), bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
           grid AS (
             SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
             FROM bounds
           ), dense AS (
             SELECT g.bucket_ts, coalesce(c.n, 0) AS n_rows
             FROM grid g LEFT JOIN c ON c.b = g.bucket_ts
           ), m AS (
             SELECT bucket_ts, n_rows,
               count(*) OVER w AS baseline_n,
               CAST(sum(n_rows) OVER w AS DOUBLE) AS s1,
               sum(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) OVER w AS s2
             FROM dense
             WINDOW w AS (PARTITION BY extract(hour FROM bucket_ts)
               ORDER BY bucket_ts
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           ), z AS (
             SELECT bucket_ts, n_rows, baseline_n,
               CASE WHEN baseline_n < 3
                      OR (s2 - s1 * s1 / CAST(baseline_n AS DOUBLE))
                         / CAST(greatest(baseline_n - 1, 1) AS DOUBLE) <= 0.0
                    THEN NULL
                 ELSE round((CAST(n_rows AS DOUBLE) - s1 / CAST(baseline_n AS DOUBLE))
                   / sqrt((s2 - s1 * s1 / CAST(baseline_n AS DOUBLE))
                          / CAST(greatest(baseline_n - 1, 1) AS DOUBLE)), 6) END AS z_score
             FROM m)
           SELECT bucket_ts, n_rows, baseline_n, z_score,
             coalesce(abs(z_score) > 2.0, false) AS is_anomaly
           FROM z ORDER BY bucket_ts""",

      "stg_customer" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      "stg_event_log" ->
        """SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS created_at,
             CASE WHEN event_type = 'error' THEN CAST(ts AS TIMESTAMP) END AS deleted_at
           FROM events ORDER BY event_id""",

      "stg_soft_delete" ->
        """SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS created_at,
             CAST(NULL AS TIMESTAMP) AS deleted_at
           FROM events WHERE event_type <> 'error' ORDER BY event_id""",

      "scd2_merge" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      // md5 row fingerprints recomputed in SQL; change = hash diff
      "scd2_merge_hashdiff" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment,
                    md5(concat_ws(chr(1),
                      coalesce(c_name, chr(0)),
                      coalesce(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), chr(0)),
                      coalesce(c_mktsegment, chr(0)))) AS row_hash
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment,
                    md5(concat_ws(chr(1),
                      coalesce(customer_name, chr(0)),
                      coalesce(CAST(CAST(account_balance AS DECIMAL(12,2)) AS VARCHAR), chr(0)),
                      coalesce(CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END, chr(0)))) AS row_hash
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.row_hash <> s2.row_hash)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  row_hash,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  row_hash,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      "reconcile_diff" ->
        """WITH src AS (
             SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
           tgt AS (
             SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN 'DRIFTED'
                    ELSE c_mktsegment END AS c_mktsegment,
               c_acctbal
             FROM customer WHERE c_custkey % 13 <> 0
             UNION ALL
             SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
             FROM customer WHERE c_custkey % 17 = 0)
           SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN s.c_custkey IS NULL THEN 'target_only'
                  WHEN t.c_custkey IS NULL THEN 'source_only'
                  WHEN s.c_mktsegment IS DISTINCT FROM t.c_mktsegment
                    OR s.c_acctbal IS DISTINCT FROM t.c_acctbal THEN 'mismatch'
                  ELSE 'match' END AS verdict,
             CASE WHEN s.c_custkey IS NULL OR t.c_custkey IS NULL THEN NULL
                  ELSE s.c_mktsegment IS DISTINCT FROM t.c_mktsegment END
               AS c_mktsegment_differs,
             CASE WHEN s.c_custkey IS NULL OR t.c_custkey IS NULL THEN NULL
                  ELSE s.c_acctbal IS DISTINCT FROM t.c_acctbal END
               AS c_acctbal_differs
           FROM src s FULL OUTER JOIN tgt t ON s.c_custkey = t.c_custkey
           ORDER BY c_custkey""",

      "scd2_merge_harddelete" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                  CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                         OR customer_id % 7 = 0
                       THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
           FROM s1
           UNION ALL
           SELECT customer_id, customer_name, account_balance, market_segment,
                  TIMESTAMP '2026-02-01 00:00:00', NULL
           FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)
           ORDER BY customer_id, valid_from""",

      // r9 write-path grades: every oracle states the POST-maintenance
      // table content in plain SQL over the source tables
      "sink_upsert" ->
        """WITH base AS (
             SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             FROM orders)
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN TIMESTAMP '1999-12-31 00:00:00'
                  ELSE o_orderdate END AS o_orderdate
           FROM base
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderdate
           FROM base WHERE o_orderkey % 7 = 0
           ORDER BY o_orderkey""",

      // append accumulates: the whole table plus the %3 slice again
      "sink_jdbc_append" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0
           ORDER BY o_orderkey, o_custkey""",

      // truncate+insert: only the second (post-cutoff) load survives
      "sink_jdbc_overwrite" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
           FROM orders
           WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
           ORDER BY o_orderkey""",

      // staged warehouse upsert: identical post-maintenance content
      // to the parquet-path sink_upsert — updates replace their keys,
      // new keys append
      "sink_jdbc_upsert" ->
        """WITH base AS (
             SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             FROM orders)
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN TIMESTAMP '1999-12-31 00:00:00'
                  ELSE o_orderdate END AS o_orderdate
           FROM base
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderdate
           FROM base WHERE o_orderkey % 7 = 0
           ORDER BY o_orderkey""",

      "sink_dynamic_overwrite" ->
        """SELECT o_orderkey, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderpriority <> '1-URGENT'
           UNION ALL
           SELECT o_orderkey, o_totalprice * 2.0, o_orderpriority
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
           ORDER BY o_orderkey""",

      "cdc_full_snapshot" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      "incr_model_materialize" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type, value
           FROM events ORDER BY event_id""",

      "staged_load" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_nationkey AS nation_id, c_acctbal AS account_balance,
             c_mktsegment AS market_segment
           FROM customer ORDER BY customer_id""",

      // the contract verdict table, stated literally
      "schema_compat_report" ->
        """SELECT * FROM (VALUES
             ('event_id', 'bigint', 'bigint', 'unchanged', true),
             ('event_type', 'string', 'string', 'unchanged', true),
             ('props', CAST(NULL AS VARCHAR), 'string', 'added', true),
             ('ts', 'timestamp', CAST(NULL AS VARCHAR), 'removed', false),
             ('user_id', 'bigint', 'int', 'widened', true),
             ('value', 'double', 'string', 'changed', false)
           ) AS t("column", contract_type, incoming_type, change, compatible)
           ORDER BY "column"""",

      // vacuum grades the HEAD content: v3 replaced the table with
      // the doubled-balance even-customer slice
      "versioned_vacuum" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_acctbal * 2 AS account_balance
           FROM customer WHERE c_custkey % 2 = 0
           ORDER BY customer_id""",

      "versioned_time_travel" ->
        """WITH base AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer)
           SELECT 'v1' AS version_tag, customer_id, customer_name,
                  account_balance, market_segment,
                  TIMESTAMP '2026-01-01 00:00:00' AS updated_at
           FROM base WHERE customer_id % 2 = 0
           UNION ALL
           SELECT 'v2', customer_id, customer_name,
                  CASE WHEN customer_id % 4 = 0 THEN account_balance + 1000
                       ELSE account_balance END,
                  market_segment,
                  CASE WHEN customer_id % 4 = 0
                       THEN TIMESTAMP '2026-02-01 00:00:00'
                       ELSE TIMESTAMP '2026-01-01 00:00:00' END
           FROM base WHERE customer_id % 2 = 0
           UNION ALL
           SELECT 'v2', customer_id, customer_name, account_balance,
                  market_segment, TIMESTAMP '2026-02-01 00:00:00'
           FROM base WHERE customer_id % 2 = 1 AND customer_id % 3 = 0
           ORDER BY version_tag, customer_id""",

      "bucketed_join" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "dag_run_mart" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_name || ' [' || c_mktsegment || ']' AS display_name,
             c_acctbal AS account_balance, c_mktsegment AS market_segment,
             n_name AS nation_name, r_name AS region_name
           FROM customer
           LEFT JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN region ON n_regionkey = r_regionkey
           ORDER BY customer_id""",

      // backfill equivalence stated directly: chunked day-partition
      // runs (plus one retried chunk) must reproduce the one-shot
      // full rebuild — the oracle IS that rebuild
      "pipeline_backfill" ->
        """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // two scheduler windows replayed directly: run 1 = the day-1
      // watermark slice, run 2 = the catch-up slice (three folded
      // daily ticks) plus the Sunday total row — per-run aggregates
      // over the two cutoffs stated as plain SQL
      "pipeline_schedule_replay" ->
        """WITH r1 AS (
             SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
             FROM orders
             WHERE o_orderdate <= TIMESTAMP '1995-06-30 00:00:00'
             GROUP BY o_orderpriority
           ), r2 AS (
             SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
             FROM orders
             WHERE o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
             GROUP BY o_orderpriority)
           SELECT o_orderpriority, n, revenue, CAST(1 AS BIGINT) AS run_seq
           FROM r1
           UNION ALL
           SELECT o_orderpriority, n, revenue, CAST(2 AS BIGINT) FROM r2
           UNION ALL
           SELECT '__TOTAL__', CAST(sum(n) AS BIGINT),
             CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE),
             CAST(2 AS BIGINT)
           FROM r2
           ORDER BY run_seq, o_orderpriority""",

      // the fold converges to the change-log window construction:
      // union the four states, keep rows whose attributes differ from
      // the key's previous state, valid_to = next change time
      "scd2_mergeall_fold" ->
        """WITH s0 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           snaps AS (
             SELECT customer_id, customer_name, account_balance,
                    market_segment,
                    TIMESTAMP '2026-01-01 00:00:00' AS vt FROM s0
             UNION ALL
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-02-01 00:00:00' FROM s0
             UNION ALL
             SELECT customer_id, customer_name,
                    CASE WHEN customer_id % 3 = 0 THEN account_balance + 100
                         ELSE account_balance END,
                    CASE WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-03-01 00:00:00' FROM s0
             UNION ALL
             SELECT customer_id, customer_name,
                    CASE WHEN customer_id % 3 = 0 THEN account_balance + 100
                         ELSE account_balance END,
                    CASE WHEN customer_id % 7 = 0 THEN 'SEG_T3'
                         WHEN customer_id % 5 = 0 THEN 'SEG_T1'
                         ELSE market_segment END,
                    TIMESTAMP '2026-04-01 00:00:00' FROM s0),
           marked AS (
             SELECT *,
               lag(market_segment) OVER w AS p_seg,
               lag(account_balance) OVER w AS p_bal,
               lag(customer_name) OVER w AS p_name
             FROM snaps WINDOW w AS (PARTITION BY customer_id ORDER BY vt)),
           versions AS (
             SELECT customer_id, customer_name, account_balance,
                    market_segment, vt
             FROM marked
             WHERE p_seg IS NULL OR market_segment <> p_seg
                OR account_balance <> p_bal OR customer_name <> p_name)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  vt AS valid_from,
                  lead(vt) OVER (PARTITION BY customer_id ORDER BY vt)
                    AS valid_to
           FROM versions
           ORDER BY customer_id, valid_from""",

      // the two-day pipeline replay: the day-2 snapshot is the day-1
      // source after a segment UPDATE (%10) and hard DELETEs (%7) —
      // deterministic id arithmetic, so the SCD2 fold replays as SQL;
      // the Derby extract round trip is value-preserving; the two
      // staged event loads are provably the whole events table
      // (watermark = max loaded ts), so n_events is a plain rollup
      "pipeline_day_replay" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_nationkey AS nation_id, c_acctbal AS account_balance,
                    c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, nation_id, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0),
           changed AS (
             SELECT s1.customer_id FROM s1 JOIN s2 USING (customer_id)
             WHERE s1.market_segment <> s2.market_segment
                OR s1.account_balance <> s2.account_balance
                OR s1.customer_name <> s2.customer_name),
           hist AS (
             SELECT customer_id, customer_name, nation_id, account_balance,
                    market_segment,
                    TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                    CASE WHEN customer_id IN (SELECT customer_id FROM changed)
                           OR customer_id % 7 = 0
                         THEN TIMESTAMP '2026-02-01 00:00:00' END AS valid_to
             FROM s1
             UNION ALL
             SELECT customer_id, customer_name, nation_id, account_balance,
                    market_segment,
                    TIMESTAMP '2026-02-01 00:00:00', NULL
             FROM s2 WHERE customer_id IN (SELECT customer_id FROM changed)),
           fct AS (
             SELECT o_custkey AS customer_id,
                    count(DISTINCT o_orderkey) AS n_orders,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                      AS revenue
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             GROUP BY o_custkey),
           ev AS (
             SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
           SELECT h.customer_id, h.customer_name, h.account_balance,
                  h.market_segment, n.n_name AS nation_name,
                  r.r_name AS region_name, h.valid_from, h.valid_to,
                  coalesce(f.n_orders, 0) AS n_orders,
                  coalesce(f.revenue, 0.0) AS revenue,
                  coalesce(e.n_events, 0) AS n_events
           FROM hist h
           LEFT JOIN nation n ON h.nation_id = n.n_nationkey
           LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
           LEFT JOIN fct f ON h.customer_id = f.customer_id
           LEFT JOIN ev e ON h.customer_id = e.user_id
           ORDER BY h.customer_id, h.valid_from""",

      // the gate's Benford screen over the day-2 current rows: the
      // replay's surviving customers are pure id arithmetic, so the
      // digit table is replayable without the pipeline
      "pipeline_day_replay_dq" ->
        """WITH s2 AS (
             SELECT c_acctbal AS account_balance
             FROM customer WHERE c_custkey % 7 <> 0),
           keyed AS (
             SELECT CAST(regexp_extract(
               CAST(CAST(abs(account_balance) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') AS INTEGER) AS digit
             FROM s2
             WHERE regexp_extract(
               CAST(CAST(abs(account_balance) AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]') <> ''
           ), counts AS (
             SELECT digit, count(*) AS n FROM keyed GROUP BY 1)
           SELECT digit, n,
             round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
               AS obs_share,
             round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
             round(abs(
               round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6) -
               round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
           FROM counts ORDER BY digit""",

      "range_join_rewrite" ->
        """WITH days AS (
             SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start
             FROM events)
           SELECT day_start, count(*) AS n_events
           FROM events e JOIN days d
             ON CAST(e.ts AS TIMESTAMP) >= d.day_start
            AND CAST(e.ts AS TIMESTAMP)
                  <= d.day_start + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND
           GROUP BY day_start ORDER BY day_start""",

      "stream_cdc_apply" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      // the JDBC warehouse table after bootstrap + merge + a skipped
      // poisoned redelivery must equal the same latest-per-user
      // recompute — an applied poison row or double-applied batch
      // shows up as extra/shifted rows
      "stream_cdc_jdbc_exactly_once" ->
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id""",

      // the streaming window agg must converge to the batch rollup
      "stream_hourly_counts" ->
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      // lag-islands replay of session_window: break at gap >= 30 min
      // (Spark merges only strictly-overlapping windows), session end
      // = last event + gap
      "stream_session_windows" ->
        """WITH e AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
           ), m AS (
             SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           ), sess AS (
             SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
             FROM m)
           SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM sess GROUP BY user_id, sid
           ORDER BY user_id, session_start""",

      // token arithmetic replayed: substr(md5(salt||key),1,16)
      "pii_pseudonymized_join" ->
        """WITH ct AS (
             SELECT substr(md5('tenant-a' || CAST(c_custkey AS VARCHAR)), 1, 16)
               AS token, c_mktsegment FROM customer
           ), ot AS (
             SELECT substr(md5('tenant-a' || CAST(o_custkey AS VARCHAR)), 1, 16)
               AS token FROM orders)
           SELECT c_mktsegment, count(*) AS n_orders,
             count(DISTINCT token) AS n_customers,
             min(token) AS sample_token
           FROM ct JOIN ot USING (token)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      // the definitional scan grades the whole index → intersect →
      // verify path (≡ by the no-false-negative trigram pigeonhole)
      "doc_substring_search" ->
        """SELECT doc_id FROM documents
           WHERE contains(text, 'data group') ORDER BY doc_id""",

      // the definitional padded-text position scan (counts EVERY
      // occurrence, overlapping included — regex/replace tricks
      // can't) grades the anchor-vote positional intersect; shared by
      // the fresh-build and maintained-index forms, which are
      // row-identical by the per-doc postings argument
      "doc_phrase_search" -> phraseSearchOracleSql,
      "doc_phrase_search_incr" -> phraseSearchOracleSql,

      // per-phrase every-offset scan union grades the one-pass
      // multi-phrase probe (overlaps counted, token first positions)
      "doc_multi_phrase" ->
        """WITH pats AS (
             SELECT * FROM (VALUES (' table table '), (' value table '),
               (' fast sort key '), (' quantum leap ')) p(pp)
           ), d AS (
             SELECT doc_id,
               ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' ' AS p
             FROM documents
           ), m AS (
             SELECT trim(pp) AS pattern, doc_id, i.gs AS cpos, d.p
             FROM d CROSS JOIN pats,
               LATERAL (SELECT unnest(generate_series(1, length(d.p))) AS gs) i
             WHERE substr(d.p, i.gs, length(pp)) = pp
           )
           SELECT pattern, doc_id, count(*) AS n_matches,
             min(length(substr(p, 1, cpos))
                 - length(replace(substr(p, 1, cpos), ' ', ''))) AS first_pos
           FROM m GROUP BY 1, 2 ORDER BY pattern, doc_id""",

      // per-pattern scan union grades the one-pass batch probe
      "doc_multi_search" ->
        """SELECT p.pattern, d.doc_id
           FROM documents d CROSS JOIN (VALUES
             ('data group'), ('window dup'), ('sort merge part'),
             ('spark group')) p(pattern)
           WHERE contains(d.text, p.pattern)
           ORDER BY p.pattern, d.doc_id""",

      // prunedRead ≡ the plain filtered read — ordinary SQL grades
      // the whole clustered-write → stats → file-skip path
      "clustered_prune_read" ->
        """SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           FROM orders
           WHERE o_totalprice BETWEEN 50000.0 AND 100000.0
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      "zorder_prune_read" ->
        """SELECT count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
           FROM lineitem
           WHERE l_partkey BETWEEN 100 AND 400
             AND l_suppkey BETWEEN 10 AND 40""",

      // maintenance must never change the row set: both the compacted
      // and the re-clustered orders table equal the plain source scan
      "sink_compact" ->
        """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
           FROM orders ORDER BY o_orderkey""",
      "sink_clustered_write" ->
        """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
           FROM orders ORDER BY o_orderkey""",

      // VALUES-literal oracle (zero data): the crafted file's
      // deterministic split — good rows parse, bad rows keep raw text
      // roundtrip oracles: the parquet table verbatim — equality
      // proves the format paths are lossless
      "source_orc_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",
      "source_csv_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",
      "source_jsonl_roundtrip" ->
        "SELECT * FROM orders ORDER BY o_orderkey",

      "source_quarantine" ->
        """SELECT * FROM (VALUES
             ('good', CAST(1 AS BIGINT), CAST('alpha' AS VARCHAR), CAST(10 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('good', CAST(2 AS BIGINT), CAST('beta' AS VARCHAR), CAST(20 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('good', CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(40 AS BIGINT), CAST(NULL AS VARCHAR)),
             ('quarantine', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST('{"id": "x", "name": "gamma", "qty": 3}' AS VARCHAR)),
             ('quarantine', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST('this is not json' AS VARCHAR)))
             AS t(kind, id, name, qty, raw_record)
           ORDER BY kind, coalesce(raw_record, ''), coalesce(id, -1)""",

      // the salted machinery must be invisible: plain inner join
      "skew_salted_join" ->
        """SELECT e.event_id, e.user_id, c.c_name AS customer_name,
             c.c_mktsegment AS market_segment, e.value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           ORDER BY e.event_id""",

      // redelivered input deduped back to exactly-once = the raw table
      "stream_dedup" ->
        """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
           FROM events ORDER BY event_id""",

      "cdc_snapshot_diff" ->
        """WITH s1 AS (
             SELECT c_custkey AS customer_id, c_name AS customer_name,
                    c_acctbal AS account_balance, c_mktsegment AS market_segment
             FROM customer),
           s2 AS (
             SELECT customer_id, customer_name, account_balance,
                    CASE WHEN customer_id % 10 = 0 THEN 'CHANGED'
                         ELSE market_segment END AS market_segment
             FROM s1 WHERE customer_id % 7 <> 0)
           SELECT customer_id, customer_name, account_balance, market_segment,
                  change_type FROM (
             SELECT coalesce(n.customer_id, o.customer_id) AS customer_id,
               CASE WHEN n.customer_id IS NOT NULL THEN n.customer_name
                    ELSE o.customer_name END AS customer_name,
               CASE WHEN n.customer_id IS NOT NULL THEN n.account_balance
                    ELSE o.account_balance END AS account_balance,
               CASE WHEN n.customer_id IS NOT NULL THEN n.market_segment
                    ELSE o.market_segment END AS market_segment,
               CASE WHEN o.customer_id IS NULL THEN 'insert'
                    WHEN n.customer_id IS NULL THEN 'delete'
                    WHEN o.customer_name IS DISTINCT FROM n.customer_name
                      OR o.account_balance IS DISTINCT FROM n.account_balance
                      OR o.market_segment IS DISTINCT FROM n.market_segment
                    THEN 'update' END AS change_type
             FROM s1 o FULL OUTER JOIN s2 n ON o.customer_id = n.customer_id)
           WHERE change_type IS NOT NULL
           ORDER BY customer_id""",

      "events_pivot" ->
        """SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'view') AS view,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
           FROM events GROUP BY user_id ORDER BY user_id""",

      "flatten_props" ->
        """SELECT event_id, user_id,
             event_type AS attrs_event_type, value AS attrs_value,
             CAST(json_extract(props, '$.k') AS INT) AS props_k
           FROM events ORDER BY event_id""",

      "schema_evolution" ->
        s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             CASE WHEN CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
                  THEN value END AS value
           FROM events ORDER BY event_id""",

      "stg_events" ->
        s"""SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS created_at
           FROM events
           WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '$CdcCutoff'
           ORDER BY event_id""",

      "skew_salted_agg" ->
        """SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             count(*) AS n_rows,
             min(user_id) AS min_user, max(user_id) AS max_user
           FROM events GROUP BY event_type ORDER BY event_type""",

      "dim_customer" ->
        """SELECT c_custkey AS customer_id, c_name AS customer_name,
             c_name || ' [' || c_mktsegment || ']' AS display_name,
             c_acctbal AS account_balance, c_mktsegment AS market_segment,
             n_name AS nation_name, r_name AS region_name
           FROM customer
           LEFT JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN region ON n_regionkey = r_regionkey
           ORDER BY customer_id""",

      "dim_order" ->
        """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
             o_orderstatus AS order_status, o_totalprice AS total_price,
             o_orderdate AS order_date, o_orderpriority AS order_priority,
             c_name AS customer_name, c_mktsegment AS market_segment,
             n_name AS nation_name
           FROM orders
           LEFT JOIN customer ON o_custkey = c_custkey
           LEFT JOIN nation ON c_nationkey = n_nationkey
           ORDER BY order_id""",

      "fact_lineitem" ->
        """SELECT l_orderkey AS order_id, l_linenumber AS line_number,
             l_partkey AS part_id, l_suppkey AS supplier_id,
             l_quantity AS quantity, l_extendedprice AS extended_price,
             l_discount AS discount, l_shipdate AS ship_date,
             o_custkey AS customer_id, o_orderstatus AS order_status,
             o_orderdate AS order_date,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           FROM lineitem
           LEFT JOIN orders ON l_orderkey = o_orderkey
           ORDER BY order_id, line_number""",

      // lineage of the static model graph: topology + all-succeeded
      // run replayed as literals
      "pipeline_lineage" ->
        """SELECT * FROM (VALUES
             ('dim_customer', 'marts', 2, 'stg_customer',
              'dim_order,fact_lineitem', 'succeeded', CAST(NULL AS VARCHAR)),
             ('dim_order', 'marts', 3, 'dim_customer',
              'fact_lineitem', 'succeeded', CAST(NULL AS VARCHAR)),
             ('dq_checks', 'quality', 5, 'fact_lineitem',
              '', 'succeeded', CAST(NULL AS VARCHAR)),
             ('extract_raw', 'sources', 0, '',
              'stg_customer,stg_events', 'succeeded', CAST(NULL AS VARCHAR)),
             ('fact_lineitem', 'marts', 4, 'dim_customer,dim_order',
              'dq_checks', 'succeeded', CAST(NULL AS VARCHAR)),
             ('stg_customer', 'staging', 1, 'extract_raw',
              'dim_customer', 'succeeded', CAST(NULL AS VARCHAR)),
             ('stg_events', 'staging', 1, 'extract_raw',
              '', 'succeeded', CAST(NULL AS VARCHAR))
           ) AS t(node_name, group_name, level, deps, dependents,
                  status, root_cause)
           ORDER BY node_name""",

      // routing outcome stated literally: prod carries the full
      // mart under its fixed schema, dev only its slice under the
      // per-developer namespace, the dropped CI schemas nothing
      "namespace_routing" ->
        """WITH m AS (
             SELECT o_orderpriority, count(*) AS n_orders
             FROM orders GROUP BY 1)
           SELECT 'analytics_mart' AS env_schema, o_orderpriority, n_orders
           FROM m
           UNION ALL
           SELECT 'ada', o_orderpriority, n_orders
           FROM m WHERE o_orderpriority = '1-URGENT'
           ORDER BY env_schema, o_orderpriority""",

      // the catalog is schema metadata — replayed literally
      "pipeline_catalog" ->
        """SELECT * FROM (VALUES
             ('dim_customer', 'marts', 2, 0, 'customer_id', 'bigint', true),
             ('dim_customer', 'marts', 2, 1, 'customer_name', 'string', true),
             ('dim_customer', 'marts', 2, 2, 'display_name', 'string', true),
             ('dim_customer', 'marts', 2, 3, 'account_balance', 'double', true),
             ('dim_customer', 'marts', 2, 4, 'market_segment', 'string', true),
             ('dim_customer', 'marts', 2, 5, 'nation_name', 'string', true),
             ('dim_customer', 'marts', 2, 6, 'region_name', 'string', true),
             ('dim_order', 'marts', 3, 0, 'customer_id', 'bigint', true),
             ('dim_order', 'marts', 3, 1, 'order_id', 'bigint', true),
             ('dim_order', 'marts', 3, 2, 'order_status', 'string', true),
             ('dim_order', 'marts', 3, 3, 'total_price', 'double', true),
             ('dim_order', 'marts', 3, 4, 'order_date', 'timestamp_ntz', true),
             ('dim_order', 'marts', 3, 5, 'order_priority', 'string', true),
             ('dim_order', 'marts', 3, 6, 'customer_name', 'string', true),
             ('dim_order', 'marts', 3, 7, 'market_segment', 'string', true),
             ('dim_order', 'marts', 3, 8, 'nation_name', 'string', true),
             ('fact_lineitem', 'marts', 4, 0, 'order_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 1, 'line_number', 'int', true),
             ('fact_lineitem', 'marts', 4, 2, 'part_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 3, 'supplier_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 4, 'quantity', 'double', true),
             ('fact_lineitem', 'marts', 4, 5, 'extended_price', 'double', true),
             ('fact_lineitem', 'marts', 4, 6, 'discount', 'double', true),
             ('fact_lineitem', 'marts', 4, 7, 'ship_date', 'timestamp_ntz', true),
             ('fact_lineitem', 'marts', 4, 8, 'customer_id', 'bigint', true),
             ('fact_lineitem', 'marts', 4, 9, 'order_status', 'string', true),
             ('fact_lineitem', 'marts', 4, 10, 'order_date', 'timestamp_ntz', true),
             ('fact_lineitem', 'marts', 4, 11, 'revenue', 'double', true),
             ('stg_customer', 'staging', 1, 0, 'customer_id', 'bigint', true),
             ('stg_customer', 'staging', 1, 1, 'customer_name', 'string', true),
             ('stg_customer', 'staging', 1, 2, 'nation_id', 'int', true),
             ('stg_customer', 'staging', 1, 3, 'account_balance', 'double', true),
             ('stg_customer', 'staging', 1, 4, 'market_segment', 'string', true)
           ) AS t(node_name, group_name, level, ordinal, column_name,
                  data_type, nullable)
           ORDER BY node_name, ordinal""",

      "dq_checks" ->
        """SELECT check_name, violations FROM (
             SELECT 'not_null_o_orderkey' AS check_name,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
             UNION ALL
             SELECT 'unique_o_orderkey',
               count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
             UNION ALL
             SELECT 'accepted_values_o_orderstatus',
               count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O','F','P')) FROM orders
             UNION ALL
             SELECT 'not_null_l_orderkey',
               count(*) FILTER (WHERE l_orderkey IS NULL) FROM lineitem
             UNION ALL
             SELECT 'accepted_values_l_returnflag',
               count(*) FILTER (WHERE l_returnflag IS NOT NULL
                 AND l_returnflag NOT IN ('A','N','R')) FROM lineitem
             UNION ALL
             SELECT 'relationships_l_orderkey', count(*) FROM (
               SELECT DISTINCT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL
                 AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) v
           ) ORDER BY check_name""",

      "dq_failing_rows" ->
        """SELECT * FROM (
             SELECT 'accepted_values_l_returnflag' AS check_name,
                    l_orderkey, l_linenumber
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
             UNION ALL
             SELECT 'not_null_l_orderkey', l_orderkey, l_linenumber
             FROM lineitem WHERE l_orderkey IS NULL
             UNION ALL
             SELECT 'unique_l_orderkey', l.l_orderkey, l.l_linenumber
             FROM lineitem l JOIN (
               SELECT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL
               GROUP BY 1 HAVING count(*) > 1) d USING (l_orderkey)
           ) ORDER BY check_name, l_orderkey, l_linenumber""",

      "dq_checks_status" ->
        """SELECT check_name, violations,
             CASE WHEN violations > 100 THEN 'error'
                  WHEN violations > 0 THEN 'warn'
                  ELSE 'pass' END AS status
           FROM (
             SELECT 'not_null_o_orderkey' AS check_name,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
             UNION ALL
             SELECT 'unique_o_orderkey',
               count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
             UNION ALL
             SELECT 'accepted_values_o_orderstatus',
               count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O','F')) FROM orders
           ) ORDER BY check_name""",

      "doc_token_count" ->
        s"""SELECT doc_id,
             $nWordsSql AS n_tokens_ws,
             CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(text, '[A-Za-z0-9]+'),
                 w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
               + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               AS BIGINT) AS n_tokens_bpe
           FROM documents ORDER BY doc_id""",

      "doc_quality" ->
        s"""SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             $nWordsSql AS n_words,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / nullif(CAST(length(text) AS BIGINT), 0) AS punct_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / nullif(CAST(length(text) AS BIGINT), 0) AS digit_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
               / nullif($nWordsSql, 0) AS avg_word_len,
             CAST(${stopHits(s"string_split($norm, ' ')", functions.Text.StopwordsEn)} AS DOUBLE)
               / nullif($nWordsSql, 0) AS stopword_ratio
           FROM documents ORDER BY doc_id""",

      // TextRank replay: per-doc unrolled integer PageRank rounds
      "doc_keywords" -> textRankSql(6, 5),

      // readability replay: the same three regex run-counts, the
      // same two double trees
      "doc_readability" ->
        """WITH c AS (
             SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
                 AS n_words,
               greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                 AS BIGINT), 1) AS n_sentences,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                 AS BIGINT) AS n_syllables
             FROM documents)
           SELECT doc_id, n_words, n_sentences, n_syllables,
             round(CASE WHEN n_words > 0 THEN
               0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               - 15.59 END, 6) AS fk_grade,
             round(CASE WHEN n_words > 0 THEN
               206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               END, 6) AS flesch_ease
           FROM c ORDER BY doc_id""",

      // moment-sum variance replay (the volumeAnomaly portability
      // argument); round(6) guards the cross-engine double sums
      "doc_quality_normalized" ->
        s"""WITH q AS (
             SELECT doc_id, source,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           st AS (
             SELECT source, count(*) AS n, sum(score) AS s1,
               sum(score * score) AS s2, min(score) AS mn, max(score) AS mx
             FROM q GROUP BY source)
           SELECT doc_id, q.source,
             CASE WHEN n < 2 OR (s2/n - (s1/n)*(s1/n)) <= 0 THEN NULL
               ELSE round((score - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)), 6)
             END AS score_z,
             CASE WHEN mx = mn THEN NULL
               ELSE round((score - mn) / (mx - mn), 6) END AS score_minmax
           FROM q JOIN st ON q.source = st.source ORDER BY doc_id""",

      // the operator's bucketed per-group scale path vs the naive
      // per-group rank window
      "doc_quality_top_frac" ->
        s"""WITH q AS (
             SELECT doc_id, source,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           r AS (
             SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY score DESC, doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS n
             FROM q)
           SELECT doc_id, source FROM r
           WHERE rnk <= CAST(ceil(0.3 * n) AS BIGINT) ORDER BY doc_id""",

      // the operator's bucketed scale path vs the naive global
      // running-sum window (monotone cum ⟹ WHERE cum <= budget IS the
      // maximal prefix)
      "corpus_select_budget" ->
        s"""WITH q AS (
             SELECT doc_id, $nWordsSql AS n_words,
               coalesce(CAST(${stopHits(s"string_split($norm, ' ')",
                  functions.Text.StopwordsEn)} AS DOUBLE)
                 / nullif($nWordsSql, 0), 0.0) AS score
             FROM documents),
           c AS (
             SELECT doc_id, n_words,
               sum(n_words) OVER (ORDER BY score DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM q)
           SELECT doc_id, n_words FROM c WHERE cum <= 15000
           ORDER BY doc_id""",

      // full DSIR replay: md5-slice bucket hashing, add-α smoothed
      // bucket log-ratios, per-doc dot product, top-k on the ROUNDED
      // score — every stage is portable arithmetic
      "select_dsir" ->
        s"""WITH w AS (
             SELECT doc_id, lang != 'en' AS cand,
               unnest(string_split($norm, ' ')) AS term FROM documents
           ), f AS (
             SELECT doc_id, cand,
               CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % 64 AS bucket
             FROM w WHERE length(term) > 0
           ), s AS (
             SELECT bucket,
               sum(CASE WHEN cand THEN 0 ELSE 1 END) AS t_b,
               sum(CASE WHEN cand THEN 1 ELSE 0 END) AS r_b
             FROM f GROUP BY bucket
           ), st AS (
             SELECT bucket,
               ln((t_b + 0.5) / ((SELECT sum(t_b) FROM s) + 32.0))
               - ln((r_b + 0.5) / ((SELECT sum(r_b) FROM s) + 32.0)) AS delta
             FROM s
           ), c AS (
             SELECT doc_id, bucket, count(*) AS c FROM f WHERE cand GROUP BY 1, 2
           ), sc AS (
             SELECT doc_id, round(sum(c * delta), 4) AS score,
               CAST(sum(c) AS BIGINT) AS n_tokens
             FROM c JOIN st USING (bucket) GROUP BY doc_id)
           SELECT doc_id, score, n_tokens, rank FROM (
             SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             FROM sc)
           WHERE rank <= 100 ORDER BY rank""",

      "doc_lang_id" ->
        s"""SELECT doc_id, $langPredCaseSql AS lang_pred
            FROM ($langPredBaseSql)
            ORDER BY doc_id""",

      // the heuristic's evaluation harness: predicted vs labeled
      // language, grouped — integer counts, the same prediction SQL
      "lang_id_confusion" ->
        s"""WITH pred AS (
              SELECT doc_id, $langPredCaseSql AS lang_pred
              FROM ($langPredBaseSql))
            SELECT d.lang, p.lang_pred, count(*) AS n_docs
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
            ORDER BY d.lang, p.lang_pred""",

      "multimodal_features" ->
        """WITH idx AS (
             SELECT doc_id, hex(encode(text)) AS hx,
                    unnest(generate_series(1, octet_length(encode(text)))) AS i
             FROM documents),
           ent AS (
             SELECT doc_id, round(entropy(substring(hx, 2*i - 1, 2)), 6) AS byte_entropy
             FROM idx GROUP BY doc_id)
           SELECT d.doc_id AS media_id,
                  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
                  coalesce(e.byte_entropy, 0.0) AS byte_entropy
           FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
           ORDER BY media_id""",

      "sample_split" ->
        """SELECT doc_id,
             CASE WHEN doc_id % 100 < 80 THEN 'train'
                  WHEN doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM documents ORDER BY doc_id""",

      // the REAL hash path: xxHash64 itself replayed in SQL, then the
      // same pmod-bucket label chain (thresholds round(f·1e6))
      "sample_split_hash" ->
        s"""SELECT doc_id,
             CASE WHEN ((h % 1000000) + 1000000) % 1000000 < 800000 THEN 'train'
                  WHEN ((h % 1000000) + 1000000) % 1000000 < 900000 THEN 'val'
                  ELSE 'test' END AS split
           FROM (${xxhash64LongSql("SELECT doc_id FROM documents", "doc_id", 42L)})
           ORDER BY doc_id""",

      // ranks the FULL stratum by the replayed xxHash64, so the
      // two-phase candidate pruning is graded against the naive form
      "sample_stratified_n" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // ξ replay: (h >> 11) & (2^53−1) is the 53-bit logical shift on
      // the signed hash; ·2⁻⁵³ exact; /w correctly rounded — the
      // ranking matches Spark bit-for-bit
      "sample_weighted_n" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 200 ORDER BY rank""",

      // per-stratum ξ ranking replay
      "sample_weighted_n_stratum" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 50 ORDER BY lang, rank""",

      // streaming state ≡ the batch per-stratum PPS operator over
      // everything seen — same ranking replay, no n_chars column in
      // the streamed output
      "stream_weighted_sample" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 50 ORDER BY lang, rank""",

      // fold ≡ full run (associative idempotent reduction) — same
      // oracle as sample_weighted_n
      "sample_weighted_n_incr" ->
        s"""SELECT doc_id, lang, n_chars, rank FROM (
             SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (ORDER BY xi, doc_id) AS INTEGER) AS rank
             FROM (SELECT doc_id, lang, n_chars,
                     CAST((h >> 11) & 9007199254740991 AS DOUBLE)
                       * (1.0 / 9007199254740992.0)
                       / CAST(n_chars AS DOUBLE) AS xi
                   FROM (${xxhash64LongSql(
                     "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
                     "doc_id", 42L, Seq("lang", "n_chars"))})))
           WHERE rank <= 200 ORDER BY rank""",

      // every event picks the SCD2 interval covering its OWN ts
      // (half-open, zero-width same-ts intervals match neither side)
      "stream_enrich_asof" ->
        """WITH h AS (
             SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS vf,
               CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS TIMESTAMP) AS vt
             FROM events)
           SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             h.event_id AS version_id, h.event_type AS state_at_event
           FROM events e LEFT JOIN h ON e.user_id = h.user_id
             AND h.vf <= CAST(e.ts AS TIMESTAMP)
             AND (h.vt IS NULL OR CAST(e.ts AS TIMESTAMP) < h.vt)
           ORDER BY e.event_id""",

      // stream-stream interval join: every (purchase, view-within-6h-
      // before) pair on the same user, stated directly as the
      // interval self-join the streaming state machine must equal
      "stream_correlate" ->
        """SELECT l.user_id, l.event_id AS purchase_id,
             CAST(l.ts AS TIMESTAMP) AS purchase_ts,
             r.event_id AS view_id, CAST(r.ts AS TIMESTAMP) AS view_ts
           FROM events l JOIN events r ON l.user_id = r.user_id
             AND r.ts >= l.ts - INTERVAL 6 HOUR AND r.ts <= l.ts
           WHERE l.event_type = 'purchase' AND r.event_type = 'view'
           ORDER BY purchase_id, view_id""",

      // streaming state ≡ batch operator over everything seen: the
      // same full-corpus ranking replay grades the stream's final view
      "stream_stratified_sample" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // fold ≡ full: the incremental form is graded by the same
      // full-corpus ranking replay
      "sample_stratified_n_incr" ->
        s"""SELECT doc_id, lang, rank FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             FROM (${xxhash64LongSql("SELECT doc_id, lang FROM documents",
                      "doc_id", 42L, Seq("lang"))}))
           WHERE rank <= 100 ORDER BY lang, rank""",

      // naive per-group rank-window replay of the 256-bucket scale
      // path; pos = (r−0.5)/n is one exact subtraction + one
      // correctly-rounded division → bit-identical doubles
      "corpus_interleave" ->
        s"""WITH r AS (
             SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS n
             FROM (${xxhash64LongSql("SELECT doc_id, source FROM documents",
                      "doc_id", 42L, Seq("source"))})
           ), p AS (
             SELECT doc_id, source,
               (CAST(r AS DOUBLE) - 0.5) / CAST(n AS DOUBLE) AS pos FROM r)
           SELECT doc_id, source, pos,
             row_number() OVER (ORDER BY pos, source, doc_id) AS seq
           FROM p ORDER BY seq""",

      // the writer's manifest replayed: pmod(xxhash64(id, 42), 8)
      // shard assignment, per-shard counts and hash ranges
      "corpus_shards" ->
        s"""SELECT CAST(shard AS INTEGER) AS shard,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(h) AS min_hash, max(h) AS max_hash
           FROM (SELECT ((h % 8) + 8) % 8 AS shard, h
                 FROM (${xxhash64LongSql("SELECT doc_id FROM documents",
                          "doc_id", 42L)}))
           GROUP BY shard ORDER BY shard""",

      "corpus_top_terms" ->
        s"""WITH words AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term
             FROM documents)
           SELECT term, tf, doc_freq FROM (
             SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
             FROM words WHERE length(term) > 0 GROUP BY term)
           ORDER BY tf DESC, term LIMIT 100""",

      "doc_repetition" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS w FROM documents
           ), f AS (
             SELECT doc_id, w, count(*) AS c FROM w
             WHERE length(w) > 0 GROUP BY doc_id, w)
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             count(*) AS n_distinct_words,
             round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_word_frac
           FROM f GROUP BY doc_id ORDER BY doc_id""",

      "doc_quality_filter" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS w FROM documents
           ), f AS (
             SELECT doc_id, w, count(*) AS c FROM w
             WHERE length(w) > 0 GROUP BY doc_id, w
           ), m AS (
             SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               count(*) / CAST(sum(c) AS DOUBLE) AS distinct_ratio,
               max(c) / CAST(sum(c) AS DOUBLE) AS top_word_frac
             FROM f GROUP BY doc_id)
           SELECT doc_id, n_words,
             CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_words > 1000 THEN 'too_long'
                  WHEN distinct_ratio < 0.4 THEN 'low_diversity'
                  WHEN top_word_frac > 0.12 THEN 'repetitive'
                  ELSE 'keep' END AS reason,
             (CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_words > 1000 THEN 'too_long'
                  WHEN distinct_ratio < 0.4 THEN 'low_diversity'
                  WHEN top_word_frac > 0.12 THEN 'repetitive'
                  ELSE 'keep' END) = 'keep' AS keep
           FROM m ORDER BY doc_id""",

      // segment-level dedup (r9): 20-word windows, keep-first by
      // (doc_id, seg_no); DuckDB marks winners with a row_number
      // window ≡ Spark's min(struct) per segment hash
      "dedup_segments" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), marked AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
             FROM segs)
           SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1) AS text_dedup,
             count(*) AS n_segments,
             count(*) FILTER (WHERE rn = 1) AS n_kept
           FROM marked GROUP BY doc_id ORDER BY doc_id""",

      // the streaming segment gate: because batches split on
      // ascending doc_id and keep-first orders by (doc_id, seg_no),
      // the gate's accumulated corpus equals the full-corpus batch
      // run restricted to docs that kept at least one segment
      "stream_segdedup_gate" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), marked AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
             FROM segs)
           SELECT doc_id, text, n_segments, n_kept FROM (
             SELECT doc_id,
               string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1) AS text,
               count(*) AS n_segments,
               count(*) FILTER (WHERE rn = 1) AS n_kept
             FROM marked GROUP BY doc_id)
           WHERE text IS NOT NULL ORDER BY doc_id""",

      // incremental segment dedup (r9): the index is the first
      // half's distinct segments; batch winners must also be unseen
      "dedup_segments_incr" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), segs AS (
             SELECT doc_id, i AS seg_no,
               array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS seg
             FROM w, LATERAL (SELECT unnest(range((len(ws)+19)//20)) AS i)
           ), idx AS (
             SELECT DISTINCT seg FROM segs WHERE doc_id < 250
           ), nb AS (
             SELECT doc_id, seg_no, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn,
               seg IN (SELECT seg FROM idx) AS seen
             FROM segs WHERE doc_id >= 250)
           SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_no)
               FILTER (WHERE rn = 1 AND NOT seen) AS text_dedup,
             count(*) AS n_segments,
             count(*) FILTER (WHERE rn = 1 AND NOT seen) AS n_kept
           FROM nb GROUP BY doc_id ORDER BY doc_id""",

      // Zipf OLS fit (r9): same closed-form sums as Text.zipfFit —
      // identical formula both engines, round(6) absorbs sum order
      "corpus_zipf" ->
        s"""WITH words AS (
             SELECT unnest(string_split($norm, ' ')) AS term FROM documents
           ), tf AS (
             SELECT term, count(*) AS tf FROM words
             WHERE length(term) > 0 GROUP BY term
           ), top AS (
             SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT 100
           ), ranked AS (
             SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, term) AS DOUBLE)) AS x,
                    ln(CAST(tf AS DOUBLE)) AS y
             FROM top
           ), s AS (
             SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
             FROM ranked)
           SELECT CAST(n AS BIGINT) AS n_terms,
             round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
             round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept,
             round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                   / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
           FROM s""",

      "doc_tfidf" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents
           ), wf AS (
             SELECT doc_id, term FROM w WHERE length(term) > 0
           ), tf AS (
             SELECT doc_id, term, count(*) AS tf FROM wf GROUP BY doc_id, term
           ), df AS (
             SELECT term, count(DISTINCT doc_id) AS doc_freq FROM wf GROUP BY term)
           SELECT doc_id, term, tf, doc_freq,
             round(tf * ln((SELECT count(*) FROM documents)
               / CAST(doc_freq AS DOUBLE)), 6) AS tfidf
           FROM tf JOIN df USING (term)
           ORDER BY doc_id, term""",

      // BM25 replay: the same left-to-right IEEE arithmetic as the
      // Spark scorer (exact-integer sums, correctly-rounded divisions,
      // fixed term order), ranked on the ROUNDED score
      // PMI replay: same integer counts, the same multiply/divide
      // tree under one ln, rank on the rounded score
      "corpus_collocations" ->
        s"""WITH d AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), toks AS (
             SELECT unnest(ws) AS term FROM d
           ), uni AS (
             SELECT term, count(*) AS c FROM toks
             WHERE length(term) > 0 GROUP BY 1
           ), nt AS (SELECT sum(c) AS n_tok FROM uni
           ), pq AS (
             SELECT unnest([ws[i] || ' ' || ws[i+1]
               for i in range(1, len(ws))]) AS p
             FROM d WHERE len(ws) >= 2
           ), bi0 AS (
             SELECT string_split(p, ' ')[1] AS term_a,
               string_split(p, ' ')[2] AS term_b, count(*) AS n_pair
             FROM pq GROUP BY 1, 2
           ), nb AS (SELECT sum(n_pair) AS n_big FROM bi0
           ), sc AS (
             SELECT term_a, term_b, n_pair,
               round(ln((n_pair * CAST(n_tok AS DOUBLE) * n_tok)
                 / (CAST(n_big AS DOUBLE) * ca.c * cb.c)), 6) AS pmi
             FROM bi0
             CROSS JOIN nt CROSS JOIN nb
             JOIN uni ca ON ca.term = bi0.term_a
             JOIN uni cb ON cb.term = bi0.term_b
             WHERE n_pair >= 5)
           SELECT term_a, term_b, CAST(n_pair AS BIGINT) AS n_pair, pmi
           FROM sc
           QUALIFY row_number() OVER (ORDER BY pmi DESC, term_a, term_b) <= 50
           ORDER BY pmi DESC, term_a, term_b""",

      // shared by the full-scan and maintained-index forms: per-doc
      // index rows + integer stat adds make the index answer exactly
      // like a re-scan
      "corpus_bm25_topk" -> bm25TopkOracleSql,
      "search_ndcg" -> ndcgOracleSql,
      "corpus_bm25_incr" -> bm25TopkOracleSql,

      "doc_surprisal" ->
        s"""WITH w AS (
             SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents
           ), wf AS (
             SELECT doc_id, term FROM w WHERE length(term) > 0
           ), tf AS (
             SELECT doc_id, term, count(*) AS tf FROM wf GROUP BY 1, 2
           ), ct AS (
             SELECT term, count(*) AS c_t FROM wf GROUP BY term
           ), tot AS (SELECT sum(c_t) AS c_total FROM ct)
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
             round(sum(tf * ln(c_t / c_total)) / sum(tf), 4) AS avg_logprob
           FROM tf JOIN ct USING (term), tot
           GROUP BY doc_id ORDER BY doc_id""",

      // n-gram repetition: occurrence-share of the top gram and of
      // all grams occurring ≥2× (position-order grams, dupes kept)
      "doc_ngram_repetition" ->
        s"""WITH ex AS (
             SELECT doc_id, unnest(grams) AS g
             FROM (${gramsSql(3, distinct = false)})
           ), c AS (
             SELECT doc_id, g, count(*) AS c FROM ex GROUP BY 1, 2)
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_ngram_frac,
             round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
               / CAST(sum(c) AS DOUBLE), 6) AS dup_ngram_frac
           FROM c GROUP BY doc_id ORDER BY doc_id""",

      // bigram conditional surprisal: p(b|a) = C(a,b)/C(a,·) over
      // bigram-start counts, avg ln p per doc, round(4)
      "doc_bigram_surprisal" ->
        s"""WITH w AS (
             SELECT doc_id, string_split($norm, ' ') AS ws FROM documents
           ), b0 AS (
             SELECT doc_id,
               unnest([struct_pack(a := ws[i+1], b := ws[i+2])
                       for i in range(0, len(ws) - 1)]) AS bg
             FROM w WHERE len(ws) >= 2
           ), bi AS (
             SELECT doc_id, bg.a AS a, bg.b AS b FROM b0
           ), tf AS (
             SELECT doc_id, a, b, count(*) AS tf FROM bi GROUP BY 1, 2, 3
           ), cab AS (
             SELECT a, b, count(*) AS c_ab FROM bi GROUP BY 1, 2
           ), ca AS (
             SELECT a, count(*) AS c_a FROM bi GROUP BY 1)
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             round(sum(tf * ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)))
               / CAST(sum(tf) AS DOUBLE), 4) AS avg_logprob
           FROM tf JOIN cab USING (a, b) JOIN ca USING (a)
           GROUP BY doc_id ORDER BY doc_id""",

      // the REAL hash mix: quota thresholds (round(min(1,q/n)·1e6))
      // against the replayed-xxHash64 bucket — full rows
      "sample_mix" ->
        s"""WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents),
           w(r, mix_source, wt) AS (VALUES
             (0, 'web', 0.6), (1, 'code', 0.3), (2, 'books', 0.1)),
           n AS (SELECT r, count(*) AS n FROM d GROUP BY r),
           tw AS (SELECT CAST(0.6 AS DOUBLE) + CAST(0.3 AS DOUBLE)
                         + CAST(0.1 AS DOUBLE) AS tw),
           p AS (SELECT w.r, w.mix_source,
                   CAST(round(least(1.0,
                     300.0 * CAST(wt AS DOUBLE) / tw / n) * 1000000) AS BIGINT) AS thresh
                 FROM w JOIN n USING (r), tw),
           hx AS (${xxhash64LongSql(
                     "SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents",
                     "doc_id", 42L, keep = Seq("r"))})
           SELECT doc_id, mix_source FROM hx JOIN p USING (r)
           WHERE ((h % 1000000) + 1000000) % 1000000 < thresh
           ORDER BY doc_id""",

      // the hash-path temperature resample: w=power(n,0.5) thresholds
      // (the sample_temperature arithmetic at buckets=1e6) against the
      // replayed-xxHash64 bucket
      "sample_temperature_hash" ->
        s"""WITH d AS (
             SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
             FROM documents
           ), s AS (
             SELECT len_bucket, count(*) AS n, power(count(*), 0.5) AS w
             FROM d GROUP BY len_bucket
           ), t AS (SELECT sum(w) AS tw FROM s),
           p AS (
             SELECT len_bucket,
               CAST(round(least(1.0, 200.0 * w / tw / n) * 1000000) AS BIGINT) AS thresh
             FROM s, t),
           hx AS (${xxhash64LongSql(
                     """SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
                        FROM documents""",
                     "doc_id", 42L, keep = Seq("len_bucket"))})
           SELECT doc_id, len_bucket FROM hx JOIN p USING (len_bucket)
           WHERE ((h % 1000000) + 1000000) % 1000000 < thresh
           ORDER BY doc_id""",

      // the mix twin replicates the whole quota arithmetic in SQL:
      // quota=T·w/Σw, thresh=round(min(1,quota/n)·buckets), keep iff
      // doc_id % buckets < thresh (weights cast to DOUBLE so the SQL
      // arithmetic is the same IEEE sequence Spark runs)
      "sample_mix_mod" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS r FROM documents),
           w(r, mix_source, wt) AS (VALUES
             (0, 'web', 0.6), (1, 'code', 0.3), (2, 'books', 0.1)),
           n AS (SELECT r, count(*) AS n FROM d GROUP BY r),
           -- Σw summed left-to-right in DOUBLE, exactly as Scala's
           -- Seq.sum folds it (0.6+0.3+0.1 is NOT 1.0 in IEEE doubles)
           tw AS (SELECT CAST(0.6 AS DOUBLE) + CAST(0.3 AS DOUBLE)
                         + CAST(0.1 AS DOUBLE) AS tw),
           p AS (SELECT w.r, w.mix_source,
                   CAST(round(least(1.0,
                     300.0 * CAST(wt AS DOUBLE) / tw / n) * 100) AS BIGINT) AS thresh
                 FROM w JOIN n USING (r), tw)
           SELECT doc_id, mix_source FROM d JOIN p USING (r)
           WHERE doc_id % 100 < thresh ORDER BY doc_id""",

      // the modulo twin replicates the whole threshold arithmetic in
      // SQL: w=power(n,alpha), thresh=round(min(1,T*w/tw/n)*buckets),
      // keep iff doc_id % buckets < thresh
      "sample_temperature" ->
        """WITH d AS (
             SELECT doc_id, CAST(floor(length(text) / 400) AS BIGINT) AS len_bucket
             FROM documents
           ), s AS (
             SELECT len_bucket, count(*) AS n, power(count(*), 0.5) AS w
             FROM d GROUP BY len_bucket
           ), t AS (SELECT sum(w) AS tw FROM s),
           p AS (
             SELECT len_bucket,
               CAST(round(least(1.0, 200.0 * w / tw / n) * 100) AS BIGINT) AS thresh
             FROM s, t)
           SELECT doc_id, len_bucket FROM d JOIN p USING (len_bucket)
           WHERE doc_id % 100 < thresh ORDER BY doc_id""",

      // same seeded text, same RE2-compatible patterns, 'g' = replace
      // all (Spark's regexp_replace default)
      "doc_pii_redact" ->
        """WITH seeded AS (
             SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com see https://ex.org/p/'
                    || CAST(doc_id AS VARCHAR) || ' from 10.1.2.3' AS text
             FROM documents)
           SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS redacted,
             CAST(length(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(length(regexp_extract_all(text,
               'https?://[^\s]+')) AS BIGINT) AS n_urls,
             CAST(length(regexp_extract_all(text,
               '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips
           FROM seeded ORDER BY doc_id""",

      // the column-level scan: same patterns, same seeded corpus;
      // one UNION-ALL arm per (column, kind)
      "pii_column_scan" -> {
        val kinds = Seq(
          "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
          "url" -> """https?://[^\s]+""",
          "ipv4" -> """([0-9]{1,3}\.){3}[0-9]{1,3}""")
        val arms = for {
          c <- Seq("text", "lang", "source"); (k, p) <- kinds
        } yield
          s"""SELECT '$c' AS column_name, '$k' AS pii_kind,
                count(*) AS n_rows,
                CAST(sum(CASE WHEN len(regexp_extract_all($c, '$p')) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_hit,
                CAST(sum(len(regexp_extract_all($c, '$p'))) AS BIGINT) AS n_hits
              FROM seeded"""
        s"""WITH seeded AS (
             SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com see https://ex.org/p/'
                    || CAST(doc_id AS VARCHAR) || ' from 10.1.2.3' AS text,
               lang, source
             FROM documents)
           SELECT * FROM (${arms.mkString(" UNION ALL ")})
           ORDER BY column_name, pii_kind"""
      },

      // k-anonymity replay: class sizes + distinct-sensitive floors,
      // integer throughout, one risk_share division
      // t-closeness replay: observed cells only (absent values via
      // the 1 − Σp_g algebra), rounded-6/1e6-scaled terms, integer
      // class sums, the t comparison on the ROUNDED distance
      "dq_t_closeness" ->
        """WITH c AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000.0) AS INT) AS v
             FROM customer
           ), cells AS (
             SELECT c_nationkey, c_mktsegment, v, count(*) AS cc
             FROM c GROUP BY 1, 2, 3
           ), g AS (
             SELECT v, CAST(sum(cc) AS BIGINT) AS gg FROM cells GROUP BY 1
           ), nn AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM cells
           ), sz AS (
             SELECT c_nationkey, c_mktsegment, CAST(sum(cc) AS BIGINT)
               AS nc
             FROM cells GROUP BY 1, 2
           ), terms AS (
             SELECT cells.c_nationkey, cells.c_mktsegment, sz.nc,
               CAST(round((abs(CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)
                 - CAST(gg AS DOUBLE) / CAST(n AS DOUBLE))
                 - CAST(gg AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
                 AS BIGINT) AS t6
             FROM cells
             JOIN g ON cells.v IS NOT DISTINCT FROM g.v
             JOIN sz
               ON cells.c_nationkey IS NOT DISTINCT FROM sz.c_nationkey
               AND cells.c_mktsegment IS NOT DISTINCT FROM sz.c_mktsegment
             CROSS JOIN nn
           ), a AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(min(nc) AS BIGINT) AS n_rows,
               CAST(CAST(sum(t6) + 1000000 AS BIGINT) AS DOUBLE)
                 / 2000000.0 AS tv_distance
             FROM terms GROUP BY 1, 2)
           SELECT c_nationkey, c_mktsegment, n_rows, tv_distance,
             tv_distance <= 0.2 AS is_t_close
           FROM a ORDER BY c_nationkey, c_mktsegment""",

      "pii_k_anonymity" ->
        """WITH cls AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l
             FROM customer GROUP BY 1, 2
           ), a AS (
             SELECT CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(n) AS BIGINT) AS min_class_size,
               CAST(coalesce(sum(CASE WHEN n < 10 THEN n ELSE 0 END), 0)
                 AS BIGINT) AS risk_rows,
               CAST(min(l) AS BIGINT) AS l_min
             FROM cls)
           SELECT n_rows, n_classes, min_class_size, risk_rows, l_min,
             round(CAST(risk_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
               AS risk_share,
             min_class_size >= 10 AS is_k_anonymous
           FROM a""",

      "dq_numeric_profile" ->
        """SELECT column_name, n_rows, n_null, min_value, max_value, p50, p90 FROM (
             SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
               count(*) FILTER (WHERE o_custkey IS NULL) AS n_null,
               CAST(min(o_custkey) AS DOUBLE) AS min_value,
               CAST(max(o_custkey) AS DOUBLE) AS max_value,
               quantile_cont(CAST(o_custkey AS DOUBLE), 0.5) AS p50,
               quantile_cont(CAST(o_custkey AS DOUBLE), 0.9) AS p90
             FROM orders
             UNION ALL
             SELECT 'o_totalprice', count(*),
               count(*) FILTER (WHERE o_totalprice IS NULL),
               CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9)
             FROM orders
           ) ORDER BY column_name""",

      "decontamination" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_t AS (
             SELECT doc_id AS train_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 <> 0
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), pairs AS (
             SELECT eval_id, train_id, count(*) AS n_common
             FROM sh_e JOIN sh_t USING (gram)
             GROUP BY eval_id, train_id
             HAVING count(*) >= 3)
           SELECT eval_id, worst_train_id, n_common FROM (
             SELECT eval_id, train_id AS worst_train_id, n_common,
               row_number() OVER (PARTITION BY eval_id
                 ORDER BY n_common DESC, train_id DESC) AS rn
             FROM pairs)
           WHERE rn = 1 ORDER BY eval_id""",

      // the direction-flipped delta form: per BATCH doc (train docs
      // with id >= 250), worst offending eval doc
      "decontamination_incr" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_b AS (
             SELECT doc_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 <> 0 AND doc_id >= 250
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), pairs AS (
             SELECT b.doc_id, eval_id, count(*) AS n_common
             FROM sh_b b JOIN sh_e USING (gram)
             GROUP BY b.doc_id, eval_id
             HAVING count(*) >= 3)
           SELECT doc_id, worst_eval_id, n_common FROM (
             SELECT doc_id, eval_id AS worst_eval_id, n_common,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY n_common DESC, eval_id DESC) AS rn
             FROM pairs)
           WHERE rn = 1 ORDER BY doc_id""",

      // the streaming gate's corpus: the eval index is static and
      // flagging is per-doc, so the result is batch-split invariant —
      // train docs minus any sharing >= 3 trigrams with an eval doc
      // the gate verdict is per-doc ⇒ the streamed two-day + replay
      // run equals one batch filter over the padded normalized text
      "stream_phrase_gate" ->
        """SELECT doc_id, text FROM (
             SELECT doc_id, text,
               ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' ' AS p
             FROM documents)
           WHERE NOT contains(p, ' table table ')
             AND NOT contains(p, ' value table ')
           ORDER BY doc_id""",

      "stream_decontam_gate" ->
        s"""WITH sh AS (
             SELECT doc_id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), sh_b AS (
             SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 10 <> 0
           ), sh_e AS (
             SELECT doc_id AS eval_id, unnest(sh) AS gram FROM sh
             WHERE doc_id % 10 = 0
           ), bad AS (
             SELECT DISTINCT doc_id FROM (
               SELECT b.doc_id, eval_id, count(*) AS n_common
               FROM sh_b b JOIN sh_e USING (gram)
               GROUP BY b.doc_id, eval_id
               HAVING count(*) >= 3))
           SELECT doc_id, text FROM documents
           WHERE doc_id % 10 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM bad)
           ORDER BY doc_id""",

      "curation_pipeline" ->
        s"""WITH quality AS (
             SELECT doc_id, text FROM documents
             WHERE $nWordsSql >= 5
               AND ${stopHits(s"string_split($norm, ' ')", functions.Text.StopwordsEn)} > 0
           ), keepers AS (
             SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5($norm)
           ), survivors AS (
             SELECT q.doc_id, q.text FROM quality q
             JOIN keepers k ON q.doc_id = k.doc_id
           ), sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM survivors)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh
           ), losers AS (
             SELECT DISTINCT id_b AS doc_id FROM (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(count(*) AS DOUBLE)
                   / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
               FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
               GROUP BY a.id, b.id, a.cnt, b.cnt)
             WHERE jaccard >= 0.5
           )
           SELECT s.doc_id,
             CASE WHEN s.doc_id % 100 < 80 THEN 'train'
                  WHEN s.doc_id % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM survivors s
           WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
           ORDER BY s.doc_id""",

      // chunking replayed: same last-start ceil arithmetic, same
      // 1-based inclusive slice bounds, same min(window, n-start)
      // chunk length
      "doc_chunk" ->
        """WITH w AS (
             SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
             FROM documents
           ), n AS (
             SELECT doc_id, ts, len(ts) AS n FROM w
           ), c AS (
             SELECT doc_id, ts, n, unnest(range(0,
               CASE WHEN n <= 32 THEN 1
                    ELSE CAST(ceil(CAST(n - 32 AS DOUBLE) / 24) AS INT) + 1
               END)) AS chunk_id
             FROM n)
           SELECT doc_id, chunk_id,
             array_to_string(
               ts[chunk_id*24 + 1 : chunk_id*24 + least(32, n - chunk_id*24)],
               ' ') AS chunk_text,
             least(32, n - chunk_id*24) AS n_tokens
           FROM c ORDER BY doc_id, chunk_id""",

      // md5-slice of the normalized text — both engines hash the same
      // UTF-8 bytes, so the full-row fingerprint grades bit-exact
      "doc_fingerprint_md5" ->
        s"""SELECT doc_id,
             ${md5Hash60Sql(norm)} AS fingerprint
           FROM documents ORDER BY doc_id""",

      // winnowing replayed end-to-end: k=5 gram sequence (duplicates
      // kept, position order), w=4 window minima, distinct sort
      "doc_winnow_md5" ->
        s"""SELECT doc_id, unnest(sel) AS fingerprint
           FROM (${winnowSql(5, 4)})
           ORDER BY doc_id, fingerprint""",

      // sharedRuns replayed: winnow fingerprint sets → document
      // frequency cap (df ≤ 200) → pair shared-fingerprint counts
      "doc_shared_runs_md5" ->
        s"""WITH fp AS (
             SELECT doc_id, unnest(sel) AS fp FROM (${winnowSql(5, 4)})
           ), kept AS (
             SELECT * FROM fp WHERE fp IN (
               SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 200))
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 1
           ORDER BY id_a, id_b""",

      // the incremental twin: merged-df cap + same fingerprints ⇒
      // the delta path equals the full run restricted to pairs whose
      // later doc is in the batch (id_b ≥ cut)
      "doc_shared_runs_incr_md5" ->
        s"""WITH fp AS (
             SELECT doc_id, unnest(sel) AS fp FROM (${winnowSql(5, 4)})
           ), kept AS (
             SELECT * FROM fp WHERE fp IN (
               SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 200))
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
             AND b.doc_id >= 250
           GROUP BY 1, 2 HAVING count(*) >= 1
           ORDER BY id_a, id_b""",

      "dedup_exact" ->
        s"""SELECT md5($norm) AS content_hash,
             min(doc_id) AS keeper_id, count(*) AS n_copies
           FROM documents GROUP BY 1 ORDER BY content_hash""",

      "dedup_exact_incremental" ->
        s"""WITH ex AS (
             SELECT DISTINCT md5($norm) AS content_hash
             FROM documents WHERE doc_id < 250
           ), nb AS (
             SELECT md5($norm) AS content_hash, doc_id
             FROM documents WHERE doc_id >= 250)
           SELECT content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
           FROM nb WHERE content_hash NOT IN (SELECT content_hash FROM ex)
           GROUP BY 1 ORDER BY content_hash""",

      // the oracle is the definition: a quadratic levenshtein join
      // over the same seeded corpus (the custkey cap in the query
      // bounds it); length-band prefilter only cuts oracle runtime
      "dedup_edit_distance" ->
        """WITH seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.s, c.s) AS INTEGER) AS dist
           FROM corpus a JOIN corpus c
             ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
           WHERE levenshtein(a.s, c.s) <= 2
           ORDER BY id_a, id_b""",

      // recursive closure over the definitional levenshtein pair join
      "dedup_edit_clusters" ->
        """WITH RECURSIVE seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0
           ), pairs AS (
             SELECT a.id AS id_a, c.id AS id_b
             FROM corpus a JOIN corpus c
               ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
             WHERE levenshtein(a.s, c.s) <= 2
           ), edges AS (
             SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs
           ), reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.id
           )
           SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",

      // the full quadratic join restricted to batch-touching pairs
      // (batch = the mutated ids ≥ 10M) — the delta path must equal it
      "dedup_edit_distance_incr" ->
        """WITH seeds AS (
             SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS b,
               CAST(c_custkey % 11 + 1 AS INTEGER) AS pos
             FROM customer WHERE c_custkey <= 2000
           ), corpus AS (
             SELECT c_custkey AS id, b AS s FROM seeds
             UNION ALL
             SELECT c_custkey + 10000000,
               CASE CAST(c_custkey % 3 AS INTEGER)
                 WHEN 0 THEN substr(b, 1, pos - 1) || 'z' || substr(b, pos + 1, 12)
                 WHEN 1 THEN substr(b, 1, pos - 1) || substr(b, pos + 1, 12)
                 ELSE substr(b, 1, pos) || 'z' || substr(b, pos + 1, 12) END
             FROM seeds WHERE c_custkey % 7 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.s, c.s) AS INTEGER) AS dist
           FROM corpus a JOIN corpus c
             ON a.id < c.id AND abs(length(a.s) - length(c.s)) <= 2
           WHERE levenshtein(a.s, c.s) <= 2
             AND (a.id >= 10000000 OR c.id >= 10000000)
           ORDER BY id_a, id_b""",

      "dedup_rate_report" ->
        s"""SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             count(*) AS n_distinct,
             CAST(sum(c) - count(*) AS BIGINT) AS dup_docs,
             round((sum(c) - count(*)) / CAST(sum(c) AS DOUBLE), 6) AS dup_rate
           FROM (SELECT source, md5($norm) AS h, count(*) AS c
                 FROM documents GROUP BY 1, 2)
           GROUP BY source ORDER BY source""",

      "dedup_ngram_jaccard" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh)
           SELECT id_a, id_b, jaccard FROM (
             SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS DOUBLE)
                 / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
             FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
             GROUP BY a.id, b.id, a.cnt, b.cnt)
           WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

      // the incremental twin: exact merged-df semantics ⇒ the delta
      // path equals the full pipeline restricted to id_b ≥ cut
      "dedup_ngram_jaccard_incr" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, list_distinct(
               CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
               ELSE list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END) AS sh
             FROM (SELECT doc_id, string_split($norm, ' ') AS words FROM documents)
           ), ex AS (
             SELECT id, CAST(len(sh) AS BIGINT) AS cnt, unnest(sh) AS gram FROM sh)
           SELECT id_a, id_b, jaccard FROM (
             SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS DOUBLE)
                 / CAST(a.cnt + b.cnt - count(*) AS DOUBLE) AS jaccard
             FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
               AND b.id >= 250
             GROUP BY a.id, b.id, a.cnt, b.cnt)
           WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

      // the full MinHash-LSH pipeline replayed: md5-slice shingle
      // hash, Kirsch–Mitzenmacher h1/h2 (h2 = xxhash64(h1') replayed
      // via the xxHash64 chain), 32 min-signature slots, 16 2-row
      // bands (tuple equality ≡ Spark's band-bucket hash equality),
      // exact-Jaccard rescore on the distinct shingle sets
      "dedup_minhash_md5" -> minhashMd5Sql(pairWhere = ""),

      // the incremental twin: identical hashes + banding ⇒ the delta
      // path's output is EXACTLY the full run's pairs that touch the
      // batch (id_b ≥ cut) — so the oracle is the same pipeline with
      // that one restriction
      "dedup_minhash_incr_md5" ->
        minhashMd5Sql(pairWhere = "AND c.doc_id >= 250"),

      // the two-day group-store run: day 1 emits pairs whose later
      // doc is in [200,350), day 2 those ≥ 350 — together exactly
      // the full run's pairs with id_b ≥ 200
      "dedup_minhash_vg_md5" ->
        minhashMd5Sql(pairWhere = "AND c.doc_id >= 200"),

      // the streaming ingest gate's two-stage semantics (NOT the
      // batch pairs-losers run): day-1 losers come from pairs wholly
      // inside day 1; day-2 losers from pairs whose earlier side
      // SURVIVED day 1 (gated-out docs never enter the index) or is
      // intra-day-2; the corpus is everything never a loser
      "stream_neardup_gate" ->
        s"""WITH pairs AS (SELECT id_a, id_b FROM (${minhashMd5Sql("")})),
             l1 AS (SELECT DISTINCT id_b FROM pairs WHERE id_b < 250),
             l2 AS (SELECT DISTINCT p.id_b FROM pairs p
                    WHERE p.id_b >= 250
                      AND (p.id_a >= 250
                           OR p.id_a NOT IN (SELECT id_b FROM l1)))
           SELECT doc_id, text FROM documents
           WHERE doc_id NOT IN (SELECT id_b FROM l1)
             AND doc_id NOT IN (SELECT id_b FROM l2)
           ORDER BY doc_id""",

      // SimHash replayed: per-bit votes over the md5-slice shingle
      // hashes, majority signature, 4×16-bit pigeonhole blocks,
      // hamming ≤ 3 verify via bit_count(xor)
      "dedup_simhash_md5" -> simhashMd5Sql(pairWhere = ""),

      // the incremental twin: same signatures + same blocks ⇒ the
      // delta path equals the full run restricted to id_b ≥ cut
      "dedup_simhash_incr_md5" ->
        simhashMd5Sql(pairWhere = "AND c.doc_id >= 250"),

      // containment replay on gram STRINGS (the engine's xxhash64
      // longs are a w.h.p.-collision-free stand-in — the
      // dedup_ngram_jaccard precedent)
      "doc_containment" ->
        s"""WITH g AS (
             SELECT doc_id, unnest(grams) AS gram
             FROM (${gramsSql(3, distinct = true)})
           ), q AS (
             SELECT doc_id AS query_id, gram FROM g WHERE doc_id IN (0, 1, 2)
           ), qs AS (
             SELECT query_id, count(*) AS qn FROM q GROUP BY 1
           ), j AS (
             SELECT q.query_id, g.doc_id, count(*) AS n_common
             FROM g JOIN q USING (gram) WHERE g.doc_id != q.query_id
             GROUP BY 1, 2)
           SELECT query_id, doc_id, n_common,
             round(n_common / CAST(qn AS DOUBLE), 6) AS containment
           FROM j JOIN qs USING (query_id)
           WHERE round(n_common / CAST(qn AS DOUBLE), 6) >= 0.02
           ORDER BY query_id, doc_id""",

      // same block key, same threshold — plain SQL replays the whole
      // candidate pass (levenshtein is engine-agnostic: edit distance
      // is a unique integer)
      "er_fuzzy_pairs" ->
        """WITH b AS (
             SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS blk FROM part
             WHERE p_partkey % 4 = 0)
           SELECT a.id AS id_a, c.id AS id_b,
             CAST(levenshtein(a.name, c.name) AS INT) AS dist
           FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
           WHERE levenshtein(a.name, c.name) <= 2
           ORDER BY id_a, id_b""",

      // golden-record replay: same pairs → recursive-reachability
      // components → per-attribute survivorship with identical
      // tie-breaks (len desc/value asc, cnt desc/value asc)
      "er_golden_record" ->
        """WITH RECURSIVE b AS (
             SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS blk FROM part
             WHERE p_partkey % 4 = 0
           ), pairs AS (
             SELECT a.id AS id_a, c.id AS id_b
             FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
             WHERE levenshtein(a.name, c.name) <= 2
           ), edges AS (
             SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs
           ), reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, rch.r FROM edges e JOIN reach rch ON e.dst = rch.id
           ), cmp AS (
             SELECT id, min(r) AS comp FROM reach GROUP BY id
           ), m AS (
             SELECT coalesce(c.comp, p.p_partkey) AS comp, p.*
             FROM part p LEFT JOIN cmp c ON p.p_partkey = c.id
             WHERE p.p_partkey % 4 = 0
           ), sz AS (
             SELECT comp, CAST(count(*) AS BIGINT) AS n_members
             FROM m GROUP BY 1 HAVING count(*) >= 2
           ), nm AS (
             SELECT comp, p_name FROM (
               SELECT comp, p_name, row_number() OVER (PARTITION BY comp
                 ORDER BY length(p_name) DESC, p_name) AS rn FROM m)
             WHERE rn = 1
           ), br AS (
             SELECT comp, p_brand FROM (
               SELECT comp, p_brand, row_number() OVER (PARTITION BY comp
                 ORDER BY cnt DESC, p_brand) AS rn
               FROM (SELECT comp, p_brand, count(*) AS cnt
                     FROM m GROUP BY 1, 2))
             WHERE rn = 1
           ), ty AS (
             SELECT comp, p_type FROM (
               SELECT comp, p_type, row_number() OVER (PARTITION BY comp
                 ORDER BY cnt DESC, p_type) AS rn
               FROM (SELECT comp, p_type, count(*) AS cnt
                     FROM m GROUP BY 1, 2))
             WHERE rn = 1
           ), ag AS (
             SELECT comp, max(p_size) AS p_size,
               min(p_retailprice) AS p_retailprice
             FROM m GROUP BY 1)
           SELECT sz.comp, sz.n_members, nm.p_name, br.p_brand, ty.p_type,
             ag.p_size, ag.p_retailprice
           FROM sz JOIN nm USING (comp) JOIN br USING (comp)
             JOIN ty USING (comp) JOIN ag USING (comp)
           ORDER BY comp""",

      // vault hub replay: md5 business-key hashes, min source tag
      "dv_hub_customer" ->
        """WITH u AS (
             SELECT c_custkey AS custkey, 'crm' AS src FROM customer
             UNION ALL SELECT o_custkey, 'orders' FROM orders
           ), h AS (
             SELECT custkey, min(src) AS record_source FROM u GROUP BY 1)
           SELECT md5(concat_ws('||', CAST(custkey AS VARCHAR))) AS hub_key,
             custkey, record_source, 'L1' AS load_id
           FROM h ORDER BY custkey""",

      // vault link replay: distinct relationship instances, hash of
      // all keys plus each side's hub key
      "dv_link_order_customer" ->
        """WITH dt AS (SELECT DISTINCT o_orderkey, o_custkey FROM orders)
           SELECT md5(concat_ws('||', CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR))) AS link_key,
             md5(concat_ws('||', CAST(o_orderkey AS VARCHAR))) AS hub_a_key,
             md5(concat_ws('||', CAST(o_custkey AS VARCHAR))) AS hub_b_key,
             o_orderkey, o_custkey, 'orders' AS record_source,
             'L1' AS load_id
           FROM dt ORDER BY o_orderkey""",

      // vault satellite-delta replay: hash_diff anti-join — only the
      // modified attribute states land
      "dv_satellite_delta" ->
        """WITH cur AS (
             SELECT DISTINCT
               md5(concat_ws('||', CAST(c_custkey AS VARCHAR))) AS hub_key,
               md5(concat_ws('||', c_mktsegment,
                 CAST(c_nationkey AS VARCHAR))) AS hash_diff
             FROM customer
           ), b2 AS (
             SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN 'X-' || c_mktsegment
                 ELSE c_mktsegment END AS c_mktsegment,
               c_nationkey
             FROM customer
           ), st AS (
             SELECT DISTINCT
               md5(concat_ws('||', CAST(c_custkey AS VARCHAR))) AS hub_key,
               md5(concat_ws('||', c_mktsegment,
                 CAST(c_nationkey AS VARCHAR))) AS hash_diff,
               c_mktsegment, c_nationkey
             FROM b2)
           SELECT st.hub_key, st.hash_diff, st.c_mktsegment,
             st.c_nationkey, 'crm' AS record_source, 'L2' AS load_id
           FROM st LEFT JOIN cur ON st.hub_key = cur.hub_key
             AND st.hash_diff = cur.hash_diff
           WHERE cur.hub_key IS NULL
           ORDER BY st.hub_key""",

      "dedup_components" ->
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
           )
           SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",

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

      // gains replay: same (score desc, id) ntile, integer cum/total
      // sums, the three divisions
      "model_gains" ->
        """WITH u AS (
             SELECT user_id, count(*) AS s,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS y,
               user_id % 2 AS k
             FROM events GROUP BY user_id
           ), b AS (
             SELECT k, CAST(ntile(10) OVER (PARTITION BY k
               ORDER BY s DESC, user_id) AS BIGINT) AS bucket, y
             FROM u
           ), g AS (
             SELECT k, bucket, count(*) AS n_units,
               CAST(sum(y) AS BIGINT) AS n_pos
             FROM b GROUP BY 1, 2
           ), w AS (
             SELECT *,
               CAST(sum(n_pos) OVER (PARTITION BY k ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_pos,
               CAST(sum(n_pos) OVER (PARTITION BY k) AS BIGINT) AS tot_pos,
               CAST(sum(n_units) OVER (PARTITION BY k) AS BIGINT) AS tot_n
             FROM g)
           SELECT k AS cohort, bucket, n_units, n_pos,
             round(CAST(n_pos AS DOUBLE) / CAST(n_units AS DOUBLE), 6)
               AS rate,
             round(CASE WHEN tot_pos > 0 THEN CAST(cum_pos AS DOUBLE)
               / CAST(tot_pos AS DOUBLE) END, 6) AS cum_capture,
             round(CASE WHEN tot_pos > 0 THEN
               CAST(n_pos * tot_n AS DOUBLE)
               / CAST(n_units * tot_pos AS DOUBLE) END, 6) AS lift
           FROM w ORDER BY cohort, bucket""",

      // WoE/IV replay: identical smoothed shares, ln through the
      // round-6 guard, contributions on the ROUNDED woe, the same
      // 1e6-scaled integer IV sum
      "dq_woe_iv" ->
        """WITH e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type
             FROM events
           ), f AS (
             SELECT user_id, event_type AS first_event FROM (
               SELECT user_id, event_type, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM e) WHERE rn = 1
           ), c AS (
             SELECT user_id, CAST(max(CASE WHEN event_type = 'purchase'
               THEN 1 ELSE 0 END) AS BIGINT) AS converted
             FROM e GROUP BY 1
           ), u AS (
             SELECT f.first_event, c.converted FROM f JOIN c USING (user_id)
           ), per AS (
             SELECT first_event, count(*) AS n_units,
               CAST(sum(converted) AS BIGINT) AS n_pos,
               CAST(count(*) - sum(converted) AS BIGINT) AS n_neg
             FROM u GROUP BY 1
           ), tot AS (
             SELECT CAST(sum(n_pos) AS BIGINT) AS p,
               CAST(sum(n_neg) AS BIGINT) AS n
             FROM per
           ), w AS (
             SELECT per.*,
               (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(t.p AS DOUBLE) + 0.5)
                 AS gs,
               (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(t.n AS DOUBLE) + 0.5)
                 AS bs
             FROM per CROSS JOIN tot t
           ), w2 AS (SELECT *, round(ln(gs / bs), 6) AS woe FROM w
           ), w3 AS (
             SELECT *, round((gs - bs) * woe, 6) AS iv_contrib FROM w2
           ), w4 AS (
             SELECT *, CAST(round(iv_contrib * 1000000.0) AS BIGINT) AS s6
             FROM w3
           ), iv AS (SELECT CAST(sum(s6) AS BIGINT) AS iv6 FROM w4)
           SELECT first_event, n_units, n_pos, n_neg, woe, iv_contrib,
             round(CAST(iv.iv6 AS DOUBLE) / 1000000.0, 6) AS iv_total
           FROM w4 CROSS JOIN iv ORDER BY first_event""",

      // Spearman replay: the same doubled tie-averaged ranks,
      // HUGEINT sums (≡ Spark's decimal(38)), the same double tree
      "corr_spearman" ->
        """WITH rev AS (
             SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
             FROM orders GROUP BY 1
           ), j AS (
             SELECT n.n_name AS nation, c.c_acctbal AS x, r.rev AS y
             FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
           ), rk AS (
             SELECT nation,
               CAST(2 * (rank() OVER (PARTITION BY nation ORDER BY x) - 1)
                 + count(*) OVER (PARTITION BY nation, x) + 1 AS HUGEINT)
                 AS rx2,
               CAST(2 * (rank() OVER (PARTITION BY nation ORDER BY y) - 1)
                 + count(*) OVER (PARTITION BY nation, y) + 1 AS HUGEINT)
                 AS ry2
             FROM j
           ), s AS (
             SELECT nation, count(*) AS n, sum(rx2) AS sx, sum(ry2) AS sy,
               sum(rx2 * ry2) AS sxy, sum(rx2 * rx2) AS sxx,
               sum(ry2 * ry2) AS syy
             FROM rk GROUP BY 1 HAVING count(*) >= 2
           ), c AS (
             SELECT nation, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
               CAST(n * syy - sy * sy AS DOUBLE) AS dy
             FROM s)
           SELECT nation, n,
             round(CASE WHEN dx > 0 AND dy > 0
               THEN num / sqrt(dx * dy) END, 6) AS rho
           FROM c ORDER BY nation""",

      // χ² replay: the full R×C grid with zero cells, the same
      // per-cell double tree, 1e6-scaled integer contribution sum
      "dq_chi2" ->
        """WITH obs AS (
             SELECT c_mktsegment AS a, c_nationkey AS b,
               CAST(count(*) AS BIGINT) AS o
             FROM customer GROUP BY 1, 2
           ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
           ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
           ), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
           ), grid AS (
             SELECT ra.a, cb.b, ra.r, cb.c, coalesce(obs.o, 0) AS o
             FROM ra CROSS JOIN cb
               LEFT JOIN obs ON ra.a = obs.a AND cb.b = obs.b
           ), cells AS (
             SELECT g.o,  g.a, g.b,
               CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
                 / CAST(nn.n AS DOUBLE) AS e
             FROM grid g CROSS JOIN nn
           ), sc AS (
             SELECT a, b,
               CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
                 / e * 1000000.0) AS BIGINT) AS s6
             FROM cells)
           SELECT nn.n, x.n_rows_cat, x.n_cols_cat,
             (x.n_rows_cat - 1) * (x.n_cols_cat - 1) AS dof,
             round(CAST(x.chi6 AS DOUBLE) / 1000000.0, 6) AS chi2,
             round(CASE WHEN least(x.n_rows_cat, x.n_cols_cat) > 1 THEN
               sqrt((CAST(x.chi6 AS DOUBLE) / 1000000.0)
                 / (CAST(nn.n AS DOUBLE)
                   * CAST(least(x.n_rows_cat, x.n_cols_cat) - 1 AS DOUBLE)))
               END, 6) AS cramers_v
           FROM (
             SELECT count(DISTINCT a) AS n_rows_cat,
               count(DISTINCT b) AS n_cols_cat,
               CAST(sum(s6) AS BIGINT) AS chi6
             FROM sc) x CROSS JOIN nn""",

      // U replay: doubled tie-averaged ranks (integer), exact tie
      // term T = Σ(t³−t), the same fixed double tree for σ and z
      "ab_mannwhitney" ->
        """WITH f AS (
             SELECT hour(CAST(ts AS TIMESTAMP)) AS hod,
               event_type = 'purchase' AS isa, value AS v
             FROM events WHERE event_type IN ('purchase', 'view')
           ), r AS (
             SELECT hod, isa, v,
               2 * (rank() OVER (PARTITION BY hod ORDER BY v) - 1)
                 + count(*) OVER (PARTITION BY hod, v) + 1 AS r2
             FROM f
           ), t AS (
             SELECT hod, CAST(sum(tt*tt*tt - tt) AS BIGINT) AS tie
             FROM (SELECT hod, v, count(*) AS tt FROM f GROUP BY 1, 2)
             GROUP BY 1
           ), a AS (
             SELECT hod, sum(CASE WHEN isa THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN isa THEN 0 ELSE 1 END) AS n_b,
               CAST(sum(CASE WHEN isa THEN r2 ELSE 0 END) AS BIGINT) AS ra2
             FROM r GROUP BY 1
             HAVING sum(CASE WHEN isa THEN 1 ELSE 0 END) >= 1
               AND sum(CASE WHEN isa THEN 0 ELSE 1 END) >= 1
           ), c AS (
             SELECT a.hod, n_a, n_b, ra2 - n_a * (n_a + 1) AS u2,
               n_a + n_b AS n, t.tie
             FROM a JOIN t ON a.hod = t.hod
           ), s AS (
             SELECT *, (CAST(n_a AS DOUBLE) * n_b / 12.0)
               * (CAST(n + 1 AS DOUBLE) - CAST(tie AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS s2
             FROM c)
           SELECT hod, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(u2 AS DOUBLE) / 2.0 AS u_a,
             round(CASE WHEN s2 > 0 THEN
               (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)
               / (2.0 * sqrt(s2)) END, 6) AS z
           FROM s ORDER BY hod""",

      // Welch replay: HUGEINT-exact n/Σv/Σv² per group, the same
      // fixed double tree for se², t, and the Satterthwaite df
      "ab_welch_t" ->
        """WITH u AS (
             SELECT event_type AS k, CAST(user_id % 2 AS VARCHAR) AS g,
               count(*) AS v
             FROM events GROUP BY event_type, user_id
           ), a AS (
             SELECT k,
               sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN g = '1' THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
               sum(CASE WHEN g = '0' THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
               sum(CASE WHEN g = '1' THEN CAST(v AS HUGEINT) * v ELSE 0 END)
                 AS qa,
               sum(CASE WHEN g = '0' THEN CAST(v AS HUGEINT) * v ELSE 0 END)
                 AS qb
             FROM u GROUP BY 1
             HAVING sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) >= 2
               AND sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) >= 2
           ), s AS (
             SELECT k, n_a, n_b,
               CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
               (CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                   / CAST(n_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                 AS se2a,
               (CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                   / CAST(n_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                 AS se2b
             FROM a)
           SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(sad / CAST(n_a AS DOUBLE), 6) AS mean_a,
             round(sbd / CAST(n_b AS DOUBLE), 6) AS mean_b,
             round(CASE WHEN se2a + se2b > 0 THEN
               (sad / CAST(n_a AS DOUBLE) - sbd / CAST(n_b AS DOUBLE))
               / sqrt(se2a + se2b) END, 6) AS t,
             round(CASE WHEN se2a + se2b > 0 THEN
               (se2a + se2b) * (se2a + se2b)
               / (se2a * se2a / (CAST(n_a AS DOUBLE) - 1.0)
                 + se2b * se2b / (CAST(n_b AS DOUBLE) - 1.0)) END, 6)
               AS df_w
           FROM s ORDER BY event_type""",

      // CUPED replay: exact HUGEINT sufficient statistics, the same
      // one-division θ and fixed double trees
      "ab_cuped" ->
        """WITH u AS (
             SELECT event_type AS k, user_id,
               CAST(user_id % 2 AS VARCHAR) AS g,
               sum(CASE WHEN CAST(ts AS TIMESTAMP)
                 <= TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS x,
               sum(CASE WHEN CAST(ts AS TIMESTAMP)
                 > TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS y
             FROM events GROUP BY 1, 2, 3
           ), a AS (
             SELECT k,
               sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN g = '1' THEN CAST(x AS HUGEINT) ELSE 0 END)
                 AS xa,
               sum(CASE WHEN g = '0' THEN CAST(x AS HUGEINT) ELSE 0 END)
                 AS xb,
               sum(CASE WHEN g = '1' THEN CAST(y AS HUGEINT) ELSE 0 END)
                 AS ya,
               sum(CASE WHEN g = '0' THEN CAST(y AS HUGEINT) ELSE 0 END)
                 AS yb,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy
             FROM u GROUP BY 1
             HAVING sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) >= 2
               AND sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) >= 2
           ), e AS (
             SELECT k, n_a, n_b,
               CAST(n_a + n_b AS HUGEINT) * sxy - (xa + xb) * (ya + yb)
                 AS num,
               CAST(n_a + n_b AS HUGEINT) * sxx - (xa + xb) * (xa + xb)
                 AS denx,
               CAST(n_a + n_b AS HUGEINT) * syy - (ya + yb) * (ya + yb)
                 AS deny,
               CAST(ya AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(yb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff_raw,
               CAST(xa AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(xb AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff_x
             FROM a)
           SELECT k AS event_type, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(CASE WHEN denx > 0 THEN
               CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END, 6)
               AS theta,
             round(diff_raw, 6) AS diff_raw,
             round(CASE WHEN denx > 0 THEN diff_raw
               - CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) * diff_x
               END, 6) AS diff_cuped,
             round(CASE WHEN denx > 0 AND deny > 0 THEN
               CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS var_reduction
           FROM e ORDER BY event_type""",

      // MI replay: observed cells only (x·ln x → 0 at zero), each
      // term rounded-6 and 1e6-scaled, order-free integer sums
      "dq_mutual_info" ->
        """WITH f AS (
             SELECT event_type AS a, hour(CAST(ts AS TIMESTAMP)) AS b
             FROM events
           ), obs AS (
             SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM f GROUP BY 1, 2
           ), ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
           ), cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
           ), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
           ), ha AS (
             SELECT CAST(sum(CAST(round(
               -(CAST(r AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(r AS DOUBLE) / CAST(nn.n AS DOUBLE))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS h6
             FROM ra CROSS JOIN nn
           ), hb AS (
             SELECT CAST(sum(CAST(round(
               -(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS h6
             FROM cb CROSS JOIN nn
           ), j AS (
             SELECT obs.o, ra.r, cb.c, nn.n
             FROM obs JOIN ra ON obs.a = ra.a JOIN cb ON obs.b = cb.b
               CROSS JOIN nn
           ), agg AS (
             SELECT
               CAST(sum(CAST(round(
                 -(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS hab6,
               CAST(sum(CAST(round(
                 (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS mi6,
               CAST(count(*) AS BIGINT) AS n_cells
             FROM j)
           SELECT nn.n, agg.n_cells,
             CAST(ha.h6 AS DOUBLE) / 1000000.0 AS h_a,
             CAST(hb.h6 AS DOUBLE) / 1000000.0 AS h_b,
             CAST(agg.hab6 AS DOUBLE) / 1000000.0 AS h_ab,
             CAST(agg.mi6 AS DOUBLE) / 1000000.0 AS mi,
             round(CASE WHEN least(ha.h6, hb.h6) > 0 THEN
               CAST(agg.mi6 AS DOUBLE)
                 / CAST(least(ha.h6, hb.h6) AS DOUBLE) END, 6) AS nmi
           FROM agg CROSS JOIN nn CROSS JOIN ha CROSS JOIN hb""",

      // OLS replay: the same five integer sums, the same double
      // combination tree
      "events_ols_trend" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), ix AS (
             SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS x
             FROM g
           ), s AS (
             SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
             FROM ix GROUP BY 1 HAVING count(*) >= 2
           ), c AS (
             SELECT event_type, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy,
               sx, sy
             FROM s)
           SELECT event_type, n, round(num / dx, 6) AS slope,
             round((CAST(sy AS DOUBLE) - (num / dx) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE), 6) AS intercept,
             round(CASE WHEN dy > 0 THEN (num * num) / (dx * dy) END, 6) AS r2
           FROM c ORDER BY event_type""",

      // decomposition replay: identical integer window sums, the same
      // division/subtraction tree — resid intentionally repeats the
      // unrounded trend/seasonal expressions
      "events_seasonal_decompose" ->
        s"$seasonalDecomposeCoreSql ORDER BY event_type, hr",

      // the MAD rule over the decomposition's ROUNDED residual —
      // med/mad via quantile_cont ≡ Spark's exact percentile, the
      // events_mad_outliers round-6 compare guard
      "events_stl_anomaly" ->
        s"""WITH dec AS ($seasonalDecomposeCoreSql
           ), sc AS (
             SELECT *, CAST(round(resid * 1000000) AS BIGINT) AS r6 FROM dec
           ), med AS (
             SELECT event_type, quantile_cont(r6, 0.5) AS med_s
             FROM sc GROUP BY 1
           ), dev AS (
             SELECT d.*, m.med_s, abs(d.r6 - m.med_s) AS dev_s
             FROM sc d JOIN med m USING (event_type)
           ), mad AS (
             SELECT event_type, quantile_cont(dev_s, 0.5) AS mad_s
             FROM dev GROUP BY 1)
           SELECT d.event_type, d.hr, d.value, d.resid,
             round(d.med_s / 1000000.0, 6) AS med,
             round(a.mad_s / 1000000.0, 6) AS mad,
             d.dev_s > 3.0 * a.mad_s AS is_anomaly
           FROM dev d JOIN mad a USING (event_type)
           ORDER BY d.event_type, d.hr""",

      // ACF replay: C/H/T from a rn self-join per lag (≡ the lead
      // columns), the same n²-scaled integer statistics and the
      // same double tree
      "events_acf" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), ix AS (
             SELECT event_type, CAST(y AS BIGINT) AS y,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t
             FROM g
           ), base AS (
             SELECT event_type, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS sxx
             FROM ix GROUP BY 1
           ), lags(k) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
             (CAST(3 AS BIGINT))
           ), pairs AS (
             SELECT a.event_type, l.k,
               CAST(sum(a.y * b.y) AS BIGINT) AS c,
               CAST(sum(a.y) AS BIGINT) AS h,
               CAST(sum(b.y) AS BIGINT) AS tl
             FROM ix a CROSS JOIN lags l
               JOIN ix b ON a.event_type = b.event_type AND b.t = a.t + l.k
             GROUP BY 1, 2)
           SELECT p.event_type, p.k AS lag, b.n,
             round(CASE WHEN CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE)
                 * CAST(b.sxx AS DOUBLE)
                 - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)) > 0 THEN
               (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE) * CAST(p.c AS DOUBLE)
                 - CAST(b.n AS DOUBLE) * CAST(b.s AS DOUBLE)
                   * (CAST(p.h AS DOUBLE) + CAST(p.tl AS DOUBLE))
                 + (CAST(b.n AS DOUBLE) - CAST(p.k AS DOUBLE))
                   * CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
               / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE)
                 * CAST(b.sxx AS DOUBLE)
                 - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)))
               END, 6) AS acf
           FROM pairs p JOIN base b USING (event_type)
           ORDER BY event_type, lag""",

      // forecast-accuracy replay: same evaluation window (rn >
      // season), integer Σ|e|/Σe², rounded-term sMAPE sum, one
      // division each
      "events_forecast_accuracy" ->
        """WITH g AS (
             SELECT event_type AS k,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS y
             FROM events GROUP BY 1, 2
           ), w AS (
             SELECT k, CAST(y AS BIGINT) AS y,
               row_number() OVER (PARTITION BY k ORDER BY hr) AS rn,
               lag(y, 1) OVER (PARTITION BY k ORDER BY hr) AS f1,
               lag(y, 24) OVER (PARTITION BY k ORDER BY hr) AS fs
             FROM g
           ), e AS (
             SELECT k, y, abs(y - f1) AS en_abs, 'naive' AS model,
               CAST(f1 AS BIGINT) AS f
             FROM w WHERE rn > 24
             UNION ALL
             SELECT k, y, abs(y - f1) AS en_abs, 'seasonal_naive' AS model,
               CAST(fs AS BIGINT) AS f
             FROM w WHERE rn > 24
           ), t AS (
             SELECT k, model, y - f AS e, en_abs,
               CASE WHEN abs(y) + abs(f) > 0 THEN
                 CAST(round(2.0 * abs(CAST(y - f AS DOUBLE))
                   / (abs(CAST(y AS DOUBLE)) + abs(CAST(f AS DOUBLE)))
                   * 1000000.0) AS BIGINT)
               ELSE 0 END AS s6
             FROM e
           ), a AS (
             SELECT k, model, count(*) AS n_eval,
               CAST(sum(abs(e)) AS BIGINT) AS sae,
               sum(CAST(e AS HUGEINT) * e) AS sse,
               CAST(sum(s6) AS BIGINT) AS smape6,
               CAST(sum(en_abs) AS BIGINT) AS san
             FROM t GROUP BY 1, 2)
           SELECT k AS event_type, model, CAST(n_eval AS BIGINT) AS n_eval,
             round(CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS mae,
             round(sqrt(CAST(sse AS DOUBLE) / CAST(n_eval AS DOUBLE)), 6)
               AS rmse,
             round(CAST(smape6 AS DOUBLE) / 1000000.0
               / CAST(n_eval AS DOUBLE), 6) AS smape,
             round(CASE WHEN san > 0 THEN
               CAST(sae AS DOUBLE) / CAST(san AS DOUBLE) END, 6) AS mase
           FROM a ORDER BY event_type, model""",

      // M4 replay: the four per-bucket extreme selections as rank-1
      // windows with the identical tie-breaks, distinct union
      "events_m4_downsample" ->
        """WITH g AS (
             SELECT event_type AS k,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2
           ), b AS (
             SELECT k, hr, y,
               date_diff('second', TIMESTAMP '1970-01-01', hr) // 21600
                 AS bucket
             FROM g
           ), r AS (
             SELECT k, bucket, hr, y,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY hr) AS rf,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY hr DESC) AS rl,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY y, hr) AS rmin,
               row_number() OVER (PARTITION BY k, bucket
                 ORDER BY y DESC, hr DESC) AS rmax
             FROM b)
           SELECT DISTINCT k AS event_type, bucket, hr AS ts, y AS value
           FROM r WHERE 1 IN (rf, rl, rmin, rmax)
           ORDER BY event_type, ts, value""",

      // debounce replay: the survivor chain as a recursive CTE —
      // each kept row's successor is the minimal-rn event ≥ gap
      // after it (sec non-decreasing in rn ⇒ identical to the fold);
      // the streaming gate accumulates the same survivors
      "events_debounce" -> debounceOracleSql,
      "stream_debounce" -> debounceOracleSql,

      // burstiness replay: integer-second gaps, exact sums, the same
      // σ/μ/B double trees
      "events_burstiness" ->
        """WITH s AS (
             SELECT user_id AS k,
               date_diff('second', TIMESTAMP '1970-01-01',
                 CAST(ts AS TIMESTAMP)) AS sec
             FROM events
           ), g AS (
             SELECT k, sec - lag(sec) OVER (PARTITION BY k ORDER BY sec)
               AS gap
             FROM s
           ), a AS (
             SELECT k, count(*) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS sg,
               CAST(sum(gap * gap) AS BIGINT) AS qg
             FROM g WHERE gap IS NOT NULL GROUP BY 1
             HAVING count(*) >= 2
           ), e AS (
             SELECT k, n_gaps,
               CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
               sqrt((CAST(qg AS DOUBLE)
                 - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                   / CAST(n_gaps AS DOUBLE))
                 / CAST(n_gaps AS DOUBLE)) AS sigma
             FROM a)
           SELECT k AS user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
             round(mu, 6) AS mean_gap, round(sigma, 6) AS sd_gap,
             round(CASE WHEN sigma + mu > 0 THEN
               (sigma - mu) / (sigma + mu) END, 6) AS burstiness
           FROM e ORDER BY user_id""",

      // growth-accounting replay: distinct user-weeks, lag/lead
      // classification, churn capped at the corpus' last week
      "events_growth_accounting" ->
        """WITH uw AS (
             SELECT DISTINCT user_id AS u,
               date_diff('day', DATE '1970-01-05',
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE))
                 // 7 AS wk
             FROM events
           ), f AS (
             SELECT u, wk,
               lag(wk) OVER (PARTITION BY u ORDER BY wk) AS pv,
               lead(wk) OVER (PARTITION BY u ORDER BY wk) AS nx
             FROM uw
           ), mx AS (SELECT max(wk) AS mw FROM uw
           ), cls AS (
             SELECT wk, CASE WHEN pv IS NULL THEN 'new'
               WHEN wk - pv = 1 THEN 'retained'
               ELSE 'resurrected' END AS cls
             FROM f
             UNION ALL
             SELECT wk + 1, 'churned' FROM f CROSS JOIN mx
             WHERE (nx IS NULL OR nx > wk + 1) AND wk + 1 <= mw
           ), a AS (
             SELECT wk,
               CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_resurrected,
               CAST(sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_churned
             FROM cls GROUP BY 1)
           SELECT CAST(DATE '1970-01-05' + CAST(wk * 7 AS INT)
               AS TIMESTAMP) AS week_start,
             n_new, n_retained, n_resurrected, n_churned,
             round(CASE WHEN n_churned > 0 THEN
               CAST(n_new + n_resurrected AS DOUBLE)
               / CAST(n_churned AS DOUBLE) END, 6) AS quick_ratio
           FROM a ORDER BY week_start""",

      // revenue-bridge replay: exact-decimal (q, r) sums per
      // (brand, period), the identical effect trees
      "revenue_bridge" ->
        """WITH li AS (
             SELECT p.p_brand AS g,
               CASE WHEN year(l_shipdate) = 1997 THEN 0 ELSE 1 END AS per,
               CAST(l_quantity AS DECIMAL(12,2)) AS q,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 AS DECIMAL(18,4)) AS r
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             WHERE year(l_shipdate) IN (1997, 1998)
           ), a AS (
             SELECT g,
               sum(CASE WHEN per = 0 THEN q END) AS q0,
               sum(CASE WHEN per = 1 THEN q END) AS q1,
               sum(CASE WHEN per = 0 THEN r END) AS r0,
               sum(CASE WHEN per = 1 THEN r END) AS r1
             FROM li GROUP BY 1
           ), e AS (
             SELECT g, q0, q1, r0, r1,
               CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE) AS p0,
               CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE) AS p1,
               CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE) AS dq,
               q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
                 AS cont
             FROM a)
           SELECT g AS p_brand,
             CASE WHEN q0 IS NULL THEN 'new'
               WHEN q1 IS NULL THEN 'discontinued'
               ELSE 'continuing' END AS status,
             CAST(q0 AS DOUBLE) AS q0, CAST(q1 AS DOUBLE) AS q1,
             CAST(r0 AS DOUBLE) AS r0, CAST(r1 AS DOUBLE) AS r1,
             CAST(coalesce(r1, 0) - coalesce(r0, 0) AS DOUBLE) AS delta_r,
             round(CASE WHEN cont THEN dq * p0 END, 6) AS volume_effect,
             round(CASE WHEN cont THEN (p1 - p0) * CAST(q0 AS DOUBLE) END, 6)
               AS price_effect,
             round(CASE WHEN cont THEN dq * (p1 - p0) END, 6)
               AS cross_effect
           FROM e ORDER BY p_brand""",

      // KM replay: integer suffix-sum risk sets, then the product
      // recurrence step-by-step in a recursive CTE — the same
      // divide-then-multiply IEEE sequence the keyed fold executes
      "events_survival" ->
        """WITH RECURSIVE g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 AS k,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), tbl AS (
             SELECT k, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), risk AS (
             SELECT k, t, d,
               CAST(sum(m) OVER (PARTITION BY k ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM tbl
           ), er AS (
             SELECT k, t, n, d,
               row_number() OVER (PARTITION BY k ORDER BY t) AS rn
             FROM risk WHERE d >= 1
           ), s AS (
             SELECT k, t, n, d, rn,
               CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS surv
             FROM er WHERE rn = 1
             UNION ALL
             SELECT e.k, e.t, e.n, e.d, e.rn,
               s.surv * (CAST(e.n - e.d AS DOUBLE) / CAST(e.n AS DOUBLE))
             FROM er e JOIN s ON e.k = s.k AND e.rn = s.rn + 1)
           SELECT k AS cohort, t AS t_duration, n AS n_risk,
             d AS n_events, surv AS survival
           FROM s ORDER BY cohort, t_duration""",

      // Nelson-Aalen replay: the same risk-set CTEs as events_survival
      // up to the event-time cut, then scaled increments + integer
      // running sum — a plain window, no recursion
      "survival_hazard" ->
        """WITH g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 AS k,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), tbl AS (
             SELECT k, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), risk AS (
             SELECT k, t, d,
               CAST(sum(m) OVER (PARTITION BY k ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM tbl
           ), hz AS (
             SELECT k, t, n, d,
               CAST(round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS h6
             FROM risk WHERE d >= 1)
           SELECT k AS cohort, t AS t_duration, n AS n_risk,
             d AS n_events,
             CAST(CAST(sum(h6) OVER (PARTITION BY k ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS DOUBLE) / 1000000.0 AS cum_hazard
           FROM hz ORDER BY cohort, t_duration""",

      // funnel-latency replay: the funnel's min-join chain carrying
      // BOTH endpoints, exact µs gaps, quantile_cont p50
      "events_funnel_latency" ->
        """WITH f AS (
             SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type IN ('view', 'click', 'purchase')
           ), s1 AS (
             SELECT user_id, min(ts) AS t1 FROM f
             WHERE event_type = 'view' GROUP BY user_id
           ), s2 AS (
             SELECT f.user_id, min(ts) AS t2, min(t1) AS t1
             FROM f JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND ts > t1 GROUP BY f.user_id
           ), s3 AS (
             SELECT f.user_id, min(ts) AS t3, min(t2) AS t2
             FROM f JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND ts > t2 GROUP BY f.user_id
           ), a1 AS (
             SELECT 'view' AS step_from, 'click' AS step_to,
               count(*) AS n_users,
               CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) AS sg,
               quantile_cont(epoch_us(t2) - epoch_us(t1), 0.5) AS p50
             FROM s2
           ), a2 AS (
             SELECT 'click' AS step_from, 'purchase' AS step_to,
               count(*) AS n_users,
               CAST(sum(epoch_us(t3) - epoch_us(t2)) AS BIGINT) AS sg,
               quantile_cont(epoch_us(t3) - epoch_us(t2), 0.5) AS p50
             FROM s3)
           SELECT step_from, step_to, CAST(n_users AS BIGINT) AS n_users,
             round(CAST(sg AS DOUBLE) / CAST(n_users AS DOUBLE)
               / 1000000.0, 6) AS mean_s,
             round(p50 / 1000000.0, 6) AS p50_s
           FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
           ORDER BY step_from""",

      // log-rank replay: the same zero-filled grid, integer suffix
      // risk sets, rounded-6/1e6-scaled E/V terms, one z/χ² tree
      "survival_logrank" ->
        """WITH g AS (
             SELECT user_id,
               (date_diff('second', TIMESTAMP '1970-01-01',
                  min(CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END))
                - date_diff('second', TIMESTAMP '1970-01-01',
                    min(CAST(ts AS TIMESTAMP)))) // 3600 AS gap_h
             FROM events GROUP BY user_id
           ), subj AS (
             SELECT user_id % 2 = 1 AS isa,
               CAST(CASE WHEN gap_h <= 48 THEN gap_h ELSE 48 END
                 AS BIGINT) AS t,
               CASE WHEN gap_h <= 48 THEN 1 ELSE 0 END AS ev
             FROM g
           ), per AS (
             SELECT isa, t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
             FROM subj GROUP BY 1, 2
           ), grid AS (
             SELECT s.isa, axis.t, coalesce(per.d, 0) AS d,
               coalesce(per.m, 0) AS m
             FROM (SELECT DISTINCT t FROM per) axis
             CROSS JOIN (VALUES (TRUE), (FALSE)) AS s(isa)
             LEFT JOIN per ON per.isa = s.isa AND per.t = axis.t
           ), risk AS (
             SELECT isa, t, d,
               CAST(sum(m) OVER (PARTITION BY isa ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM grid
           ), ab AS (
             SELECT x.t, x.d AS d1, x.n AS n1, y.d AS d2, y.n AS n2
             FROM risk x JOIN risk y ON x.t = y.t AND x.isa AND NOT y.isa
             WHERE x.d + y.d >= 1
           ), terms AS (
             SELECT d1, d2,
               CAST(round(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE) * 1000000.0) AS BIGINT) AS e6,
               CASE WHEN n1 + n2 > 1 THEN
                 CAST(round(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                   * CAST(n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
                   / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                     * (CAST(n1 + n2 AS DOUBLE) - 1.0))
                   * 1000000.0) AS BIGINT) ELSE 0 END AS v6
             FROM ab
           ), agg AS (
             SELECT CAST(sum(d1) AS BIGINT) AS d_a,
               CAST(sum(d2) AS BIGINT) AS d_b,
               CAST(sum(e6) AS BIGINT) AS se6,
               CAST(sum(v6) AS BIGINT) AS sv6
             FROM terms
           ), cnt AS (
             SELECT CAST(sum(CASE WHEN isa THEN m ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(sum(CASE WHEN NOT isa THEN m ELSE 0 END) AS BIGINT)
                 AS n_b
             FROM per
           ), zc AS (
             SELECT n_a, n_b, d_a, d_b, se6, sv6,
               (CAST(d_a AS DOUBLE) - CAST(se6 AS DOUBLE) / 1000000.0)
                 / sqrt(CAST(sv6 AS DOUBLE) / 1000000.0) AS zr
             FROM cnt CROSS JOIN agg)
           SELECT n_a, n_b, d_a, d_b,
             round(CAST(se6 AS DOUBLE) / 1000000.0, 6) AS e_a,
             round(CASE WHEN sv6 > 0 THEN zr END, 6) AS z,
             round(CASE WHEN sv6 > 0 THEN zr * zr END, 6) AS chi2
           FROM zc""",

      // Pettitt replay: tie-averaged ranks doubled to stay integer
      // (2·avg_rank = 2·(rank−1) + ties + 1), U_t an integer running
      // sum, K/argmax exact — the one double is the final p
      "events_pettitt" ->
        """WITH g AS (
             SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               count(*) AS cnt
             FROM events GROUP BY 1, 2
           ), r AS (
             SELECT event_type, hr,
               2 * (rank() OVER (PARTITION BY event_type ORDER BY cnt) - 1)
                 + count(*) OVER (PARTITION BY event_type, cnt) + 1 AS r2,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM g
           ), u AS (
             SELECT event_type, hr, t, n,
               sum(r2) OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - t * (n + 1) AS u
             FROM r
           ), uf AS (SELECT * FROM u WHERE t < n
           ), k AS (
             SELECT event_type, max(abs(u)) AS k_stat FROM uf GROUP BY 1
           ), cp AS (
             SELECT uf.event_type, max(uf.n) AS n, min(uf.hr) AS cp_ts,
               max(k.k_stat) AS k_stat
             FROM uf JOIN k ON uf.event_type = k.event_type
               AND abs(uf.u) = k.k_stat
             GROUP BY 1)
           SELECT event_type, n, cp_ts, CAST(k_stat AS BIGINT) AS k_stat,
             round(least(1.0, 2.0 * exp(-6.0 * k_stat * k_stat
               / CAST(n*n*n + n*n AS DOUBLE))), 6) AS p_value
           FROM cp ORDER BY event_type""",

      // the fold is exact set union, so the oracle is the full
      // distinct recompute
      "mv_incremental_distinct" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_distinct
           FROM events GROUP BY event_type ORDER BY event_type""",

      // the stream's recurrence replayed level-by-level: rn joins the
      // previous row's ewma, e = value + 0.5·e_prev — the SAME IEEE
      // multiply+add sequence the stateful operator executes
      "stream_ewma" ->
        """WITH RECURSIVE e AS (
             SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events
           ), r AS (
             SELECT user_id, event_id, ts, value, rn, value AS ewma
             FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.event_id, e.ts, e.value, e.rn,
               e.value + 0.5 * r.ewma AS ewma
             FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
           SELECT user_id, event_id, ts, value, ewma FROM r
           ORDER BY user_id, event_id""",

      // equal-depth reference bins via quantile_cont, the same
      // list_filter bin fold, Laplace-smoothed fractions, window total
      "dq_drift_psi" ->
        """WITH ref AS (
             SELECT value FROM events WHERE event_id % 5 <> 0
           ), cur AS (
             SELECT value FROM events WHERE event_id % 5 = 0
           ), edges AS (
             SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
               0.6, 0.7, 0.8, 0.9]) AS es FROM ref
           ), rb AS (
             SELECT CAST(len(list_filter(es, e -> value > e)) AS INTEGER)
               AS bin FROM ref, edges
           ), cb AS (
             SELECT CAST(len(list_filter(es, e -> value > e)) AS INTEGER)
               AS bin FROM cur, edges
           ), spine AS (
             SELECT CAST(unnest(generate_series(0, 9)) AS INTEGER) AS bin
           ), rc AS (SELECT bin, count(*) AS c FROM rb GROUP BY bin
           ), cc AS (SELECT bin, count(*) AS c FROM cb GROUP BY bin
           ), j AS (
             SELECT s.bin, CAST(coalesce(rc.c, 0) AS BIGINT) AS n_ref,
               CAST(coalesce(cc.c, 0) AS BIGINT) AS n_cur
             FROM spine s LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
           ), f AS (
             SELECT bin, n_ref, n_cur,
               CAST(n_ref + 1 AS DOUBLE)
                 / CAST(sum(n_ref) OVER () + 10 AS DOUBLE) AS p,
               CAST(n_cur + 1 AS DOUBLE)
                 / CAST(sum(n_cur) OVER () + 10 AS DOUBLE) AS q
             FROM j)
           SELECT bin, n_ref, n_cur, round(p, 6) AS ref_frac,
             round(q, 6) AS cur_frac,
             round((q - p) * ln(q / p), 6) AS psi_contrib,
             round(sum((q - p) * ln(q / p)) OVER (), 6) AS psi
           FROM f ORDER BY bin""",

      // IVF-cell replay (the ann_ivf assignment CTE) + within-cell
      // pairs ≥ threshold — the SemDeDup recipe end to end
      "dedup_semantic" ->
        """WITH e AS (
             SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           ), cent AS (
             SELECT vec_id AS cell, v AS cv,
               list_sum(list_transform(v, x -> x * x)) AS cc
             FROM e WHERE vec_id < 16
           ), ad AS (
             SELECT e.vec_id, c.cell,
               -2 * list_sum(list_transform(generate_series(1, len(e.v)),
                 i -> e.v[i] * c.cv[i])) + c.cc AS dist
             FROM e, cent c
           ), assigned AS (
             SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist, cell) AS r FROM ad)
             WHERE r = 1
           ), pairs AS (
             SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
             FROM assigned a1 JOIN assigned a2
               ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
           ), scored AS (
             SELECT id_a, id_b,
               list_sum(list_transform(generate_series(1, len(x.v)),
                 i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
                  * sqrt(list_sum(list_transform(y.v, t -> t * t)))) AS cosine
             FROM pairs JOIN e x ON pairs.id_a = x.vec_id
               JOIN e y ON pairs.id_b = y.vec_id)
           SELECT id_a, id_b, cosine FROM scored
           WHERE cosine >= 0.4 ORDER BY id_a, id_b"""
    )
    // the incremental CC twin is PROVABLY the same labeling as the
    // full replay (star-edge folding, DedupSpec), so it shares the
    // recursive-reachability oracle verbatim
    base + ("dedup_components_incr" -> base("dedup_components")) +
      // the streaming attributor must converge to the batch
      // attribution — same oracle verbatim
      ("stream_attribution" -> base("events_attribution")) +
      // the streaming versioned MV must converge to the full batch
      // recompute — the mv_incremental oracle verbatim
      ("stream_mv_versioned" -> base("mv_incremental")) +
      // the streaming CUSUM must equal the batch recurrence
      // bit-for-bit — the recursive-CTE oracle verbatim
      ("stream_cusum" -> base("events_cusum")) +
      // same contract for the streaming Holt smoother
      ("stream_holt_winters" -> base("events_holt_winters"))
  }
}
