package graft

import graft.operators.{IncrementalAgg, Quality, Sessionize}
import graft.pipeline.Analytics
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-8 wave-5 operators: interval-union coverage islands,
  * rolling distinct actives, linear interpolation, FD violations,
  * top paths.
  */
class W5OpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Sessionize.mergeIntervals ----

  test("mergeIntervals: chained/touching/disjoint/inverted intervals per key") {
    val iv = Seq(
      // key a: [1,3],[2,5],[4,8] chain into ONE island even though
      // [1,3] and [4,8] don't touch directly; [8,9] touches (lo==hi) → merges
      ("a", 1L, 3L), ("a", 2L, 5L), ("a", 4L, 8L), ("a", 8L, 9L),
      // then a gap → new island
      ("a", 11L, 12L),
      // key b: disjoint stays disjoint; inverted [9,2] is dropped
      ("b", 1L, 2L), ("b", 4L, 5L), ("b", 9L, 2L)
    ).toDF("k", "lo", "hi")
    val got = Sessionize.mergeIntervals(iv, Seq("k"), "lo", "hi")
      .select("k", "island_seq", "island_start", "island_end", "n_intervals")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      ("a", 1L, 1L, 9L, 4L), ("a", 2L, 11L, 12L, 1L),
      ("b", 1L, 1L, 2L, 1L), ("b", 2L, 4L, 5L, 1L)))
  }

  test("mergeIntervals: nested interval and equal-lo ties collapse into their cover") {
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 0L, 5L), ("k", 100L, 101L))
      .toDF("g", "lo", "hi")
    val got = Sessionize.mergeIntervals(iv, Seq("g"), "lo", "hi")
      .select("island_seq", "island_start", "island_end", "n_intervals")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 0L, 101L, 4L)))
  }

  // ---- Analytics.activeUsers ----

  test("activeUsers: DAU and trailing-7d distinct actives") {
    // u1 active on day 1 and day 3; u2 on day 1; u3 on day 10 only
    val ev = Seq(
      (1L, ts("2024-01-01 05:00:00"), 1L),
      (2L, ts("2024-01-01 06:00:00"), 1L), // same user+day dedups
      (3L, ts("2024-01-01 07:00:00"), 2L),
      (4L, ts("2024-01-03 05:00:00"), 1L),
      (5L, ts("2024-01-10 05:00:00"), 3L)
    ).toDF("event_id", "ts", "user_id")
    val got = Analytics.activeUsers(ev, "user_id", "ts", 7)
      .select(col("day").cast("string"), col("dau"), col("rolling_actives"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // observed days: 1, 3, 10.
    // day 1: dau {u1,u2}=2; trailing 7d (days -5..1) actives = {u1,u2} = 2
    // day 3: dau {u1}=1; window covers day1+day3 → {u1,u2} = 2
    // day 10: dau {u3}=1; day 3 still in [4..10]? day3+6=day9 < day10 → {u3} = 1
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00", 2L, 2L),
      ("2024-01-03 00:00:00", 1L, 2L),
      ("2024-01-10 00:00:00", 1L, 1L)))
  }

  // ---- Analytics.eventsInterpolate ----

  test("eventsInterpolate: straight line between observations, flat edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_interp_").toString
    // type "a": hours 00, 03 observed (values 1.0, 7.0) → 01, 02
    // interpolate to 3.0, 5.0; type "b": single hour (no gaps)
    Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 03:20:00"), 1L, "a", 7.0, "{}"),
      (3L, ts("2024-01-01 02:00:00"), 2L, "b", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.eventsInterpolate(spark, dir)
      .select(col("event_type"), col("hour_ts").cast("string"),
        col("observed"), col("filled_value"))
      .as[(String, String, Boolean, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      ("a", "2024-01-01 00:00:00", true, 1.0),
      ("a", "2024-01-01 01:00:00", false, 3.0),
      ("a", "2024-01-01 02:00:00", false, 5.0),
      ("a", "2024-01-01 03:00:00", true, 7.0),
      ("b", "2024-01-01 02:00:00", true, 4.0)))
  }

  test("eventsInterpolate: multi-event hours average; edge hours extend flat") {
    val dir = java.nio.file.Files.createTempDirectory("graft_interp2_").toString
    // hour 01 observed twice (avg 3.0), hour 03 observed (9.0) —
    // hour 00 does not exist (spine starts at first OBSERVED hour),
    // hour 02 interpolates to 6.0
    Seq(
      (1L, ts("2024-01-01 01:10:00"), 1L, "a", 2.0, "{}"),
      (2L, ts("2024-01-01 01:50:00"), 1L, "a", 4.0, "{}"),
      (3L, ts("2024-01-01 03:00:00"), 1L, "a", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.eventsInterpolate(spark, dir)
      .select(col("hour_ts").cast("string"), col("filled_value"))
      .as[(String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("2024-01-01 01:00:00", 3.0),
      ("2024-01-01 02:00:00", 6.0),
      ("2024-01-01 03:00:00", 9.0)))
  }

  // ---- Quality.fdViolations ----

  test("fdViolations: only determinants with >1 distinct dependent; nulls don't conflict") {
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),          // consistent → absent
      (2L, Some("x")), (2L, Some("y")), (2L, None), // 2 distinct + null
      (3L, None), (3L, Some("z"))                 // null vs value → NOT a violation
    ).toDF("det", "dep")
    val got = Quality.fdViolations(df, Seq("det"), "dep")
      .select("det", "n_dependent", "n_rows", "dep_min", "dep_max")
      .as[(Long, Long, Long, String, String)].collect()
    assert(got.toSeq === Seq((2L, 2L, 3L, "x", "y")))
  }

  test("fdViolations: composite determinant") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 1L, 11L), // violated on (a,1)
      ("a", 2L, 10L), ("b", 1L, 10L)
    ).toDF("c1", "c2", "dep")
    val got = Quality.fdViolations(df, Seq("c1", "c2"), "dep")
      .select("c1", "c2", "n_dependent").as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("a", 1L, 2L)))
  }

  // ---- Models.inferredMembers ----

  test("inferredMembers: placeholders only for missing fact keys; nulls and dupes handled") {
    val dim = Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("k", "name", "bal")
    val fact = Seq((1L, 5.0), (3L, 6.0), (3L, 7.0), (4L, 8.0))
      .toDF("cust", "amt")
      .union(Seq((Option.empty[Long], 9.0)).toDF("cust", "amt"))
    val got = graft.pipeline.Models.inferredMembers(dim, fact, "k", "cust",
        Map("name" -> lit("UNKNOWN")))
      .select("k", "name", "bal", "is_inferred")
      .as[(Long, String, Option[Double], Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "alice", Some(10.0), false), (2L, "bob", Some(20.0), false),
      (3L, "UNKNOWN", None, true),      // duplicate fact keys mint ONE row
      (4L, "UNKNOWN", None, true)))     // null fact keys mint nothing
  }

  // ---- Quality.benford ----

  test("benford: leading digits from decimal strings; zeros/nulls excluded; shares sum to 1") {
    val df = Seq(100.0, 150.0, 0.09, 2.5, -33.3, 0.0, 19.0)
      .toDF("v").union(Seq(Option.empty[Double]).toDF("v"))
    val got = Quality.benford(df, "v")
      .select("digit", "n", "obs_share", "exp_share")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    // digits: 100→1, 150→1, 0.09→9, 2.5→2, -33.3→3, 19→1; 0.0/null excluded
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq((1, 3L), (2, 1L), (3, 1L), (9, 1L)))
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-5) // round(6) shares
    // Benford expectation for digit 1 is log10(2) ≈ 0.30103
    assert(got.head._4 === 0.30103)
  }

  test("benford: grouped screen keeps groups independent") {
    val df = Seq(("a", 11.0), ("a", 12.0), ("b", 90.0)).toDF("g", "v")
    val got = Quality.benford(df, "v", Seq("g"))
      .select("g", "digit", "obs_share").as[(String, Int, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(("a", 1, 1.0), ("b", 9, 1.0)))
  }

  // ---- IncrementalAgg sketch-distinct ----

  test("sketch distinct MV: fold of N deltas equals the full-corpus sketch exactly") {
    val full = spark.range(0, 30000).select(
      (col("id") % 5).as("k"),
      // ~4k distinct values per key — well past exact-count territory
      concat(lit("v"), (col("id") * 2654435761L % 20011L)).as("v"))
    val parts = (0 until 3).map(i => full.filter(col("id") % 3 === i))
    val folded = parts.tail.foldLeft(
      IncrementalAgg.initDistinctSketch(parts.head, Seq("k"), "v")) {
      (st, d) => IncrementalAgg.maintainDistinctSketch(st, d, Seq("k"), "v")
    }
    val got = IncrementalAgg.finalizeDistinctSketch(folded, Seq("k"))
      .as[(Long, Long)].collect().toMap
    val oneShot = IncrementalAgg.finalizeDistinctSketch(
      IncrementalAgg.initDistinctSketch(full, Seq("k"), "v"), Seq("k"))
      .as[(Long, Long)].collect().toMap
    // sketch union is exact over sketches: fold ≡ one-shot, bit-equal
    assert(got === oneShot)
    // and the estimate lands within HLL error of the exact count
    val exact = full.select("k", "v").distinct().groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(got(k) - n).toDouble / n < 0.05,
        s"key $k: estimate ${got(k)} vs exact $n")
    }
  }

  test("sketch distinct MV: null values never counted") {
    val df = Seq((1L, Some("a")), (1L, None), (1L, Some("b"))).toDF("k", "v")
    val got = IncrementalAgg.finalizeDistinctSketch(
      IncrementalAgg.initDistinctSketch(df, Seq("k"), "v"), Seq("k"))
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }

  // ---- Analytics.frequentTriples ----

  test("frequentTriples: Apriori pruning equals brute force where pruning bites") {
    // orders crafted so pruning has real work: item "z" is infrequent
    // (1 order), pair (a,c) is frequent but (a,b,c) is not, and
    // (a,b,d) is the one frequent triple (support 2)
    val baskets = Seq(
      1L -> Seq("a", "b", "d"),
      2L -> Seq("a", "b", "d", "z"),
      3L -> Seq("a", "c"),
      4L -> Seq("a", "c"),
      5L -> Seq("b", "c"))
    val items = baskets.flatMap { case (o, bs) => bs.map(o -> _) }
      .toDF("o", "b")
    val s = 2L
    val got = Analytics.frequentTriplesFromItems(items, s)
      .as[(String, String, String, Long)].collect().sorted
    assert(got.toSeq === Seq(("a", "b", "d", 2L)))
    // brute force: unpruned triple join with the same support
    val brute = items.as("x")
      .join(items.as("y"), $"x.o" === $"y.o" && $"x.b" < $"y.b")
      .join(items.as("z"), $"y.o" === $"z.o" && $"y.b" < $"z.b")
      .groupBy($"x.b", $"y.b", $"z.b").count()
      .filter(col("count") >= s)
      .as[(String, String, String, Long)].collect().sorted
    assert(got.toSeq === brute.toSeq)
    Par.release()
  }

  // ---- Analytics.topPaths ----

  test("topPaths: lead-chain trigrams counted globally, tie-break pinned") {
    val ev = Seq(
      // u1: a b c a b c  → abc x2, bca, cab
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"), (5L, "b"), (6L, "c"),
      // u2: a b c → abc (timelines never cross users)
      (11L, "a"), (12L, "b"), (13L, "c")
    ).map { case (id, t) =>
      (id % 10 match { case x => if (id > 10) 2L else 1L }, t,
        ts(f"2024-01-01 00:${id % 60}%02d:00"), id)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.topPaths(ev, "user_id", "event_type", "ts", "event_id",
        len = 3, k = 10)
      .as[(String, Long)].collect()
    assert(got.head === (("a>b>c", 3L)))
    assert(got.toMap === Map("a>b>c" -> 3L, "b>c>a" -> 1L, "c>a>b" -> 1L))
    // tie-break: equal counts sort by path ascending
    assert(got.toSeq.drop(1).map(_._1) === Seq("b>c>a", "c>a>b"))
  }

  test("cohortLtv: cumulative revenue per first-month cohort normalized by cohort size") {
    import graft.pipeline.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val orders = Seq(
      (1L, ts("2024-01-05 00:00:00"), 100.0),
      (1L, ts("2024-03-10 00:00:00"), 50.0),   // period 2 for the Jan cohort
      (2L, ts("2024-01-20 00:00:00"), 200.0),
      (3L, ts("2024-02-02 00:00:00"), 300.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.cohortLtv(orders)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val jan = 2024 * 12 + 1; val feb = jan + 1
    assert(out((jan, 0)) === ((2L, 300.0, 300.0, 150.0)))
    assert(out((jan, 2)) === ((2L, 50.0, 350.0, 175.0)))
    assert(out((feb, 0)) === ((1L, 300.0, 300.0, 300.0)))
    assert(out.size === 3)
  }

  test("referentialIntegrity: orphan rows/keys per edge, nulls excluded, clean edge zero") {
    import graft.operators.Quality
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val cleanChild = Seq(1L, 2L).toDF("fk")
    val out = Quality.referentialIntegrity(Seq(
        ("dirty", child, "fk", parent, "pk"),
        ("clean", cleanChild, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("dirty") === ((4L, 3L, 1L, 1L)))  // null FK not an orphan
    assert(out("clean") === ((2L, 2L, 0L, 0L)))
  }

  test("basketRules: directional confidence, lift, minCount cut — hand-computed") {
    import graft.pipeline.Analytics
    // baskets: {A,B}, {A,B}, {A}, {A,C} → c_A=4, c_B=2, c_C=1, N=4
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (4L, 10L), (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketRules(li, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // only the A↔B pair survives minCount; A→B conf 0.5, B→A conf 1.0
    assert(out.keySet === Set((10L, 20L), (20L, 10L)))
    assert(out((10L, 20L)) === ((2L, 0.5, 0.5, 1.0)))
    assert(out((20L, 10L)) === ((2L, 0.5, 1.0, 1.0)))
    Par.release()
  }

  test("rfm: quintile scores with 5 customers are ranks; recency against the corpus max date") {
    import graft.pipeline.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // cust i: frequency i, monetary 100·i, last order on Jan i
    val rows = (1 to 5).flatMap { i =>
      (1 to i).map { j =>
        (i.toLong, ts(if (j == i) f"2024-01-0$i 00:00:00"
                      else "2024-01-01 00:00:00"), 100.0)
      }
    }
    val orders = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.rfm(orders)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getString(7)))).toMap
    (1 to 5).foreach { i =>
      val (rec, freq, rs, fs, ms, code) = out(i.toLong)
      assert(rec === 5 - i && freq === i.toLong)
      assert((rs, fs, ms) === ((i, i, i)), s"cust $i")
      assert(code === s"$i$i$i")
    }
  }

  test("rfmBucketed ≡ rfm row-for-row: uneven n mod k, ties on every axis, across partitionings") {
    import graft.pipeline.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 23 customers (23 mod 5 = 3 — the uneven-bucket arithmetic is
    // exercised), heavy TIES on every axis (monetary/frequency/last
    // date collide across customers so the key tie-break decides)
    val rows = (1 to 23).flatMap { i =>
      val nOrders = 1 + (i % 4)
      (1 to nOrders).map { j =>
        (i.toLong,
          ts(f"2024-01-${1 + (i % 9)}%02d 00:00:00"),
          100.0 * (1 + (i % 6)))
      }
    }
    val orders = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("o_custkey")).collect().map(_.toSeq).toSeq
    val exact = norm(Analytics.rfm(orders))
    assert(norm(Analytics.rfmBucketed(orders)) === exact)
    // repartitioning must not move a single score (deterministic
    // boundaries, offset ranks, pinned tie-breaks)
    assert(norm(Analytics.rfmBucketed(orders.repartition(7))) === exact)
    Par.release()
  }

  test("byGapIncremental ≡ full resessionization: extend, bridge, untouched carry, new user") {
    val gap = 300L
    // history: A one session (0,100); B two sessions (0 / 10000); C one session
    val hist = Seq(("a", 0L), ("a", 100L), ("b", 0L), ("b", 10000L),
      ("c", 50L)).toDF("u", "t")
    // delta: extends A (200), bridges B if within gap of neither?? —
    // 9900 is within 300 of 10000 but not of 0: B stays two sessions
    // but the SECOND gains an event; D is brand new; C untouched
    val delta = Seq(("a", 200L), ("b", 9900L), ("d", 7L)).toDF("u", "t")
    val stored = Sessionize.byGap(hist, "u", "t", gap)
    val incr = Sessionize.byGapIncremental(stored, hist, delta, "u", "t", gap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSet
    val full = Sessionize.byGap(hist.unionByName(delta), "u", "t", gap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSet
    assert(incr === full)
    // semantic spot checks: A extended to 3 events, one session;
    // B's late event lands mid-gap and BRIDGES nothing new but joins
    // session 2; C carried forward; D appears
    val byUser = incr.groupBy(_._1)
    assert(byUser("a") === Set(("a", 1L, 200L, 3L)))
    assert(byUser("b").map(_._2) === Set(1L, 2L))
    assert(byUser("b").find(_._2 == 2L).get._4 === 2L)
    assert(byUser("c") === Set(("c", 1L, 0L, 1L)))
    assert(byUser("d") === Set(("d", 1L, 0L, 1L)))
  }

  test("entryExit: entry/exit by (ts,id) extrema, same-ts tie on id, bounce flag, session split") {
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, "view", t(0)), (1L, 2L, "click", t(10)),   // session 1
      (1L, 3L, "purchase", t(5000)),                      // session 2: bounce
      (2L, 5L, "b", t(7)), (2L, 4L, "a", t(7))            // same-ts tie
    ).toDF("u", "id", "typ", "ts")
    val out = Sessionize.entryExit(ev, "u", "id", "typ", "ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getLong(5), r.getString(6), r.getString(7),
          r.getBoolean(8)))).toMap
    assert(out((1L, 1L)) === ((10L, 2L, "view", "click", false)))
    assert(out((1L, 2L)) === ((0L, 1L, "purchase", "purchase", true)))
    // ts tie: entry = lowest id ("a"), exit = highest id ("b")
    assert(out((2L, 1L)) === ((0L, 2L, "a", "b", false)))
  }

  test("concurrency: within-bucket sweep peak, cross-bucket carry, quiet spanned buckets on the grid") {
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val sess = Seq((t(0L), t(4L)), (t(2L), t(11L)), (t(25L), t(26L)))
      .toDF("st", "en")
    val out = Sessionize.concurrency(sess, "st", "en", bucketSeconds = 10L)
      .collect().map(r => (r.getTimestamp(0).getTime / 1000) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // bucket 0: both sessions overlap on [2,4] → peak 2; one ends (4)
    assert(out(0L) === ((0L, 2L, 2L, 1L)))
    // bucket 10: carried-in session B still open, ends at 11
    assert(out(10L) === ((1L, 1L, 0L, 1L)))
    // bucket 20: C opens and closes inside
    assert(out(20L) === ((0L, 1L, 1L, 1L)))
    // a session SPANNING a quiet bucket still reports concurrency
    val span = Seq((t(0L), t(25L))).toDF("st", "en")
    val q = Sessionize.concurrency(span, "st", "en", bucketSeconds = 10L)
      .collect().map(r => (r.getTimestamp(0).getTime / 1000) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(q(10L) === ((1L, 1L, 0L, 0L))) // no deltas, peak = carry
    assert(q(20L) === ((1L, 1L, 0L, 1L)))
    // r11 ADVICE regression: [0,10] and [11,20] share no active
    // second (inclusive ends) — peak must be 1, not 2 (the old form
    // added the same second's removals back into the count at 11)
    val touching = Seq((t(0L), t(10L)), (t(11L), t(20L))).toDF("st", "en")
    val tc = Sessionize.concurrency(touching, "st", "en",
        bucketSeconds = 3600L)
      .collect().map(r => (r.getTimestamp(0).getTime / 1000) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(tc(0L) === ((0L, 1L, 2L, 2L)))
    // boundary −1 exactly at bucket start: [0,9] is never open in
    // bucket 10, so the carry plateau must NOT count there
    val edge = Seq((t(0L), t(9L))).toDF("st", "en")
    val ec = Sessionize.concurrency(edge, "st", "en", bucketSeconds = 10L)
      .collect().map(r => (r.getTimestamp(0).getTime / 1000) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(ec(0L) === ((0L, 1L, 1L, 1L)))
    assert(ec(10L) === ((1L, 0L, 0L, 0L)))
  }

  test("periodEndBalances: exact running balances, quiet-month carry-forward, per-account grid spans") {
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val txns = Seq(
      (1L, t("1970-01-10"), 4.0), (1L, t("1970-01-20"), 6.0), // m0 sums to 10
      (1L, t("1970-03-05"), 5.0),                             // m2 → 15
      (2L, t("1970-02-14"), 7.0)                              // m1 only
    ).toDF("a", "ts", "amt")
    val out = Analytics.periodEndBalances(txns, "a", "ts", "amt")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString.take(10)) -> r.getDouble(2)).toMap
    // account 1 spans m0..m2 with the quiet Feb carried at 10
    assert(out((1L, "1970-01-01")) === 10.0)
    assert(out((1L, "1970-02-01")) === 10.0)
    assert(out((1L, "1970-03-01")) === 15.0)
    // account 2 starts at ITS first month, carried to the global max
    assert(out((2L, "1970-02-01")) === 7.0)
    assert(out((2L, "1970-03-01")) === 7.0)
    assert(!out.contains((2L, "1970-01-01"))) // before first activity
    assert(out.size === 5)
  }

  test("weekOverWeek: consecutive-week delta and pct, gap week nulls the comparison") {
    def t(s: String) = Timestamp.valueOf(s + " 12:00:00")
    // weeks (Mon-aligned): 1970-01-05 = w0, 01-12 = w1, 01-26 = w3
    val ev = Seq(
      ("a", t("1970-01-05")), ("a", t("1970-01-07")), // w0: 2
      ("a", t("1970-01-12")), ("a", t("1970-01-13")), ("a", t("1970-01-14")), // w1: 3
      ("a", t("1970-01-26"))                          // w3: 1 (gap at w2)
    ).toDF("k", "ts")
    val out = Analytics.weekOverWeek(ev, "k", "ts")
      .collect().map(r => r.getTimestamp(1).toString.take(10) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out("1970-01-05") === ((2L, None, None)))          // first week
    assert(out("1970-01-12") === ((3L, Some(1L), Some(0.5))))
    assert(out("1970-01-26") === ((1L, None, None)))          // gap breaks WoW
  }

  test("dimDate: leap month-end, epoch-day iso_dow, weekend, week_index — engine-convention-free") {
    val facts = Seq("2024-02-27", "2024-03-02").toDF("d")
      .select(col("d").cast("date").as("d"))
    val out = graft.pipeline.Models.dimDate(facts, "d")
      .collect().map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getBoolean(7), r.getBoolean(8), r.getLong(9)))).toMap
    assert(out.size === 5) // the spine fills 02-27..03-02 inclusive
    // 2024-02-29 (leap day, a Thursday, end of February)
    assert(out("2024-02-29") ===
      ((20240229, 2024, 1, 2, 29, 4, false, true, 2825L)))
    // 2024-03-02 is a Saturday → weekend; same ISO week as Feb 29
    assert(out("2024-03-02") ===
      ((20240302, 2024, 1, 3, 2, 6, true, false, 2825L)))
    assert(out("2024-03-01")._8 === false) // Mar 1 is not month-end
  }
}
