package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key sequential recurrences no batch window can express —
  * Holt-Winters trend smoothing and CUSUM change detection, the two
  * classic monitors a warehouse runs over its event streams (the
  * reference's freshness/volume checks ask "is today normal?"; these
  * answer it with memory). Both are true recurrences: the state at
  * row t is a non-associative function of the state at t−1, so
  * neither `sum over window` nor any Catalyst aggregate computes
  * them. The engine's pattern for this shape (cf. streaming
  * EventStream.ewma for the unbounded streaming form): ONE hash
  * exchange on the key, a per-partition sort on (key, ts, id), and a
  * single streaming `mapPartitions` fold that resets at key
  * boundaries — no per-group materialization, no windows, no driver
  * state; memory is O(1) per partition, so the fold survives any key
  * cardinality and any per-key history length that fits a partition's
  * sorted run (spill-backed sort).
  *
  * Oracle parity: coefficients are chosen dyadic (0.5) and constants
  * pre-folded driver-side, so every step is IEEE multiply-by-half and
  * identically-ordered adds — bit-exact against a recursive-CTE
  * replay, the stream_ewma discipline (SURVEY §6).
  */
object Recurrence {

  /** Holt's DOUBLE exponential smoothing — level + trend ONLY, no
    * seasonal term (the full triple/Holt-Winters form with a
    * seasonal component is [[holtWintersSeasonal]]; this method
    * keeps its historical name for API stability). α = β = ½:
    *   l_t = ½·x_t + ½·(l_{t−1} + b_{t−1})
    *   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}
    * seeded l_1 = x_1, b_1 = 0. Emits every input row with its
    * smoothed `level` and `trend` — the one-step-ahead forecast is
    * level + trend, left to the caller (a plain column add).
    */
  def holtWinters(events: DataFrame, keyCol: String, idCol: String,
                  tsCol: String, valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("timestamp"), col(valueCol).cast("double"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey = 0L
        var lvl = 0.0
        var trend = 0.0
        it.map { case (k, id, ts, v) =>
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k
            lvl = v; trend = 0.0
          } else {
            val nl = 0.5 * v + 0.5 * (lvl + trend)
            trend = 0.5 * (nl - lvl) + 0.5 * trend
            lvl = nl
          }
          (k, id, ts, v, lvl, trend)
        }
      }
      .toDF(keyCol, idCol, tsCol, valueCol, "level", "trend")
  }

  /** TRIPLE (seasonal additive) exponential smoothing — the full
    * Holt-Winters form (Winters '60), α = β = γ = ½, over the per-key
    * HOURLY VOLUME grid (the regular series [[graft.operators.Quality
    * .seasonalAnomaly]] monitors — raw events are irregular, so the
    * seasonal index needs a grid):
    *   l_t = ½·(x_t − s_{t−p}) + ½·(l_{t−1} + b_{t−1})
    *   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}
    *   s_t = ½·(x_t − l_t) + ½·s_{t−p}
    * where the seasonal slot is (epoch-hours mod `period`) — with
    * period 24, hour-of-day UTC — and s_{t−p} is the slot's previous
    * smoothed value. Seeding: first row of a key takes l = x, b = 0,
    * all slots 0 (so its s-update lands 0 by the same formula —
    * seeding and steady state cannot diverge); a slot never seen
    * before contributes s_{t−p} = 0, which handles gap hours and
    * short histories without a one-full-season bootstrap pass.
    *
    * Bucket volumes are exact integer counts cast to double, every
    * coefficient is dyadic, and all step arithmetic is the identical
    * IEEE expression both engines evaluate — so the recurrence
    * replays BIT-EXACT in a recursive CTE carrying the `period`
    * seasonal slots as columns (the [[holtWinters]] discipline, plus
    * a ring of seasonal state). Plan shape: one grid aggregation
    * (key+hour keyed), one key exchange, a per-partition sorted fold
    * with O(period) memory per key — no windows, no driver state.
    *
    * Emits one row per (key, hour bucket) with the smoothed level,
    * trend, and the slot's updated seasonal component; the
    * one-step-ahead forecast for slot σ is level + trend + s[σ],
    * left to the caller.
    */
  def holtWintersSeasonal(events: DataFrame, keyCol: String, tsCol: String,
                          period: Int = 24): DataFrame = {
    require(period >= 2 && period <= 1024, "period in [2, 1024]")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(col(keyCol).cast("string").as("k"),
        date_trunc("hour", col(tsCol).cast("timestamp")).as("bucket"))
      .agg(count(lit(1)).cast("double").as("x"))
      .withColumn("slot",
        (floor(col("bucket").cast("long") / 3600L) % period).cast("int"))
      .select(col("k"), col("bucket"), col("x"), col("slot"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("bucket"))
      .as[(String, java.sql.Timestamp, Double, Int)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey: String = null
        var lvl = 0.0
        var tr = 0.0
        val season = new Array[Double](period)
        it.map { case (k, bucket, x, slot) =>
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k
            lvl = x; tr = 0.0
            java.util.Arrays.fill(season, 0.0)
          } else {
            val sPrev = season(slot)
            val nl = 0.5 * (x - sPrev) + 0.5 * (lvl + tr)
            tr = 0.5 * (nl - lvl) + 0.5 * tr
            lvl = nl
          }
          val sNew = 0.5 * (x - lvl) + 0.5 * season(slot)
          season(slot) = sNew
          (k, bucket, slot.toLong, x, lvl, tr, sNew)
        }
      }
      .toDF(keyCol, "bucket", "slot", "x", "level", "trend", "seasonal")
  }

  /** EWMA control band (α = ½ exponentially-weighted mean AND
    * variance per key) — the SELF-TUNING companion to [[cusum]]:
    * CUSUM needs a known target and slack; the band learns the
    * process level and spread as it goes and flags points outside
    * mean ± 3·σ of the PRIOR state (the flag must not use the point
    * being judged). Recurrences, both dyadic:
    *   m_t = ½·x_t + ½·m_{t−1}
    *   v_t = ½·(x_t − m_{t−1})² + ½·v_{t−1}
    * seeded m_1 = x_1, v_1 = 0; breach_t = v_{t−1} > 0 ∧
    * |x_t − m_{t−1}| > 3·√v_{t−1} (the v > 0 guard keeps a constant
    * series from flagging its first wobble against a zero-width
    * band... and from flagging nothing-at-all forever after, which
    * is the correct reading: a constant series that moves IS the
    * anomaly, caught the step AFTER variance first appears).
    */
  def ewmaBand(events: DataFrame, keyCol: String, idCol: String,
               tsCol: String, valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("timestamp"), col(valueCol).cast("double"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey = 0L
        var m = 0.0
        var v = 0.0
        it.map { case (k, id, ts, x) =>
          var breach = false
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k
            m = x; v = 0.0
          } else {
            val dev = x - m
            breach = v > 0.0 && math.abs(dev) > 3.0 * math.sqrt(v)
            val nm = 0.5 * x + 0.5 * m
            v = 0.5 * (dev * dev) + 0.5 * v
            m = nm
          }
          (k, id, ts, x, m, v, breach)
        }
      }
      .toDF(keyCol, idCol, tsCol, valueCol, "ew_mean", "ew_var", "breach")
  }

  /** Two-sided CUSUM (Page '54) drift detector:
    *   s⁺_t = max(0, s⁺_{t−1} + (x_t − kUp))
    *   s⁻_t = max(0, s⁻_{t−1} + (kDn − x_t))
    * with kUp = target + slack and kDn = target − slack pre-folded to
    * single literals driver-side (one subtraction per step, same as
    * the SQL replay), both accumulators seeded at 0, and a breach
    * flag when either side exceeds threshold `h`. Catches slow mean
    * drifts that per-row outlier screens (MAD, z-score) integrate
    * away.
    */
  def cusum(events: DataFrame, keyCol: String, idCol: String,
            tsCol: String, valueCol: String,
            target: Double, slack: Double, h: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val kUp = target + slack
    val kDn = target - slack
    events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("timestamp"), col(valueCol).cast("double"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey = 0L
        var sPos = 0.0
        var sNeg = 0.0
        it.map { case (k, id, ts, v) =>
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k
            sPos = 0.0; sNeg = 0.0
          }
          sPos = math.max(0.0, sPos + (v - kUp))
          sNeg = math.max(0.0, sNeg + (kDn - v))
          (k, id, ts, v, sPos, sNeg, sPos > h || sNeg > h)
        }
      }
      .toDF(keyCol, idCol, tsCol, valueCol, "cusum_pos", "cusum_neg", "breach")
  }

  /** Pettitt change-point test (Pettitt '79) per key — the
    * nonparametric "did the level shift, and where?" monitor: for a
    * series x_1..x_n, U_t = 2·Σ_{i≤t} r_i − t(n+1) with r_i the
    * (tie-averaged) rank of x_i, K = max_{t<n} |U_t|, change point at
    * the earliest argmax, approx p ≈ 2·exp(−6K²/(n³+n²)). Rank-based
    * ⟹ robust to outliers (the Mann-Whitney of change detection —
    * CUSUM needs a known target level; this needs nothing).
    *
    * Everything before the p-value is EXACT INTEGER arithmetic:
    * 2·avg_rank = 2·(rank−1) + ties + 1 is an integer, so U_t is an
    * integer running sum — cross-engine hash-stable with no rounding
    * discipline needed; the single p-value expression is one exp on
    * integer inputs. Plan shape: three window families all
    * partitioned BY THE KEY, so thousands of series fan out across
    * the cluster on one exchange; no series ever leaves its reducer.
    *
    * @param series one row per (key, ts) — an already-aggregated
    *               regular or irregular series
    * @return (key, n, cp_ts, k_stat, p_value), one row per key with
    *         n ≥ 2 (a 1-point series has no interior split)
    */
  def pettitt(series: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val eq = Window.partitionBy(col(keyCol), col(valueCol))
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(keyCol))
    val u = series.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__r2", (lit(2L) * (rank().over(byVal) - 1)
        + count(lit(1)).over(eq) + 1).cast("long"))
      .withColumn("__t", row_number().over(byTs).cast("long"))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__u",
        sum(col("__r2")).over(cum) - col("__t") * (col("__n") + 1))
      .filter(col("__t") < col("__n"))  // U_n ≡ 0: not a split point
      .withColumn("__k", max(abs(col("__u"))).over(whole))
    u.filter(abs(col("__u")) === col("__k"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), min(col(tsCol)).as("cp_ts"),
        max(col("__k")).as("k_stat"))
      .select(col(keyCol), col("n"), col("cp_ts"), col("k_stat"),
        round(least(lit(1.0), lit(2.0) * exp(lit(-6.0)
            * col("k_stat").cast("double") * col("k_stat").cast("double")
            / (col("n") * col("n") * col("n") + col("n") * col("n"))
              .cast("double"))), roundTo)
          .as("p_value"))
  }

  /** Kaplan–Meier survival estimator per key (Kaplan & Meier '58 —
    * THE right-censored time-to-event curve: retention/churn where
    * still-active users must not count as churned, they just stop
    * being observed): with dₜ events and mₜ departures (events +
    * censorings) at duration t, the at-risk set is the integer
    * suffix sum nₜ = Σ_{u≥t} mₜ, and S(t) = Π_{u≤t}(nᵤ−dᵤ)/nᵤ over
    * event times only (censorings shrink the risk set but never the
    * product — the whole point of the estimator; ties at t count
    * events before censorings, the standard convention, which the
    * suffix sum encodes by keeping same-t censored subjects in nₜ).
    *
    * The product is a TRUE recurrence (non-associative in float),
    * folded per key in the engine's one-exchange sorted
    * mapPartitions pass: each step is one correctly-rounded
    * division then one multiply — the identical IEEE sequence a
    * recursive CTE replays, so the curve hash-grades BIT-EXACT
    * (the holtWinters discipline; integer inputs, no rounding).
    * Plan: one (key, t) aggregate, one integer suffix-sum window,
    * one keyed fold — O(1) state per partition, any key count.
    *
    * @param subjects one row per subject: key, integer duration,
    *                 0/1 event flag (1 = event observed, 0 = right-
    *                 censored at that duration)
    */
  def kaplanMeier(subjects: DataFrame, keyCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = subjects.sparkSession
    import spark.implicits._
    val tbl = subjects
      .select(col(keyCol).cast("long").as("__k"),
        col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__ev"))
      .groupBy(col("__k"), col("__t"))
      .agg(sum(col("__ev")).as("__d"), count(lit(1)).as("__m"))
    val suffix = Window.partitionBy(col("__k")).orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl
      .withColumn("__n", sum(col("__m")).over(suffix))
      .filter(col("__d") >= 1) // event times only
      .select(col("__k"), col("__t"), col("__n"), col("__d"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var hasKey = false
        var cur = 0L
        var surv = 1.0
        it.map { case (k, t, n, d) =>
          if (!hasKey || k != cur) { hasKey = true; cur = k; surv = 1.0 }
          val q = (n - d).toDouble / n.toDouble
          surv = surv * q
          (k, t, n, d, surv)
        }
      }
      .toDF(keyCol, "t_duration", "n_risk", "n_events", "survival")
  }

  /** Nelson–Aalen cumulative hazard per key (Nelson '72 / Aalen '78)
    * — the additive companion of [[kaplanMeier]]'s multiplicative
    * survival curve: H(t) = Σ_{u≤t} dᵤ/nᵤ over event times, the
    * "accumulated risk so far" reading that adds across time (and
    * whose increments ARE the per-time hazard rates KM's product
    * hides). Preferred over −ln(KM) in small risk sets, where the
    * product estimator biases.
    *
    * Portability discipline: risk sets are the same exact integer
    * suffix sums as KM; each per-time increment d/n is ONE double
    * division rounded to 6 and 1e6-scaled to a long, and the
    * cumulative hazard is the INTEGER running sum of those terms —
    * unlike KM's product this needs no sequential float fold, so it
    * is a pure window expression (no mapPartitions) and replays
    * hash-exact in plain SQL with no recursion. Same event-before-
    * censoring tie convention as KM (same-t censored subjects stay
    * in nₜ).
    */
  def nelsonAalen(subjects: DataFrame, keyCol: String,
                  durationCol: String, eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def s6(t: Column): Column = round(t * lit(1000000.0)).cast("long")
    val tbl = subjects
      .select(col(keyCol).cast("long").as("__k"),
        col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__ev"))
      .groupBy(col("__k"), col("__t"))
      .agg(sum(col("__ev")).as("__d"), count(lit(1)).as("__m"))
    val suffix = Window.partitionBy(col("__k")).orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl
      .withColumn("__n", sum(col("__m")).over(suffix))
      .filter(col("__d") >= 1)
      .withColumn("__h6",
        s6(col("__d").cast("double") / col("__n").cast("double")))
      .withColumn("cum_hazard",
        sum(col("__h6")).over(cum).cast("double") / lit(1000000.0))
      .select(col("__k").as(keyCol), col("__t").as("t_duration"),
        col("__n").as("n_risk"), col("__d").as("n_events"),
        col("cum_hazard"))
  }

  /** Log-rank test (Mantel '66 / Peto & Peto '72) — the hypothesis
    * test over [[kaplanMeier]]'s curves: "are these two groups'
    * time-to-event distributions actually different, or is the gap
    * between their survival curves noise?" At each event time t with
    * d events out of n at risk (n₁ in group A), group A's expected
    * events are E_t = d·n₁/n under H₀ and the hypergeometric
    * variance is V_t = d·n₁·n₂·(n−d)/(n²·(n−1)); the statistic is
    * z = Σ(O_t−E_t)/√ΣV_t, χ² = z².
    *
    * Portability discipline: the risk sets are exact integer suffix
    * sums over the (group × duration) grid (censorings shrink the
    * risk set but contribute no event, the KM convention); each
    * per-time E_t and V_t term is one fixed double tree on exact
    * integers, rounded to 6 and 1e6-scaled to a long (the chi2
    * r6-scaling trick), and ΣE/ΣV are ORDER-FREE integer sums — so
    * z and χ² are one double tree on two longs and an exact integer
    * event count, hash-stable in any engine (off the true statistic
    * by < times·5e-7, documented). Single-subject times (n = 1)
    * contribute V = 0 and are E-degenerate the same way in both
    * engines. The grid is distinct-durations × 2 — bounded by the
    * duration range, never the subject count; subject-sized work is
    * one group-by. Zero total variance → z/χ² null.
    */
  def logRank(subjects: DataFrame, groupCol: String, durationCol: String,
              eventCol: String, groupA: String, groupB: String,
              roundTo: Int = 6): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    def s6(t: Column): Column = round(t * lit(1000000.0)).cast("long")
    val per = subjects
      .filter(col(groupCol).cast("string").isin(groupA, groupB))
      .select((col(groupCol).cast("string") === groupA).as("__isA"),
        col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__ev"))
      .groupBy(col("__isA"), col("__t"))
      .agg(sum(col("__ev")).as("__d"), count(lit(1)).as("__m"))
    // zero-filled grid over the shared time axis so BOTH groups'
    // risk sets are defined at every observed time
    val grid = per.select(col("__t")).distinct()
      .crossJoin(Seq(true, false).toDF("__isA"))
      .join(per, Seq("__isA", "__t"), "left")
      .na.fill(0L, Seq("__d", "__m"))
    val suffix = Window.partitionBy(col("__isA")).orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid.withColumn("__n", sum(col("__m")).over(suffix))
    val a = atRisk.filter(col("__isA"))
      .select(col("__t"), col("__d").as("__d1"), col("__n").as("__n1"))
    val b = atRisk.filter(!col("__isA"))
      .select(col("__t"), col("__d").as("__d2"), col("__n").as("__n2"))
    val nT = d(col("__n1") + col("__n2"))
    val dT = d(col("__d1") + col("__d2"))
    val terms = a.join(b, Seq("__t"))
      .filter(col("__d1") + col("__d2") >= 1)
      .select(col("__d1"), col("__d2"),
        s6(dT * d(col("__n1")) / nT).as("__e6"),
        when(col("__n1") + col("__n2") > 1,
          s6(dT * d(col("__n1")) * d(col("__n2")) * (nT - dT)
            / (nT * nT * (nT - lit(1.0))))).otherwise(lit(0L)).as("__v6"))
      .agg(sum(col("__d1")).as("d_a"), sum(col("__d2")).as("d_b"),
        sum(col("__e6")).as("__se6"), sum(col("__v6")).as("__sv6"))
    // subject counts ride a 1-row frame (the q11/q15 scalar shape)
    val counts = per.groupBy()
      .agg(sum(when(col("__isA"), col("__m")).otherwise(lit(0L))).as("n_a"),
        sum(when(!col("__isA"), col("__m")).otherwise(lit(0L))).as("n_b"))
    val eA = col("__se6").cast("double") / lit(1000000.0)
    val vSum = col("__sv6").cast("double") / lit(1000000.0)
    val z = (d(col("d_a")) - eA) / sqrt(vSum)
    counts.crossJoin(broadcast(terms))
      .select(col("n_a"), col("n_b"), col("d_a"), col("d_b"),
        round(eA, roundTo).as("e_a"),
        round(when(col("__sv6") > 0, z), roundTo).as("z"),
        round(when(col("__sv6") > 0, z * z), roundTo).as("chi2"))
  }

  /** Per-key DEBOUNCE — keep an event only if it falls at least
    * `gapSeconds` after the last KEPT event of its key (the first
    * event of a key is always kept). The rate-limiting curation
    * primitive behind "one notification per 6 h", bot-burst
    * squashing, and poll-spam collapse — and a TRUE recurrence:
    * whether a row survives depends on the last SURVIVOR, not the
    * last row, so `lag()` cannot express it (lag sees dropped rows
    * too) and the engine folds it in the one-exchange sorted
    * mapPartitions pass. State is a single exact epoch-second long
    * per key — integer comparisons, no float drift, hash-stable in
    * any engine replaying the same (ts, id)-ordered walk. Ties on
    * ts order by id; sub-second fractions truncate to the epoch
    * second on both engines (documented grain).
    */
  def debounce(events: DataFrame, keyCol: String, idCol: String,
               tsCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, "gapSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("timestamp"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .as[(Long, Long, java.sql.Timestamp)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey = 0L
        var lastKept = 0L
        it.flatMap { case (k, id, ts) =>
          val sec = Math.floorDiv(ts.getTime, 1000L)
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k; lastKept = sec
            Some((k, id, ts))
          } else if (sec - lastKept >= gapSeconds) {
            lastKept = sec
            Some((k, id, ts))
          } else None
        }
      }
      .toDF(keyCol, idCol, tsCol)
  }

  /** Croston's method (Croston '72) + the Syntetos–Boyan approximation
    * (SBA, Syntetos & Boylan '05) for INTERMITTENT demand — the
    * standard forecaster for slow-moving inventory, where most
    * periods sell ZERO and exponential smoothing of the raw series
    * (Holt) systematically undershoots right after each demand spike.
    * Croston smooths two series separately, updating ONLY on periods
    * with demand:
    *   z_t = ½·x_t + ½·z_{t−1}   (demand SIZE when x_t > 0)
    *   p_t = ½·q_t + ½·p_{t−1}   (inter-demand INTERVAL; q_t =
    *                              periods since the previous demand)
    * seeded z = x, p = q at the key's FIRST demand (q counted from
    * the series start); zero periods carry state and bump q. The
    * per-period forecast is z/p, and SBA's bias correction multiplies
    * by (1 − α/2) = ¾ — Croston's ratio overshoots because E[z/p] >
    * E[z]/E[p]. Both emitted per GRID period (null before the first
    * demand), so the output joins back to any calendar spine.
    *
    * Input must be the zero-FILLED demand grid (key × period, one row
    * per period — build it with a date-spine cross join); the fold
    * needs the zeros to count intervals. α = ½ keeps every step
    * dyadic: x is an integer count/quantity cast to double, q an
    * integer, so z and p are exact halving sums, and the ratio and
    * its ¾ scaling are single IEEE ops — the outputs ride UNROUNDED,
    * bit-identical in a recursive-CTE replay (the [[holtWinters]]
    * oracle discipline; rounding would only re-introduce the
    * half-digit hazard). Plan: one key exchange, per-partition
    * sorted fold, O(1) state.
    */
  def crostonSba(demand: DataFrame, keyCol: String, periodCol: String,
                 valueCol: String): DataFrame = {
    val spark = demand.sparkSession
    import spark.implicits._
    demand
      .select(col(keyCol).cast("long"), col(periodCol).cast("timestamp"),
        col(valueCol).cast("double"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(periodCol))
      .as[(Long, java.sql.Timestamp, Double)]
      .mapPartitions { it =>
        var hasKey = false
        var curKey = 0L
        var z = 0.0      // smoothed demand size
        var p = 0.0      // smoothed inter-demand interval
        var q = 0L       // periods since last demand (or series start)
        var seeded = false
        it.map { case (k, period, x) =>
          if (!hasKey || k != curKey) {
            hasKey = true; curKey = k
            z = 0.0; p = 0.0; q = 0L; seeded = false
          }
          q += 1
          if (x > 0.0) {
            if (!seeded) { z = x; p = q.toDouble; seeded = true }
            else { z = 0.5 * x + 0.5 * z; p = 0.5 * q.toDouble + 0.5 * p }
            q = 0L
          }
          val f = if (seeded) z / p else Double.NaN
          (k, period, x,
            if (seeded) z else Double.NaN,
            if (seeded) p else Double.NaN,
            f, 0.75 * f)
        }
      }
      .toDF(keyCol, periodCol, valueCol, "z_size", "p_interval",
        "croston", "sba")
      // NaN → null at the boundary so "no forecast yet" reads as SQL
      // NULL (the dimension-model convention)
      .select(col(keyCol), col(periodCol), col(valueCol),
        when(!isnan(col("z_size")), col("z_size")).as("z_size"),
        when(!isnan(col("p_interval")), col("p_interval")).as("p_interval"),
        when(!isnan(col("croston")), col("croston")).as("croston"),
        when(!isnan(col("sba")), col("sba")).as("sba"))
  }
}
