package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val emptyHistory = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("state", StringType),
      StructField("occupation", StringType),
      StructField("valid_from", TimestampType),
      StructField("valid_to", TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("merge: day-1 snapshot opens every key; day-2 check-cols change closes + reopens") {
    val day1 = Seq((1L, "Lagos", "eng"), (2L, "Abuja", "doc"))
      .toDF("user_id", "state", "occupation")
    val h1 = Scd2.merge(emptyHistory, day1, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-01 00:00:00")))
    assert(h1.count() === 2)
    assert(Scd2.currentRows(h1).count() === 2)

    // day 2: user 1 changed state, user 2 unchanged, user 3 new,
    // (dbt check-strategy snapshot semantics: snapshots/users_snapshot.sql)
    val day2 = Seq((1L, "Kano", "eng"), (2L, "Abuja", "doc"), (3L, "Oyo", "law"))
      .toDF("user_id", "state", "occupation")
    val h2 = Scd2.merge(h1, day2, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-02 00:00:00")))

    val rows = h2.orderBy("user_id", "valid_from")
      .select("user_id", "state", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString)))
    assert(rows.toSeq === Seq(
      (1L, "Lagos", "2024-01-01 00:00:00.0", Some("2024-01-02 00:00:00.0")),
      (1L, "Kano",  "2024-01-02 00:00:00.0", None),
      (2L, "Abuja", "2024-01-01 00:00:00.0", None), // unchanged → untouched
      (3L, "Oyo",   "2024-01-02 00:00:00.0", None)))
    assert(Scd2.currentRows(h2).count() === 3)
  }

  test("merge: key missing from extract stays open (no hard deletes)") {
    val day1 = Seq((1L, "Lagos", "eng")).toDF("user_id", "state", "occupation")
    val h1 = Scd2.merge(emptyHistory, day1, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-01 00:00:00")))
    val day2 = Seq((2L, "Abuja", "doc")).toDF("user_id", "state", "occupation")
    val h2 = Scd2.merge(h1, day2, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-02 00:00:00")))
    val u1 = h2.filter($"user_id" === 1).collect()
    assert(u1.length === 1 && u1(0).getAs[java.sql.Timestamp]("valid_to") == null)
  }

  test("mergeAll folds N dated snapshots into the same history as step-by-step merges") {
    def snap(rows: (Long, String)*) = rows.toSeq.toDF("user_id", "state")
    val days = Seq(
      snap(1L -> "Lagos", 2L -> "Abuja") -> lit(ts("2024-01-01 00:00:00")),
      snap(1L -> "Kano", 2L -> "Abuja") -> lit(ts("2024-01-02 00:00:00")),
      snap(1L -> "Kano", 2L -> "Jos", 3L -> "Oyo") -> lit(ts("2024-01-03 00:00:00")))
    val folded = Scd2.mergeAll(emptyHistory.drop("occupation"), days,
      Seq("user_id"), Seq("state"))
    val stepped = days.foldLeft(emptyHistory.drop("occupation")) {
      case (h, (ex, t)) => Scd2.merge(h, ex, Seq("user_id"), Seq("state"), t)
    }
    val a = folded.orderBy("user_id", "valid_from").collect().map(_.toSeq)
    assert(a.toSeq === stepped.orderBy("user_id", "valid_from").collect().map(_.toSeq).toSeq)
    assert(Scd2.currentRows(folded).count() === 3)
    assert(folded.count() === 5) // 3 current + 2 closed versions
  }

  test("merge with invalidateHardDeletes closes rows whose key left the extract") {
    val day1 = Seq((1L, "Lagos", "eng"), (2L, "Abuja", "doc"))
      .toDF("user_id", "state", "occupation")
    val h1 = Scd2.merge(emptyHistory, day1, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-01 00:00:00")))
    // day 2: user 2 vanished from the FULL extract — a hard delete
    val day2 = Seq((1L, "Lagos", "eng")).toDF("user_id", "state", "occupation")
    val h2 = Scd2.merge(h1, day2, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-02 00:00:00")),
      invalidateHardDeletes = true)
    val u2 = h2.filter($"user_id" === 2).collect()
    assert(u2.length === 1 &&
      u2(0).getAs[java.sql.Timestamp]("valid_to") == ts("2024-01-02 00:00:00"))
    assert(Scd2.currentRows(h2).count() === 1)
    // day 3: the key REAPPEARS → closed row stays, a fresh row opens
    val day3 = Seq((1L, "Lagos", "eng"), (2L, "Abuja", "doc"))
      .toDF("user_id", "state", "occupation")
    val h3 = Scd2.merge(h2, day3, Seq("user_id"),
      Seq("state", "occupation"), lit(ts("2024-01-03 00:00:00")),
      invalidateHardDeletes = true)
    val u2v = h3.filter($"user_id" === 2).orderBy("valid_from").collect()
      .map(r => Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString))
    assert(u2v.toSeq === Seq(Some("2024-01-02 00:00:00.0"), None))
  }

  test("mergeAll: 50-snapshot backfill keeps the plan bounded and converges to the log history") {
    val t0 = ts("2024-01-01 00:00:00").getTime
    def day(i: Int) = new java.sql.Timestamp(t0 + i.toLong * 86400000L)
    // one user whose state changes every day → 50 history versions
    val snaps = (0 until 50).map { i =>
      Seq((1L, s"state_$i")).toDF("user_id", "state") -> lit(day(i))
    }
    val folded = Scd2.mergeAll(emptyHistory.drop("occupation"), snaps,
      Seq("user_id"), Seq("state"))
    // lineage defense: un-truncated, the plan DOUBLES per fold (the
    // history is referenced by both the closed branch and the join) —
    // 2^50 nodes; with the default checkpoint cadence at most
    // 2^checkpointEvery − 1 joins remain regardless of snapshot count
    val joins = folded.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size <= 15, s"plan grew to ${joins.size} joins — lineage not truncated")
    val log = (0 until 50).map(i => (1L, day(i), s"state_$i"))
      .toDF("user_id", "ts", "state")
    val viaLog = Scd2.historyFromLog(log, Seq("user_id"), "ts")
      .select("user_id", "state", "valid_from", "valid_to")
    val a = folded.select("user_id", "state", "valid_from", "valid_to")
      .orderBy("valid_from").collect().map(_.toSeq)
    assert(a.toSeq === viaLog.orderBy("valid_from").collect().map(_.toSeq).toSeq)
    assert(folded.count() === 50 && Scd2.currentRows(folded).count() === 1)
  }

  test("merge iterated over an update log converges to historyFromLog") {
    // the same changes applied as two snapshot merges vs one log pass
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "Lagos"),
      (1L, ts("2024-01-02 00:00:00"), "Kano"),
      (2L, ts("2024-01-01 00:00:00"), "Abuja"))
      .toDF("user_id", "ts", "state")
    val viaLog = Scd2.historyFromLog(log, Seq("user_id"), "ts")
      .select("user_id", "state", "valid_from", "valid_to")

    val h1 = Scd2.merge(emptyHistory.drop("occupation"),
      Seq((1L, "Lagos"), (2L, "Abuja")).toDF("user_id", "state"),
      Seq("user_id"), Seq("state"), lit(ts("2024-01-01 00:00:00")))
    val h2 = Scd2.merge(h1,
      Seq((1L, "Kano"), (2L, "Abuja")).toDF("user_id", "state"),
      Seq("user_id"), Seq("state"), lit(ts("2024-01-02 00:00:00")))

    val a = viaLog.orderBy("user_id", "valid_from").collect().map(_.toSeq)
    val b = h2.select("user_id", "state", "valid_from", "valid_to")
      .orderBy("user_id", "valid_from").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("random snapshot fold: disjoint intervals, one open row per live key, latest attrs") {
    // structural invariants any SCD2 history must satisfy, checked on
    // a randomized 8-day replay with appearing/vanishing keys and
    // hard-delete invalidation on (the full-snapshot Mongo-users case)
    val rnd = new scala.util.Random(11)
    val keys = 1L to 6L
    val days = (1 to 8).map(d => f"2024-01-$d%02d 00:00:00")
    val snapshots = days.map { day =>
      val present = keys.filter(_ => rnd.nextDouble() < 0.7)
      (present.map(k => (k, s"state${rnd.nextInt(3)}", s"occ${rnd.nextInt(2)}")),
        day)
    }
    val hist = snapshots.foldLeft(emptyHistory) { case (h, (rows, day)) =>
      Scd2.merge(h, rows.toDF("user_id", "state", "occupation"),
        Seq("user_id"), Seq("state", "occupation"), lit(ts(day)),
        invalidateHardDeletes = true)
    }
    val byKey = hist.orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
      .groupBy(_._1)

    val lastPresent = snapshots.last._1.map(r => r._1 -> (r._2, r._3)).toMap
    keys.foreach { k =>
      val rows = byKey.getOrElse(k, Array.empty).sortBy(_._4.getTime)
      // intervals never overlap: each row closes before the next opens
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.isDefined, s"key $k has a non-final open row")
          assert(!a._5.get.after(b._4), s"key $k intervals overlap")
        case _ => ()
      }
      // exactly one open row iff the key is in the final snapshot
      val open = rows.filter(_._5.isEmpty)
      if (lastPresent.contains(k)) {
        assert(open.length === 1, s"key $k: ${open.length} open rows")
        assert((open.head._2, open.head._3) === lastPresent(k),
          s"key $k open row attrs stale")
      } else assert(open.isEmpty, s"key $k vanished but still open")
      // a key that ever appeared has at least one row
      if (snapshots.exists(_._1.exists(_._1 == k))) assert(rows.nonEmpty)
    }
  }

  test("schema evolution composes with merge: extract that ADDED a column widens history") {
    import graft.sources.SchemaEvolution
    // day 1: source has (user_id, state); history built without 'region'
    val day1 = Seq((1L, "Lagos"), (2L, "Abuja")).toDF("user_id", "state")
    val h0 = {
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("state", StringType),
        StructField("valid_from", TimestampType),
        StructField("valid_to", TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val h1 = Scd2.merge(h0, day1, Seq("user_id"), Seq("state"),
      lit(ts("2024-01-01 00:00:00")))

    // day 2: the source ADDED 'region' (base_loader.py:867's
    // DDL-reconcile event composed with the snapshot path): widen the
    // history schema, null-fill old rows, then merge normally with the
    // new column under check
    val day2 = Seq((1L, "Lagos", "SW"), (2L, "Kano", "NW"), (3L, "Oyo", "SW"))
      .toDF("user_id", "state", "region")
    val widened = SchemaEvolution.evolve(h1.schema, day2.schema)
    val h1w = SchemaEvolution.align(h1, widened)
    assert(h1w.schema.fieldNames.toSeq ===
      Seq("user_id", "state", "valid_from", "valid_to", "region"))
    val h2 = Scd2.merge(h1w, day2, Seq("user_id"), Seq("state", "region"),
      lit(ts("2024-01-02 00:00:00")))

    val rows = h2.orderBy("user_id", "valid_from")
      .select("user_id", "state", "region", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        r.getTimestamp(3).toString, Option(r.getTimestamp(4)).map(_.toString)))
    // every user changed under the widened check (null region ≠ new
    // region), so day-1 rows close and day-2 rows open; old rows keep
    // a null region (never back-filled — the warehouse-absorbs-columns
    // property of the reference's additive DDL reconcile)
    assert(rows.toSeq === Seq(
      (1L, "Lagos", None,       "2024-01-01 00:00:00.0", Some("2024-01-02 00:00:00.0")),
      (1L, "Lagos", Some("SW"), "2024-01-02 00:00:00.0", None),
      (2L, "Abuja", None,       "2024-01-01 00:00:00.0", Some("2024-01-02 00:00:00.0")),
      (2L, "Kano",  Some("NW"), "2024-01-02 00:00:00.0", None),
      (3L, "Oyo",   Some("SW"), "2024-01-02 00:00:00.0", None)))

    // merge stays oracle-equivalent on the SHARED columns: the same
    // two days merged without the added column agree on
    // (user_id, state, valid_from, valid_to)
    val h2flat = Scd2.merge(h1, day2.drop("region"), Seq("user_id"),
      Seq("state"), lit(ts("2024-01-02 00:00:00")))
    // region-only changes (user 1) split rows in the widened history;
    // collapse to the distinct shared-column timeline for comparison
    val shared = h2.select("user_id", "state", "valid_from")
      .orderBy("user_id", "valid_from").collect().map(_.toSeq)
    val flat = h2flat.select("user_id", "state", "valid_from")
      .orderBy("user_id", "valid_from").collect().map(_.toSeq)
    // user 1: unchanged state in flat merge → one open row; widened
    // merge closes/reopens on region — timelines differ only there
    assert(flat.toSeq === shared.toSeq.filterNot(
      r => r == Seq(1L, "Lagos", ts("2024-01-02 00:00:00"))))
  }
}
