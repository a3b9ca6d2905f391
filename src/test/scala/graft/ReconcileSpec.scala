package graft

import graft.operators.{Reconcile, Scd2}
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  test("diff: verdicts, null-safe compares, per-column flags") {
    val src = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), None),
      (3L, None, Some(30.0)),
      (4L, Some("d"), Some(40.0))).toDF("k", "name", "bal")
    val tgt = Seq(
      (1L, Some("a"), Some(10.0)),   // match
      (2L, Some("b"), Some(20.0)),   // mismatch: null vs value
      (3L, None, Some(30.0)),        // match (null == null, null-safe)
      (5L, Some("e"), Some(50.0))).toDF("k", "name", "bal") // orphan
    val d = Reconcile.diff(src, tgt, Seq("k"), Seq("name", "bal"))
      .orderBy("k").collect()
    val verdicts = d.map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(verdicts === Seq((1L, "match"), (2L, "mismatch"), (3L, "match"),
      (4L, "source_only"), (5L, "target_only")))
    // flags: row 2 differs only on bal; one-sided rows have null flags
    val r2 = d(1)
    assert(!r2.getBoolean(2) && r2.getBoolean(3))
    assert(d(3).isNullAt(2) && d(3).isNullAt(3))
  }

  test("summary counts per verdict and differing column") {
    val src = (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("k", "name", "bal")
    val tgt = (1L to 90L).map(i =>
      (i, s"n$i", if (i % 10 == 0) -1.0 else i.toDouble)).toDF("k", "name", "bal")
    val m = Reconcile.summary(src, tgt, Seq("k"), Seq("name", "bal"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("match") === ((81L, 0L, 0L)))
    assert(m("mismatch") === ((9L, 0L, 9L))) // 10,20,...,90 differ on bal
    assert(m("source_only")._1 === 10L)
    assert(!m.contains("target_only"))
  }

  test("hash-diff merge ≡ check-strategy merge (plus the hash column)") {
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
    val s1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val s2 = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("id", "name", "bal")
    val h = Scd2.rowHash(Seq(col("name"), col("bal").cast("decimal(12,2)")))
    def hist0(df: org.apache.spark.sql.DataFrame) = df
      .withColumn(Scd2.ValidFrom, t0)
      .withColumn(Scd2.ValidTo, lit(null).cast("timestamp"))
    val viaCheck = Scd2.merge(hist0(s1), s2, Seq("id"),
        Seq("name", "bal"), t1)
      .select("id", "name", "bal", "valid_from", "valid_to")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val viaHash = Scd2.merge(hist0(s1.withColumn("row_hash", h)),
        s2.withColumn("row_hash", h), Seq("id"), Seq("row_hash"), t1)
      .select("id", "name", "bal", "valid_from", "valid_to")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(viaHash.toSeq === viaCheck.toSeq)
  }

  test("rowHash: null vs empty-string vs absent distinguish; decimal stable") {
    val df = Seq(
      (1L, Some(""), Some(1.0)),
      (2L, None, Some(1.0)),
      (3L, Some(""), None)).toDF("id", "s", "x")
    val h = Scd2.rowHash(Seq(col("s"), col("x").cast("decimal(12,2)")))
    val hashes = df.select(col("id"), h.as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes.values.toSet.size === 3, "null/empty collisions")
  }
}
