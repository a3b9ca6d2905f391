package graft

import graft.operators.Merge
import graft.operators.Merge._
import org.apache.spark.sql.functions._

/** Generalized MERGE INTO: clause ordering, conditional guards,
  * 3-valued logic, insert defaults, source-driven retirement.
  */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "tag", "v")

  private def source = Seq(
    (2L, "B", 200.0),  // matched
    (3L, "C", 5.0),    // matched, low value
    (9L, "I", 900.0),  // unmatched
    (10L, "J", 1.0)    // unmatched, low value
  ).toDF("k", "tag", "v")

  test("merge: classic upsert (matched update + not-matched insert)") {
    val got = Merge.mergeInto(target, source, Seq("k"),
        matched = Seq(MatchedUpdate(Map("tag" -> col("s.tag"), "v" -> col("s.v")))),
        notMatched = Seq(NotMatchedInsert()))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B", 200.0), (3L, "C", 5.0), (4L, "d", 40.0),
      (9L, "I", 900.0), (10L, "J", 1.0)))
  }

  test("merge: clause order — first matching clause wins") {
    // update (v > 100) shadows delete for k=2; k=3 falls through to delete
    val got = Merge.mergeInto(target, source, Seq("k"),
        matched = Seq(
          MatchedUpdate(Map("v" -> col("s.v")), Some(col("s.v") > 100.0)),
          MatchedDelete()))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "b", 200.0), (4L, "d", 40.0)))
  }

  test("merge: conditional insert drops non-qualifying source rows") {
    val got = Merge.mergeInto(target, source, Seq("k"),
        notMatched = Seq(NotMatchedInsert(cond = Some(col("s.v") > 100.0))))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 9L)) // 10 dropped
  }

  test("merge: insert set overrides and null-fills missing source columns") {
    val narrow = Seq((9L, 900.0)).toDF("k", "v") // no tag column
    val got = Merge.mergeInto(target, narrow, Seq("k"),
        notMatched = Seq(NotMatchedInsert(Map("v" -> (col("s.v") + 1.0)))))
      .select("k", "tag", "v").as[(Long, Option[String], Double)]
      .collect().sortBy(_._1)
    assert(got.last === ((9L, None, 901.0)))
    assert(got.length === 5)
  }

  test("merge: not matched by source update + delete chain") {
    val got = Merge.mergeInto(target, source, Seq("k"),
        notMatchedBySource = Seq(
          NotMatchedBySourceUpdate(Map("tag" -> lit("stale")),
            Some(col("t.v") < 20.0)),
          NotMatchedBySourceDelete()))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // k=1 (v=10) tagged stale; k=4 (v=40) falls through → deleted;
    // matched rows untouched
    assert(got.toSeq === Seq(
      (1L, "stale", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("merge: NULL condition treats the clause as not fired (3-valued guard)") {
    val t = Seq((1L, Option.empty[java.lang.Double]), (2L, Option(5.0): Option[java.lang.Double]))
      .toDF("k", "v")
    val s = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "v")
    // first clause cond t.v > 1 is NULL for k=1 → must fall through to
    // the unconditional second clause, not swallow the row
    val got = Merge.mergeInto(t, s, Seq("k"),
        matched = Seq(
          MatchedUpdate(Map("v" -> lit(-1.0)), Some(col("t.v") > 1.0)),
          MatchedUpdate(Map("v" -> col("s.v")))))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 100.0), (2L, -1.0)))
  }

  test("merge: null source keys never match — they are insert candidates") {
    val s = Seq((Option.empty[Long], 7.0), (Option(2L), 9.0)).toDF("k", "v")
    val got = Merge.mergeInto(
        Seq((2L, 1.0)).toDF("k", "v"), s, Seq("k"),
        matched = Seq(MatchedUpdate(Map("v" -> col("s.v")))),
        notMatched = Seq(NotMatchedInsert()))
      .select("k", "v").as[(Option[Long], Double)].collect()
      .sortBy(r => (r._1.isEmpty, r._1.getOrElse(0L)))
    assert(got.toSeq === Seq((Some(2L), 9.0), (None, 7.0)))
  }

  test("merge: empty clause set is a no-op passthrough of the target") {
    val got = Merge.mergeInto(target, source, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === target.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }
}
