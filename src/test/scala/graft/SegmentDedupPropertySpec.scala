package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for [[Dedup.segmentDedup]] against a driver-side
  * reference implementation on ScalaCheck-generated corpora (small
  * word alphabet → heavy cross-doc segment collisions, the regime
  * the operator exists for). One Spark job per property, whole batch
  * as one DataFrame.
  */
class SegmentDedupPropertySpec extends SparkSuite {
  import spark.implicits._

  private val wordGen = Gen.oneOf("aa", "bb", "cc", "dd")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 23).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  /** Driver-side reference: same keep-first-(doc, pos) semantics. */
  private def reference(docs: Seq[(Long, String)], window: Int)
      : Map[Long, (Option[String], Long, Long)] = {
    val segs = docs.sortBy(_._1).flatMap { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      ws.grouped(window).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Int)]
    segs.foreach { case (id, i, s) =>
      // input is sorted by (id, pos): first sighting wins
      if (!firstOwner.contains(s)) firstOwner(s) = (id, i)
    }
    segs.groupBy(_._1).map { case (id, ss) =>
      val kept = ss.filter { case (d, i, s) => firstOwner(s) == ((d, i)) }
      val text = if (kept.isEmpty) None
        else Some(kept.sortBy(_._2).map(_._3).mkString(" "))
      id -> ((text, ss.size.toLong, kept.size.toLong))
    }
  }

  test("segmentDedup == driver-side reference on generated colliding corpora") {
    val docs = Gen.listOfN(120, docGen).sample.getOrElse(Seq.empty)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assert(docs.nonEmpty)
    for (window <- Seq(1, 3, 7)) {
      val want = reference(docs, window)
      val got = Dedup.segmentDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", window)
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
      assert(got === want, s"window=$window")
      Par.release()
    }
  }

  test("invariants: segment accounting, idempotence, total-kept uniqueness") {
    val docs = Gen.listOfN(150, docGen).sample.getOrElse(Seq.empty)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", 3)
    val rows = out.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    // every doc appears exactly once; 0 ≤ n_kept ≤ n_segments;
    // NULL text ⟺ nothing kept
    assert(rows.length === docs.length)
    assert(rows.forall(r => r._4 >= 0 && r._4 <= r._3))
    assert(rows.forall(r => r._2.isEmpty == (r._4 == 0L)))
    // total kept across the corpus == distinct segments (each
    // distinct content keeps exactly one owner)
    val distinctSegs = docs.sortBy(_._1).flatMap { case (_, t) =>
      t.split(" ").grouped(3).map(_.mkString(" ")) }.distinct.size
    assert(rows.map(_._4).sum === distinctSegs.toLong)
    // idempotence: re-deduping the survivors keeps everything (a
    // surviving corpus has no cross-doc duplicate segments left),
    // provided windows align — guaranteed here because each doc's
    // kept segments re-split on the same boundaries only when the
    // doc kept a PREFIX run; so assert the weaker but exact form:
    // re-run on the same INPUT is bit-identical (determinism)
    val again = Dedup.segmentDedup(df, "doc_id", "text", 3)
      .collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    Par.release()
  }
}
