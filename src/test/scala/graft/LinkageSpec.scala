package graft

import graft.operators.{Dedup, Linkage}
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private val recs = Seq(
    (1L, "cold widget"),   // dist 1 to 2, dist 0 to 5
    (2L, "gold widget"),
    (3L, "blue bolt"),     // own block — never compared to widgets
    (4L, "glee bolt"),     // dist 2 to 3 (b→g, u→e)
    (5L, "cold widget"),   // exact duplicate of 1
    (6L, "enormous widget") // same block, far from everything (> 2)
  ).toDF("id", "name")
  private val blk = element_at(split(col("name"), " "), -1)

  test("blockedFuzzyPairs: within-block pairs under threshold, dist 0 kept, far/cross-block dropped") {
    val out = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1), (3L, 4L, 2)))
    // tighter threshold trims by distance, keeps the rest
    val t1 = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(t1 === Set((1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1)))
  }

  test("blockedFuzzyPairs feeds connectedComponents: entities cluster transitively") {
    val pairs = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 2)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(5L) === 1L)
    assert(labels(3L) === 3L && labels(4L) === 3L)
    Par.release()
  }
}
