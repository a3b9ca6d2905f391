package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the sharded query/oracle registry (r11 verdict ask
  * #8): `++` composition silently SHADOWS duplicate keys, so shard
  * disjointness is load-bearing — a bad merge that duplicates an
  * entry across shards would otherwise drop one side without a trace.
  */
class RegistrySpec extends AnyFunSuite {

  private val queryShards = Seq(
    "QueriesShard1" -> QueriesShard1.m, "QueriesShard2" -> QueriesShard2.m,
    "QueriesShard3" -> QueriesShard3.m, "QueriesShard4" -> QueriesShard4.m,
    "QueriesShard5" -> QueriesShard5.m)
  private val oracleShards = Seq(
    "OraclesShard1" -> OraclesShard1.m, "OraclesShard2" -> OraclesShard2.m,
    "OraclesShard3" -> OraclesShard3.m, "OraclesShard4" -> OraclesShard4.m,
    "OraclesShard5" -> OraclesShard5.m, "OraclesShard6" -> OraclesShard6.m)

  private def dupes(shards: Seq[(String, Map[String, _])]): Seq[String] =
    shards.flatMap { case (n, m) => m.keys.map(_ -> n) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, hits) => s"$k in ${hits.map(_._2).mkString("+")}" }
      .toSeq.sorted

  test("query shards are key-disjoint and compose losslessly") {
    assert(dupes(queryShards) === Seq.empty)
    assert(SparkEntry.queries.size === queryShards.map(_._2.size).sum)
  }

  test("oracle shards are key-disjoint and compose losslessly") {
    assert(dupes(oracleShards) === Seq.empty)
    // + the 8 alias/derived oracles (streaming/incremental twins
    // graded against the batch oracle, verbatim or filtered) and the
    // composed dedup_eval oracle appended in SparkEntry.oracleSql
    assert(SparkEntry.oracleSql.size ===
      oracleShards.map(_._2.size).sum + 9)
  }

  // (the query↔oracle key-set contract — dangling oracles, the pinned
  // rows-only set — lives in PlansSpec; this spec owns the SHARD
  // composition invariants only)
}
