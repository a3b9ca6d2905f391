package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("reduce is a superset of the semi-join and never loses a match") {
    val big = Tables.lineitem(spark, dir).select(col("l_suppkey"))
    val small = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") < 3).select(col("s_suppkey"))
    val reduced = BloomJoin.reduce(big, "l_suppkey", small, "s_suppkey",
      expectedItems = 10000L)
    val semi = big.join(small, col("l_suppkey") === col("s_suppkey"), "left_semi")
    // no false negatives: every semi-join row survives the bloom
    assert(semi.join(reduced.distinct(),
      Seq("l_suppkey"), "left_anti").count() === 0L)
    // and the reduction actually prunes (selective small side): the
    // fpp budget at this sizing is ~2%, the dim filter keeps ~12% of
    // suppliers, so the survivor set must be far below the input
    val (nBig, nRed, nSemi) = (big.count(), reduced.count(), semi.count())
    assert(nRed >= nSemi, "bloom dropped a true match")
    assert(nRed < nBig / 2, s"bloom pruned nothing: $nRed of $nBig")
  }

  test("reducedJoin equals the plain inner join exactly") {
    val rev = col("l_extendedprice").cast("decimal(12,2)")
    val big = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), rev.as("price"))
    val small = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 5)
      .select(col("s_suppkey"), col("s_name"))
    val viaBloom = BloomJoin.reducedJoin(big, "l_suppkey", small, "s_suppkey",
        expectedItems = 10000L)
      .select(col("l_orderkey"), col("l_suppkey"), col("price"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val plain = big.join(small, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("price"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(viaBloom.toSeq === plain.toSeq)
  }

  test("the probe is a scalar-subquery filter on the big side, not a join") {
    val big = Tables.lineitem(spark, dir).select(col("l_suppkey"))
    val small = Tables.supplier(spark, dir).select(col("s_suppkey"))
    val plan = BloomJoin.reduce(big, "l_suppkey", small, "s_suppkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from the plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "bloom sketch attached as a join instead of a scalar subquery")
  }

  test("null keys don't break transparency (xxhash64(null) = seed, " +
    "so a null row MAY survive the probe; the equi-join drops it)") {
    val big = Seq(Some(1L), None, Some(99L)).toDF("k")
    val small = Seq(Some(1L), Some(2L), None).toDF("j")
    val viaBloom = BloomJoin.reducedJoin(big, "k", small, "j",
        expectedItems = 100L)
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val plain = big.join(small, col("k") === col("j"))
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(viaBloom.toSeq === plain.toSeq)
    assert(plain.length === 1)
  }
}
