package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rows = (1L to 10000L).map(i => (i, s"s${i % 3}"))
    .toDF("id", "stratum")
  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hashSplit is complete, disjoint, near the fractions, and deterministic") {
    val out = Sampling.hashSplit(rows, "id", fracs)
    assert(out.count() === 10000) // every row labeled exactly once
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
    // determinism under repartitioning — THE property randomSplit lacks
    val again = Sampling.hashSplit(rows.repartition(17), "id", fracs)
    assert(out.join(again.withColumnRenamed("split", "split2"), "id")
      .filter(col("split") =!= col("split2")).count() === 0)
  }

  test("different seeds give a different (independent) assignment") {
    val a = Sampling.hashSplit(rows, "id", fracs, seed = 1L)
    val b = Sampling.hashSplit(rows, "id", fracs, seed = 2L)
      .withColumnRenamed("split", "split2")
    val moved = a.join(b, "id").filter(col("split") =!= col("split2")).count()
    assert(moved > 1000, s"only $moved rows moved between seeds")
  }

  test("modSplit assigns by residue exactly") {
    val out = Sampling.modSplit(rows, "id", fracs, buckets = 100L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(79L) === "train" && out(101L) === "train")
    assert(out(85L) === "val" && out(189L) === "val")
    assert(out(95L) === "test" && out(199L) === "test")
  }

  test("stratifiedSample keeps ~fraction per stratum, drops unlisted strata") {
    val out = Sampling.stratifiedSample(rows, "id", "stratum",
      Map("s0" -> 0.5, "s1" -> 0.1)) // s2 absent → dropped
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("s2"))
    assert(math.abs(counts("s0") - 1667L) < 200, counts.toString) // 0.5 of ~3334
    assert(math.abs(counts("s1") - 333L) < 120, counts.toString)  // 0.1 of ~3333
    // deterministic: same rows survive a repartition
    val again = Sampling.stratifiedSample(rows.repartition(13), "id", "stratum",
      Map("s0" -> 0.5, "s1" -> 0.1))
    assert(out.select("id").exceptAll(again.select("id")).isEmpty)
  }
}
