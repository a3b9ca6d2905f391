package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

class PackSpec extends SparkSuite {
  import spark.implicits._

  test("firstFit packs FFD-optimally within one partition") {
    val docs = Seq((1L, 7L), (2L, 5L), (3L, 3L), (4L, 2L), (5L, 2L), (6L, 1L))
      .toDF("doc_id", "n_tokens").coalesce(1)
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 10L,
        widenInput = false)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSeq
    // FFD: [7,3] and [5,2,2,1] — two full bins
    val byBin = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBin.size === 2, byBin.toString)
    assert(byBin.values.toSet === Set(Set(1L, 3L), Set(2L, 4L, 5L, 6L)))
  }

  test("every doc lands in exactly one bin and no bin exceeds the budget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.functions.Text.tokenCountBpe(col("text")).as("n_tokens"))
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 2048L)
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    val overfull = out.groupBy("bin_id")
      .agg(sum(least(col("n_tokens"), lit(2048L))).as("used"))
      .filter(col("used") > 2048L)
    assert(overfull.isEmpty)
  }

  test("an oversized doc gets its own bin rather than being dropped") {
    val docs = Seq((1L, 5000L), (2L, 10L)).toDF("doc_id", "n_tokens").coalesce(1)
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 100L,
        widenInput = false)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(out.size === 2)
    assert(out(1L) !== out(2L))
  }
}
