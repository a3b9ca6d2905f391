package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedAgg equals plain groupBy on a skewed key distribution") {
    // key "hot" has 90% of rows — the case salting exists for
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("warm", i.toLong)) ++
      Seq(("cold", 7L))).toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"),
        Seq(Skew.SumOf("v"), Skew.CountAll(), Skew.MinOf("v"), Skew.MaxOf("v")),
        saltBuckets = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedAgg stage-1 spreads a heavy key over multiple salt buckets") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    // count distinct salts the heavy key actually landed on
    val salts = df.withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts === 8L)
  }

  test("saltedJoin equals the plain inner join, incl. multi-match right rows") {
    // "hot" owns 90% of the left; right has TWO rows for hot (each
    // left row must match both, exactly once each) and one for others
    val left = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("warm", i.toLong)) ++
      Seq(("cold", 7L))).toDF("k", "v")
    val right = Seq(("hot", "h1"), ("hot", "h2"), ("warm", "w"), ("cold", "c"),
      ("unmatched", "x")).toDF("k", "tag")
    val salted = Skew.saltedJoin(left, right, Seq("k"),
      hotThreshold = 100L, salts = 8)
    val plain = left.join(right, Seq("k"))
    assert(salted.count() === 1851L) // 900*2 + 50 + 1
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // degenerate thresholds: nothing hot / everything hot — same rows
    Seq(100000L, 0L).foreach { th =>
      val s2 = Skew.saltedJoin(left, right, Seq("k"), th, salts = 8)
      assert(s2.except(plain).isEmpty && plain.except(s2).isEmpty, s"th=$th")
    }
    // NULL join keys drop on both paths, exactly like the plain join
    val leftN = left.unionByName(Seq((null.asInstanceOf[String], 99L)).toDF("k", "v"))
    val rightN = right.unionByName(Seq((null.asInstanceOf[String], "nn")).toDF("k", "tag"))
    val sN = Skew.saltedJoin(leftN, rightN, Seq("k"), hotThreshold = 100L, salts = 8)
    val pN = leftN.join(rightN, Seq("k"))
    assert(sN.count() === pN.count() &&
      sN.except(pN).isEmpty && pN.except(sN).isEmpty)
  }
}
