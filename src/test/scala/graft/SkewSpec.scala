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
}
