package graft

import graft.plans.ColumnLineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ColumnLineageSpec extends SparkSuite {
  import spark.implicits._

  private def lin(df: DataFrame): Set[(String, String, String)] =
    ColumnLineage.of(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  // lineage resolves to LEAF relations — for in-memory frames that is
  // the tuple LocalRelation (_1, _2, …) behind toDF's rename, which is
  // technically right but unreadable. Specs use parquet-backed tables
  // (the real deployment shape), whose leaves carry true names.
  private def tbl(name: String, df: DataFrame): DataFrame = {
    val dir = s"${tmpDir("lin")}/$name"
    df.write.parquet(dir)
    spark.read.parquet(dir)
  }

  test("projection, rename, and computed columns trace to their inputs") {
    val t = tbl("t", Seq((1L, 2.0, "x")).toDF("a", "b", "c"))
    val got = lin(t.select(col("a").as("id"),
      (col("a") + col("b")).as("s"), lit(1).as("k")))
    assert(got === Set(
      ("id", "t", "a"),
      ("s", "t", "a"), ("s", "t", "b"),
      ("k", null, null))) // literal: no source, still listed
  }

  test("aggregates, joins, and explode carry provenance through") {
    val l = tbl("facts", Seq((1L, 2.0)).toDF("k", "v"))
    val r = tbl("dim", Seq((1L, "n")).toDF("k", "name"))
    val got = lin(l.join(r, Seq("k"))
      .groupBy(col("name")).agg(sum(col("v")).as("total")))
    assert(got === Set(
      ("name", "dim", "name"),
      ("total", "facts", "v")))
    val ex = tbl("docs", Seq((1L, Seq("p", "q"))).toDF("id", "xs"))
      .select(col("id"), explode(col("xs")).as("x"))
    assert(lin(ex) === Set(
      ("id", "docs", "id"), ("x", "docs", "xs")))
  }

  test("union merges positionally; windows trace frame inputs") {
    val a = tbl("d1", Seq((1L, 2.0)).toDF("k", "v"))
    val b = tbl("d2", Seq((9L, 3.0)).toDF("k2", "v2"))
    assert(lin(a.unionByName(b.toDF("k", "v"))) === Set(
      ("k", "d1", "k"), ("k", "d2", "k2"),
      ("v", "d1", "v"), ("v", "d2", "v2")))
    import org.apache.spark.sql.expressions.Window
    val w = a.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))))
    assert(lin(w) === Set(
      ("k", "d1", "k"), ("v", "d1", "v"),
      ("rn", "d1", "k"), ("rn", "d1", "v")))
  }

  test("a real model traces to its parquet tables") {
    val got = lin(graft.pipeline.Models.factLineitem(spark, "/root/testdata/sf0.001"))
    // every source is one of the star tables, named from its file
    val tables = got.collect { case (_, t, _) if t != null => t }
    assert(tables.nonEmpty)
    assert(tables.forall(Set("lineitem", "orders", "customer", "nation", "region")),
      s"unexpected tables: ${tables.toSet}")
    // revenue must depend on exactly price and discount
    val revenue = got.filter(_._1 == "revenue").map(x => (x._2, x._3))
    assert(revenue === Set(("lineitem", "l_extendedprice"), ("lineitem", "l_discount")))
  }
}
