package graft

import graft.operators.Flatten
import graft.pipeline.Dag
import graft.sources.SchemaEvolution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flatten, SchemaEvolution, and Dag — the reference's
  * mongo-normalize / DDL-reconcile / orchestration behaviors.
  */
class EvolutionSpec extends SparkSuite {
  import spark.implicits._

  test("flatten: nested structs become parent_child columns; scalars pass through") {
    val df = Seq((1L, ("a", (2.0, true)), "x"))
      .toDF("id", "nested", "plain")
      .select(col("id"),
        struct(col("nested._1").as("s"),
          struct(col("nested._2._1").as("d"), col("nested._2._2").as("b")).as("inner"))
          .as("nested"),
        col("plain"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq ===
      Seq("id", "nested_s", "nested_inner_d", "nested_inner_b", "plain"))
    val r = flat.collect().head
    assert(r.getLong(0) === 1L && r.getString(1) === "a" &&
      r.getDouble(2) === 2.0 && r.getBoolean(3) === true && r.getString(4) === "x")
  }

  test("flattenJson parses and flattens a JSON column in place") {
    val df = Seq((1L, """{"k": 7, "tag": "t"}"""), (2L, """{"k": 9}"""))
      .toDF("id", "props")
    val flat = Flatten.flattenJson(df, "props", "k INT, tag STRING")
    assert(flat.columns.toSeq === Seq("id", "props_k", "props_tag"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getInt(1) === 7 && rows(0).getString(2) === "t")
    assert(rows(1).getInt(1) === 9 && rows(1).isNullAt(2))
  }

  test("schema evolution: added column null-fills history, order/type conform") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val v2 = Seq((3L, "c", 30)).toDF("id", "name", "age")
    val evolved = SchemaEvolution.evolve(v1.schema, v2.schema)
    assert(evolved.fieldNames.toSeq === Seq("id", "name", "age"))
    // a column disappearing from the source never drops it from target
    assert(SchemaEvolution.evolve(evolved, v1.schema).fieldNames.toSeq ===
      Seq("id", "name", "age"))
    val all = SchemaEvolution.unionEvolved(Seq(v1, v2)).orderBy("id").collect()
    assert(all.length === 3)
    assert(all(0).isNullAt(2) && all(2).getInt(2) === 30)
    // align: casts to target type, fills missing, fixed order
    val target = StructType(Seq(StructField("id", LongType),
      StructField("age", DoubleType), StructField("flag", BooleanType)))
    val aligned = SchemaEvolution.align(v2, target)
    assert(aligned.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("age", DoubleType), ("flag", BooleanType)))
    assert(aligned.collect().head.getDouble(1) === 30.0)
  }

  test("dag: topological order, retry succeeds, failure skips transitive dependents") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    var flaky = 0
    val nodes = Seq(
      Dag.Node("raw", Nil, () => ran += "raw"),
      Dag.Node("staging", Seq("raw"), () => {
        flaky += 1; if (flaky < 2) sys.error("transient"); ran += "staging"
      }),
      Dag.Node("dim", Seq("staging"), () => ran += "dim"),
      Dag.Node("fact", Seq("staging", "dim"), () => ran += "fact"),
      Dag.Node("broken", Seq("raw"), () => sys.error("boom")),
      Dag.Node("downstream", Seq("broken"), () => ran += "downstream"),
      Dag.Node("further", Seq("downstream"), () => ran += "further"))
    val status = Dag.run(nodes, maxRetries = 1)
    assert(ran.toSeq === Seq("raw", "staging", "dim", "fact")) // deterministic order
    assert(status("staging") === Dag.Succeeded) // retried once, then green
    assert(status("broken").isInstanceOf[Dag.Failed])
    assert(status("downstream") === Dag.Skipped("broken")) // direct dependent
    assert(status("further") === Dag.Skipped("broken"))    // transitive: root cause kept
    // cycles are rejected
    intercept[IllegalArgumentException] {
      Dag.topoOrder(Seq(Dag.Node("a", Seq("b"), () => ()), Dag.Node("b", Seq("a"), () => ())))
    }
  }

  test("compatReport classifies all five contract outcomes; widening is canUpCast") {
    import org.apache.spark.sql.types._
    val contract = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType), StructField("d", TimestampType)))
    val incoming = StructType(Seq(
      StructField("a", IntegerType),  // widened (lossless upcast)
      StructField("b", StringType),   // changed (no numeric upcast)
      StructField("c", StringType),   // unchanged
      StructField("e", StringType)))  // added; d removed
    val rep = SchemaEvolution.compatReport(spark, contract, incoming)
      .collect().map(r => r.getString(0) ->
        ((r.getString(3), r.getBoolean(4)))).toMap
    assert(rep("a") === (("widened", true)))
    assert(rep("b") === (("changed", false)))
    assert(rep("c") === (("unchanged", true)))
    assert(rep("d") === (("removed", false)))
    assert(rep("e") === (("added", true)))
  }

  test("profile and profileApprox agree on nulls/rows and near-agree on distincts") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val exact = graft.operators.Quality.profile(orders, Seq("o_orderstatus", "o_custkey"))
      .orderBy("column_name").collect()
    val approx = graft.operators.Quality.profileApprox(orders, Seq("o_orderstatus", "o_custkey"))
      .orderBy("column_name").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) === a.getString(0))
      assert(e.getLong(1) === a.getLong(1)) // n_rows
      assert(e.getLong(2) === a.getLong(2)) // n_null
      val (de, da) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(de - da) / de <= 0.15, s"${e.getString(0)}: $de vs $da")
      assert(e.getString(4) === a.getString(4) && e.getString(5) === a.getString(5))
    }
  }
}
