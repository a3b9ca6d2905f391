package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property test: the codegen'd merge-walk [[Vectors.sortedIntersectCount]]
  * agrees with `size(array_intersect(...))` on every sorted
  * duplicate-free long-array pair, including empty and disjoint sets.
  * Cases come from ScalaCheck generators; one Spark job evaluates the
  * whole batch (arrays shipped as one DataFrame), not one per case.
  */
class IntersectPropertySpec extends SparkSuite {
  import spark.implicits._

  private val sortedSetGen: Gen[Seq[Long]] =
    Gen.containerOf[Set, Long](Gen.chooseNum(-50L, 50L)).map(_.toSeq.sorted)

  test("sortedIntersectCount == size(array_intersect) on sorted duplicate-free sets") {
    val cases = Gen.listOfN(200, Gen.zip(sortedSetGen, sortedSetGen))
      .sample.getOrElse(Seq.empty)
    assert(cases.nonEmpty)
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("i", "a", "b")
    val out = df.select(col("i"),
        Vectors.sortedIntersectCount(col("a"), col("b")).as("merged"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"case ${r.getLong(0)}: merge-walk ${r.getLong(1)} != builtin ${r.getLong(2)}")
    }
    // ground truth on a few cases via plain Scala sets
    cases.take(20).zip(out.take(20)).foreach { case ((a, b), r) =>
      assert(r.getLong(1) === a.toSet.intersect(b.toSet).size.toLong)
    }
  }
}
