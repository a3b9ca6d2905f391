package graft.examples

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 wave-2 stress legs — the scale law of the two new
  * per-group-QUADRATIC operators, whose 100 TB viability rests on
  * the same argument as `er_fuzzy_pairs`: work is quadratic INSIDE a
  * bounded group and linear in the number of groups.
  *
  *  - `Linkage.jaroWinklerPairs`: per-block quadratic comparator
  *    work. The probe scales the BLOCK COUNT 10x at constant block
  *    width (disjoint id- and block-shifted customer copies): a
  *    corpus-linear operator shows exponent ~1; a global-quadratic
  *    one would show ~2.
  *  - `Graph.localClustering`: wedge census bounded by orientation
  *    (out-degree O(sqrt E)). The probe scales the graph 10x as
  *    DISJOINT node-shifted copies (degree distribution unchanged):
  *    linear in edges expects exponent ~1.
  *
  * Measured 2026-08-16, local[32], sf0.1, min-of-2, exponent =
  * ln(t10/t1)/ln(10) on the volume factor:
  *
  *  | leg | operator            | t @1x  | t @10x | exponent | claim |
  *  |-----|---------------------|--------|--------|----------|-------|
  *  | 30  | er_jaro_pairs       | 1.26 s | 2.03 s | 0.21     | ≤1    |
  *  | 31  | graph_clustering    | 0.59 s | 0.93 s | 0.20     | ≤1    |
  *
  * Reading: both operators hold corpus-LINEAR and measure heavily
  * SUBLINEAR at this scale — 10x the blocks/edges costs only ~1.6x
  * wall clock, because fixed job overhead dominates and the
  * per-comparison work (a codegen'd static call / an equi-join
  * probe) amortizes across wider partitions. Nowhere near the ~2 a
  * global quadratic would show. At 100 TB both remain one hash
  * exchange on the group key with per-reducer work bounded by the
  * block/degree discipline (mega-groups: the blockedFuzzyPairs
  * pair-grid salt / the orientation bound).
  *
  * Run: `sbt "runMain graft.examples.StressR13b"` (local[32]).
  */
object StressR13b {

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s")
    (sec, a)
  }

  private def exponent(t1: Double, tN: Double, factor: Double): Double =
    math.log(tN / t1) / math.log(factor)

  private def minOf2(label: String)(f: => Long): Double = {
    val a = timed(s"$label pass1")(f)._1
    val b = timed(s"$label pass2")(f)._1
    math.min(a, b)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val Off = 1000000000L

    // ---- leg 30: jaroWinklerPairs, 10x blocks at constant width ----
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    def custCopies(n: Int): DataFrame =
      (0 until n).map { i =>
        cust.select((col("c_custkey") + lit(i * Off)).as("c_custkey"),
          col("c_name"),
          // shift the nation too: new copies form NEW blocks of the
          // same width, never widen existing ones
          (col("c_nationkey") + lit(i * 100)).as("c_nationkey"))
      }.reduce(_ unionByName _)
    def jwRun(src: DataFrame): Long =
      graft.operators.Linkage.jaroWinklerPairs(src, "c_custkey", "c_name",
        blockCol = col("c_nationkey") * 8 + pmod(col("c_custkey") % Off,
          lit(8)), minSim = 0.97).count()
    val jw1 = minOf2("jaroWinklerPairs @1x")(jwRun(custCopies(1)))
    val jw10 = minOf2("jaroWinklerPairs @10x blocks")(jwRun(custCopies(10)))
    println(f"[stress] leg30 exponent ${exponent(jw1, jw10, 10.0)}%.2f")

    // ---- leg 31: localClustering, 10x disjoint graph copies ----
    val edges = graft.EntryHelpers.coPurchaseEdges(spark, d)
    def edgeCopies(n: Int): DataFrame =
      (0 until n).map { i =>
        edges.select((col("pa") + lit(i * Off)).as("pa"),
          (col("pb") + lit(i * Off)).as("pb"))
      }.reduce(_ unionByName _)
    def lccRun(src: DataFrame): Long =
      graft.operators.Graph.localClustering(src, "pa", "pb").count()
    val lcc1 = minOf2("localClustering @1x")(lccRun(edgeCopies(1)))
    val lcc10 = minOf2("localClustering @10x copies")(lccRun(edgeCopies(10)))
    println(f"[stress] leg31 exponent ${exponent(lcc1, lcc10, 10.0)}%.2f")

    spark.stop()
  }
}
