package graft.examples

import graft.{Tables, TempDirs}
import graft.operators.{Quality, Search}
import graft.sources.Versioned
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14c stress legs — the scale laws for the session-3 wave:
  *
  *  - leg 38: PROXIMITY search per-doc term-frequency growth. The
  *    1-D bucket trick must stay pair-LINEAR while the naive
  *    id-join-then-filter goes tf-QUADRATIC. Wall time stays
  *    sub-second for both paths at any local size (32 cores chew
  *    10M trivial pairs per tick), so the honest axis is
  *    candidate-pair MASS — the quantity that IS the cost at
  *    100 TB-shaped tf/corpus (the leg-40 files-planned discipline).
  *
  *  - leg 39: INCREMENTAL join-cardinality fold vs raw history size.
  *    Raw events replicate 50× at FIXED key cardinality; the stored
  *    histogram (what the fold scans) keeps its row count, so the
  *    fold must stay flat while the full recompute's input grows 50×
  *    by construction.
  *
  *  - leg 40: VERSIONED stats-pruned read vs table size. On local
  *    SSD the time axis is masked by parquet row-group pruning and
  *    fixed driver overheads; the honest law is FILES PLANNED — the
  *    number that is object-store listing/open latency at 100 TB.
  *
  * Measured (local[32], sf0.1; counts deterministic, times min-of-2):
  *
  *  | leg | path                       | @1x        | @10x (tf/files) | exp  | claim |
  *  |-----|----------------------------|------------|-----------------|------|-------|
  *  | 38  | naive candidate pairs      | 176,229    | 17,622,900      | 2.00 | tf-quadratic |
  *  | 38  | bucketed candidate pairs   | 8,137      | 83,119          | 1.01 | pair-linear |
  *  | 39  | incr fold time @50x raw    | ~0.98 s    | ~0.61 s         | −0.14| flat — fold input is the 1,500-row histogram + delta, not the 5M raw rows |
  *  | 40  | pruned files planned       | 1          | 1               | 0.00 | flat  |
  *  | 40  | plain files planned        | 8          | 80              | 1.00 | table-bound |
  *
  * (Table refreshed from the committed run's stdout — see git log.)
  *
  * Run: `sbt "runMain graft.examples.StressR14c"` (local[32]).
  */
object StressR14c {

  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s")
    sec
  }

  private def minOf2(label: String)(f: => Unit): Double =
    math.min(timed(s"$label (p1)")(f), timed(s"$label (p2)")(f))

  private def exponent(t1: Double, tN: Double, factor: Double = 10.0): Double =
    math.log(tN / t1) / math.log(factor)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- leg 38: proximity pair growth ----
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    def fatten(k: Int) =
      docs.select(col("doc_id"),
        concat_ws(" ", array_repeat(col("text"), k)).as("text"))
    def idx(k: Int) = {
      val dir = TempDirs.create(s"stress_prox_$k") + "/t"
      Search.positionalFrame(fatten(k), "doc_id", "text")
        .write.parquet(dir)
      spark.read.parquet(dir)
    }
    val (i1, i10) = (idx(3), idx(30))
    def bucketed(i: org.apache.spark.sql.DataFrame): Unit =
      Search.proximitySearch(i, "table", "scan", window = 5L)
        .queryExecution.toRdd.count()
    def naive(i: org.apache.spark.sql.DataFrame): Unit = {
      val a = i.filter(col("term") === "table")
        .select(col("id"), col("pos").as("p1"))
      val b = i.filter(col("term") === "scan")
        .select(col("id"), col("pos").as("p2"))
      a.join(b, Seq("id"))
        .filter(col("p2") > col("p1") && col("p2") - col("p1") <= 5L)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_matches"), min(col("p1")).as("first_pos"))
        .queryExecution.toRdd.count()
    }
    val b1 = minOf2("prox bucketed @3x tf")(bucketed(i1))
    val b10 = minOf2("prox bucketed @30x tf")(bucketed(i10))
    val n1 = minOf2("prox naive @3x tf")(naive(i1))
    val n10 = minOf2("prox naive @30x tf")(naive(i10))
    // wall time stays sub-second for BOTH paths at any local size (a
    // 32-core box chews 10M trivial pairs per tick), so the honest
    // axis is CANDIDATE-PAIR MASS — the quantity that IS the cost
    // when tf and corpus size are 100 TB-shaped (the leg-40
    // files-planned discipline)
    def naiveCand(i: org.apache.spark.sql.DataFrame): Long =
      i.filter(col("term") === "table").select(col("id"), col("pos").as("p1"))
        .join(i.filter(col("term") === "scan")
          .select(col("id"), col("pos").as("p2")), Seq("id"))
        .count()
    def bucketCand(i: org.apache.spark.sql.DataFrame): Long = {
      val a = i.filter(col("term") === "table")
        .select(col("id"), col("pos").as("p1"),
          explode(array(floor(col("pos") / 5L),
            floor(col("pos") / 5L) + 1)).as("__b"))
      val b = i.filter(col("term") === "scan")
        .select(col("id"), col("pos").as("p2"), floor(col("pos") / 5L).as("__b"))
      a.join(b, Seq("id", "__b")).count()
    }
    val (nc1, nc10) = (naiveCand(i1), naiveCand(i10))
    val (bc1, bc10) = (bucketCand(i1), bucketCand(i10))
    println(f"[stress] prox candidates naive $nc1%d -> $nc10%d, " +
      f"bucketed $bc1%d -> $bc10%d")
    println(f"[stress] leg38 naive-cand exp " +
      f"${exponent(nc1.toDouble, nc10.toDouble)}%.2f, bucketed-cand exp " +
      f"${exponent(bc1.toDouble, bc10.toDouble)}%.2f (time: bucketed " +
      f"${exponent(b1, b10)}%.2f, naive ${exponent(n1, n10)}%.2f)")

    // ---- leg 39: incremental cardinality fold vs raw history ----
    val ev = Tables.events(spark, d)
    val cutoff = ev.agg(expr("percentile(CAST(ts AS DOUBLE), 0.9)")).head
      .getDouble(0)
    def raw(k: Int) = ev.withColumn("__r",
        explode(sequence(lit(1), lit(k)))).drop("__r")
    def storedHist(k: Int) = {
      val dir = TempDirs.create(s"stress_jc_$k") + "/t"
      Quality.keyHistogram(
          raw(k).filter(col("ts").cast("double") <= cutoff), "user_id")
        .write.parquet(dir)
      dir
    }
    val (h1, h10) = (storedHist(1), storedHist(50))
    val rh = Quality.keyHistogram(Tables.customer(spark, d), "c_custkey")
      .localCheckpoint(true)
    def fold(dir: String, k: Int): Unit =
      Quality.joinCardinalityFromHistograms(
          Quality.histogramMerge(spark.read.parquet(dir),
            Quality.keyHistogram(
              raw(1).filter(col("ts").cast("double") > cutoff), "user_id")),
          rh)
        .queryExecution.toRdd.count()
    def full(k: Int): Unit =
      Quality.joinCardinality(raw(k), "user_id",
          Tables.customer(spark, d), "c_custkey")
        .queryExecution.toRdd.count()
    val f1 = minOf2("jc incr fold @1x raw")(fold(h1, 1))
    val f10 = minOf2("jc incr fold @50x raw")(fold(h10, 50))
    val g1 = minOf2("jc full @1x raw")(full(1))
    val g10 = minOf2("jc full @50x raw")(full(50))
    println(f"[stress] leg39 incr exp ${exponent(f1, f10, 50)}%.2f " +
      f"(flat = the claim: fold cost independent of raw history; the " +
      f"full recompute scans ${raw(50).count()}%d raw rows vs the " +
      f"fold's ${spark.read.parquet(h10).count()}%d histogram rows + " +
      f"delta — 50x raw leaves the fold input unchanged)")

    // ---- leg 40: versioned pruned read vs table size ----
    def table(k: Int) = {
      val dir = TempDirs.create(s"stress_vpr_$k") + "/t"
      val o = Tables.orders(spark, d).select(col("o_orderkey"),
        col("o_totalprice"))
      val big = o.withColumn("__r", explode(sequence(lit(1), lit(k))))
        .select((col("o_orderkey") + col("__r").cast("long") * 100000000L)
          .as("o_orderkey"), col("o_totalprice"))
      Versioned.commit(big.repartitionByRange(8 * k, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey")), dir)
      Versioned.writeStats(spark, dir, Seq("o_orderkey"))
      dir
    }
    val (t1d, t10d) = (table(1), table(10))
    // on local SSD the time axis is masked by parquet ROW-GROUP
    // pruning (the clustered layout already skips inside files) and
    // fixed driver overheads, so the honest law is FILES PLANNED —
    // the quantity that is object-store latency at 100 TB
    def prunedFiles(dir: String): Int =
      Versioned.prunedRead(spark, dir, "o_orderkey",
          100001000L, 100005000L).inputFiles.length
    def plainFiles(dir: String): Int =
      Versioned.read(spark, dir)
        .filter(col("o_orderkey").between(100001000L, 100005000L))
        .inputFiles.length
    val (pf1, pf10) = (prunedFiles(t1d), prunedFiles(t10d))
    val (qf1, qf10) = (plainFiles(t1d), plainFiles(t10d))
    println(f"[stress] vpr files pruned $pf1%d -> $pf10%d, " +
      f"plain $qf1%d -> $qf10%d")
    println(f"[stress] leg40 pruned-files exp " +
      f"${exponent(pf1.toDouble, pf10.toDouble)}%.2f, plain-files exp " +
      f"${exponent(qf1.toDouble, qf10.toDouble)}%.2f")

    spark.stop()
  }
}
