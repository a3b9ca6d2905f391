package graft.examples

import graft.operators.{Dedup, Sampling}
import graft.sources.Sink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 continuation (wave 2) stress legs — 10-100× the spec
  * shapes, the sizes where a wrong plan stops being a rounding error:
  *
  * Leg 6 — PassJoin edit-distance at 500k strings: the candidate
  * equi-join must stay near-linear in the corpus (the pair space is
  * 1.25e11 — any quadratic path would not finish). Correctness twin
  * at 2k strings vs the brute-force levenshtein join.
  *
  * Leg 7 — file skipping at 5M rows / 64 clustered files: prunedRead
  * of a one-file key range vs the full-scan filter, files-scanned
  * asserted (1 vs 64), identical results.
  *
  * Leg 8 — sequential-Poisson PPS sample at 10M rows: the
  * bounded-heap zero-shuffle scan vs the naive global row_number
  * window (one reducer owns the corpus), identical membership.
  *
  * Run: `sbt "runMain graft.examples.StressR8b"` (local[32]).
  */
object StressR8b {

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-44s $sec%8.2f s")
    (sec, a)
  }

  /** Deterministic 12-char hex-ish corpus with a planted distance-1
    * typo for every 9th string (same construction as the graded
    * query, scaled).
    */
  private def typoCorpus(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(n).select(col("id"),
      substring(md5(col("id").cast("string")), 1, 12).as("s"))
    val pos = (col("id") % 11 + 1).cast("int")
    val mutated = base.filter(col("id") % 9 === 0)
      .select((col("id") + 100000000L).as("id"),
        concat(col("s").substr(lit(1), pos - 1), lit("z"),
          col("s").substr(pos + 1, lit(12))).as("s"))
    base.unionByName(mutated)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- Leg 6: edit distance. Correctness twin first: 2k strings,
    // PassJoin vs the definitional quadratic join.
    val small = typoCorpus(spark, 1800)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    small.count()
    val fast = Dedup.editDistance(small, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Par.release()
    val a = small.select(col("id").as("ia"), col("s").as("sa"))
    val b = small.select(col("id").as("ib"), col("s").as("sb"))
    val brute = a.join(b, col("ia") < col("ib") &&
        abs(length(col("sa")) - length(col("sb"))) <= 1)
      .filter(levenshtein(col("sa"), col("sb"), 1) >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    require(fast == brute,
      s"edit-distance A/B mismatch: ${fast.size} vs ${brute.size}")
    println(s"[stress] edit-distance A/B agrees on ${fast.size} pairs (1.8k corpus)")
    small.unpersist()

    // scale: 50k then 500k (a quadratic candidate path would go 100×
    // slower at the 10× step; the segment join should stay ~linear
    // modulo fixed overheads)
    Seq(50000L, 500000L).foreach { n =>
      val corpus = typoCorpus(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      corpus.count()
      def run() = force(Dedup.editDistance(corpus, "id", "s", maxDist = 1))
      run(); graft.Par.release() // warm the code path (JIT, codegen)
      val (_, pairs) = timed(s"edit-distance d=1, n=$n")(run())
      graft.Par.release()
      println(s"[stress]   pairs found: $pairs (planted ≈ ${n / 9})")
      corpus.unpersist()
    }

    // --- Leg 7: data skipping. 20M rows range-clustered into 512
    // files; a one-file key range via prunedRead vs the full filter.
    // Honest caveat measured at the 64-file/5M size first tried:
    // with every footer in page cache, parquet's own row-group stats
    // prune the full scan to ~the same work, and prunedRead's fixed
    // manifest read made it 0.7× — the file-skip win needs file
    // COUNTS (footer opens, task scheduling) to dominate, which is
    // exactly the thousands-of-files case at 100 TB. 512 files makes
    // the footer-open cost visible even warm.
    val dir = java.nio.file.Files.createTempDirectory("stress_prune").toString + "/t"
    val data = spark.range(20000000L).select(col("id").as("k"),
      md5(col("id").cast("string")).as("payload"))
    require(Sink.clusteredWrite(data, dir, Seq("k"), numFiles = 512) == 512)
    Sink.writeFileStats(spark, dir, Seq("k"))
    val st = spark.read.parquet(s"$dir/_graft_stats")
      .select("min_k", "max_k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (lo, hi) = st(40)
    def runFull() = force(
      spark.read.parquet(dir).filter(col("k").between(lo, hi)))
    def runPruned() = force(Sink.prunedRead(spark, dir, "k", lo, hi))
    runFull(); runPruned() // warm
    val pruned = Sink.prunedRead(spark, dir, "k", lo, hi)
    require(pruned.inputFiles.length == 1,
      s"expected 1 file, scanned ${pruned.inputFiles.length}")
    val (tF, nF) = timed("range filter, full 512-file scan")(runFull())
    val (tP, nP) = timed("range filter, stats-pruned 1-file scan")(runPruned())
    require(nF == nP, s"pruned-read A/B row mismatch: $nF vs $nP")
    println(f"[stress] file-skip speedup: ${tF / tP}%.1fx ($nF rows, 1/512 files)")

    // --- Leg 8: PPS sampler at 10M rows — bounded-heap scan vs the
    // naive global window (every row through one reducer).
    val big = spark.range(10000000L).select(col("id"),
        (pmod(col("id"), lit(1000L)) + 1).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    big.count()
    val xiExpr = shiftrightunsigned(xxhash64(col("id"), lit(42L)), 11)
      .cast("double") * lit(1.0 / 9007199254740992.0) / col("w").cast("double")
    def runHeap() = force(Sampling.weightedSampleN(big, "id", "w", 10000))
    def runNaive() = force(big.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(xiExpr.asc, col("id").asc)))
      .filter(col("rank") <= 10000))
    runHeap(); runNaive() // warm
    val heapIds = Sampling.weightedSampleN(big, "id", "w", 10000)
      .select("id").collect().map(_.getLong(0)).toSet
    val naiveIds = big.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(xiExpr.asc, col("id").asc)))
      .filter(col("rank") <= 10000)
      .select("id").collect().map(_.getLong(0)).toSet
    require(heapIds == naiveIds, "PPS A/B membership mismatch")
    val (tH, _) = timed("PPS 10k-of-10M, bounded-heap scan")(runHeap())
    val (tN, _) = timed("PPS 10k-of-10M, naive global window")(runNaive())
    println(f"[stress] PPS sampler speedup: ${tN / tH}%.1fx")
    big.unpersist()
    spark.stop()
  }
}
