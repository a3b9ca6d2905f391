package graft.examples

import graft.operators.BloomJoin
import graft.sources.Sink
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 wave-3 stress legs — the new operators at the sizes where
  * their 100 TB claims are measurable, with SHUFFLE BYTES metered by
  * a task listener (wall time alone hides what the cluster would
  * actually move):
  *
  * Leg 9 — bloom semi-join reduction at 6M fact rows / 1%-selective
  * dim, broadcast DISABLED (the at-scale regime: a dim too big to
  * broadcast whose KEYS still fit a sketch). The plain sort-merge
  * join must shuffle the whole fact; the bloom-reduced join shuffles
  * only survivors. Identical results asserted.
  *
  * Leg 10 — z-order at 5M points / 64 files: a 2D box opens a few
  * tiles; the 1D-clustered control opens everything for the same
  * query. Identical results asserted.
  *
  * Leg 11 — per-file bloom index at 5M rows / 64 files clustered on
  * an UNRELATED column: point lookup opens ~1 file vs 64.
  *
  * Run: `sbt "runMain graft.examples.StressR8c"` (local[32]).
  */
object StressR8c {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-48s $sec%8.2f s")
    (sec, a)
  }

  /** Run `f` with a fresh shuffle meter; returns (wall sec, shuffled
    * bytes, result).
    */
  private def metered[A](spark: SparkSession, label: String)(f: => A): (Double, Long, A) = {
    val m = new ShuffleMeter
    spark.sparkContext.addSparkListener(m)
    val (sec, a) =
      try timed(label)(f)
      finally {
        // listener bus is async (and private) — give it a moment to
        // drain before reading the counter; harness-grade, not exact
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(m)
      }
    println(f"[stress]   shuffle written: ${m.bytes.get / 1e6}%10.1f MB")
    (sec, m.bytes.get, a)
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

    // --- Leg 9: bloom semi-join reduction, broadcast disabled ---
    // 6M-row PARQUET fact (realistic scan + shuffle volumes — range-
    // generated inputs compress/optimize unrepresentatively) over a
    // 60k-key domain; dim keeps ~1% of keys
    val factDir = java.nio.file.Files.createTempDirectory("stress_bf").toString + "/fact"
    spark.range(6000000L).select(
        (col("id") % 60000L).as("k"),
        (col("id") * 7L % 1000L).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(xxhash64(col("id"))) // decorrelate layout from key
      .write.parquet(factDir)
    val fact = spark.read.parquet(factDir)
    // dim ALSO parquet-backed, with the selective attribute STORED —
    // an expression-derived filter (e.g. j % 97) would let Catalyst
    // infer the predicate onto the fact scan through the equi-key and
    // the "plain" join would be unrepresentatively pre-pruned
    val dimDir = java.nio.file.Files.createTempDirectory("stress_bf").toString + "/dim"
    spark.range(60000L).select(col("id").as("j"),
        (xxhash64(col("id")) % 97).as("seg"),
        concat(lit("d"), col("id")).as("name"))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("seg") === 0)
      .select(col("j"), col("name"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plainQ = fact.join(dim, col("k") === col("j"))
        .agg(count(lit(1)), sum(col("v")))
      println(plainQ.queryExecution.executedPlan.toString.linesIterator
        .take(12).map("[stress]   plan: " + _).mkString("\n"))
      val (plainSec, plainBytes, plainAgg) =
        metered(spark, "leg9 plain SMJ join 6M x 1% dim") { plainQ.head() }
      val (bloomSec, bloomBytes, bloomAgg) =
        metered(spark, "leg9 bloom-reduced join (same result)") {
          BloomJoin.reducedJoin(fact, "k", dim, "j", expectedItems = 10000L)
            .agg(count(lit(1)), sum(col("v"))).head()
        }
      require(plainAgg == bloomAgg,
        s"bloom join changed the result: $plainAgg vs $bloomAgg")
      println(f"[stress] leg9: bloom shuffles ${100.0 * bloomBytes / plainBytes}%.1f%% " +
        f"of plain bytes, ${plainSec / bloomSec}%.1f x wall speedup")
      require(bloomBytes < plainBytes / 5,
        s"bloom reduction too weak: $bloomBytes vs $plainBytes")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)

    // --- Leg 10: z-order 5M points, 64 files ---
    val side = 2236 // ~5M points
    val pts = spark.range(side.toLong * side).select(
      (col("id") % side).as("x"), (col("id") / side).as("y"),
      (col("id") % 1000).as("v"))
      // physical order decorrelated from (x, y) so clustering has work
      .orderBy(xxhash64(col("id")))
    val zdir = java.nio.file.Files.createTempDirectory("stress_z").toString + "/z"
    val rdir = java.nio.file.Files.createTempDirectory("stress_z").toString + "/r"
    timed("leg10 zorderWrite 5M x 64 files") {
      Sink.zorderWrite(pts, zdir, Seq("x", "y"), numFiles = 64)
      Sink.writeFileStats(spark, zdir, Seq("x", "y"))
    }
    timed("leg10 1D clusteredWrite control") {
      Sink.clusteredWrite(pts, rdir, Seq("x"), numFiles = 64)
      Sink.writeFileStats(spark, rdir, Seq("x", "y"))
    }
    // 2D box: both layouts prune (the x-band helps the 1D control
    // too) — this checks result equality + z-tile locality
    val box = Seq(("x", 100L, 350L), ("y", 100L, 350L)) // ~1.25% of area
    val (_, zBox) = timed("leg10 z-order 2D box read") {
      val r = Sink.prunedReadMulti(spark, zdir, box)
      (r.inputFiles.length, r.count())
    }
    val (_, rBox) = timed("leg10 1D-layout same box read") {
      val r = Sink.prunedReadMulti(spark, rdir, box)
      (r.inputFiles.length, r.count())
    }
    require(zBox._2 == rBox._2, s"box results differ: $zBox vs $rBox")
    require(zBox._1 <= 12, s"z-order box opened ${zBox._1} of 64 files")
    // y-ONLY band: the claim z-order exists for — the x-clustered
    // layout has every file spanning all of y (prunes NOTHING), the
    // z layout keeps y locality in every tile
    val yband = Seq(("y", 100L, 350L))
    val (_, zY) = timed("leg10 z-order y-only band") {
      val r = Sink.prunedReadMulti(spark, zdir, yband)
      (r.inputFiles.length, r.count())
    }
    val (_, rY) = timed("leg10 1D-layout y-only band") {
      val r = Sink.prunedReadMulti(spark, rdir, yband)
      (r.inputFiles.length, r.count())
    }
    require(zY._2 == rY._2, s"y-band results differ: $zY vs $rY")
    println(s"[stress] leg10: 2D box z=${zBox._1}/64 vs 1D=${rBox._1}/64 files; " +
      s"y-band z=${zY._1}/64 vs 1D=${rY._1}/64 files")
    require(zY._1 <= 24 && rY._1 == 64,
      s"y-band pruning: z=${zY._1}, 1D=${rY._1} (expected z<<64, 1D=64)")

    // --- Leg 11: bloom point index on an unclustered column ---
    val bdir = java.nio.file.Files.createTempDirectory("stress_b").toString + "/t"
    val rows = spark.range(5000000L).select(col("id").as("k"),
      (col("id") * 2654435761L % 5000000L).as("v"))
    timed("leg11 write 64 files clustered on v + bloom(k)") {
      Sink.clusteredWrite(rows, bdir, Seq("v"), numFiles = 64)
      Sink.writeFileBloom(spark, bdir, "k", expectedItemsPerFile = 200000L)
    }
    val (_, pRes) = timed("leg11 bloom point lookup") {
      val r = Sink.bloomPointRead(spark, bdir, "k", 4242424L)
      (r.inputFiles.length, r.collect().length)
    }
    val (_, fRes) = timed("leg11 full-scan equality filter") {
      (64, spark.read.parquet(bdir).filter(col("k") === 4242424L).collect().length)
    }
    require(pRes._2 == fRes._2 && pRes._2 == 1)
    // the claim is FILES OPENED (object-store GETs at real scale) —
    // local warm-cache wall time doesn't register 64-vs-1 parquet
    // opens, so it's reported above for context, not asserted
    println(s"[stress] leg11: bloom point lookup opened ${pRes._1}/64 files " +
      s"(full scan: 64/64), identical single-row result")
    require(pRes._1 <= 4, s"bloom point lookup opened ${pRes._1} of 64 files")

    spark.stop()
  }
}
