package graft

import graft.sources.Sink
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  // 200×200 uniform grid — the workload shape z-order exists for:
  // queries band BOTH dims, no single sort order serves them
  private def grid() = {
    val pts = for (x <- 1L to 200L; y <- 1L to 200L) yield (x, y, x * y)
    scala.util.Random.shuffle(pts.toList).toDF("x", "y", "v")
  }

  test("zorderWrite round-trips the data unchanged") {
    val dir = tmpDir("zw") + "/t"
    val df = grid()
    val n = Sink.zorderWrite(df, dir, Seq("x", "y"), numFiles = 16)
    assert(n === 16)
    val back = spark.read.parquet(dir)
    assert(back.count() === 40000L)
    assert(back.agg(sum("v")).head.getLong(0) ===
      df.agg(sum("v")).head.getLong(0))
  }

  test("2D box query: z-order layout prunes files where a 1D layout cannot") {
    val df = grid()
    val zdir = tmpDir("zbox") + "/z"
    val rdir = tmpDir("zbox") + "/r"
    Sink.zorderWrite(df, zdir, Seq("x", "y"), numFiles = 16)
    Sink.writeFileStats(spark, zdir, Seq("x", "y"))
    // 1D control: perfectly clustered on x ONLY
    Sink.clusteredWrite(df, rdir, Seq("x"), numFiles = 16)
    Sink.writeFileStats(spark, rdir, Seq("x", "y"))
    val box = Seq(("x", 10L, 40L), ("y", 10L, 40L))
    val zRead = Sink.prunedReadMulti(spark, zdir, box)
    val rRead = Sink.prunedReadMulti(spark, rdir, box)
    val expected = df.filter(col("x").between(10, 40) && col("y").between(10, 40))
      .select("x", "y", "v").collect().map(_.toSeq).sortBy(_.mkString(","))
    for (read <- Seq(zRead, rRead))
      assert(read.select("x", "y", "v").collect().map(_.toSeq)
        .sortBy(_.mkString(",")).toSeq === expected.toSeq)
    // the z-layout tiles the plane ~4×4, so a ~15% box touches a few
    // tiles; the x-layout has every file spanning ALL of y, so the
    // y-band prunes nothing and only the x-band prunes (4/16 best
    // case). The z read must scan strictly fewer files than the grid
    // has x-slices for the SAME query.
    val zFiles = zRead.inputFiles.length
    val rFiles = rRead.inputFiles.length
    assert(zFiles <= 4, s"z-order box query scanned $zFiles of 16 files")
    assert(zFiles < 16 && rFiles <= 16)
  }

  test("a y-only band prunes on z-order but scans everything on the x layout") {
    val df = grid()
    val zdir = tmpDir("zy") + "/z"
    val rdir = tmpDir("zy") + "/r"
    Sink.zorderWrite(df, zdir, Seq("x", "y"), numFiles = 16)
    Sink.writeFileStats(spark, zdir, Seq("x", "y"))
    Sink.clusteredWrite(df, rdir, Seq("x"), numFiles = 16)
    Sink.writeFileStats(spark, rdir, Seq("x", "y"))
    val band = Seq(("y", 1L, 45L))
    val zRead = Sink.prunedReadMulti(spark, zdir, band)
    val rRead = Sink.prunedReadMulti(spark, rdir, band)
    assert(zRead.count() === rRead.count())
    // x-clustered files all span y fully → zero skipping on a y band
    assert(rRead.inputFiles.length === 16)
    // z-order: the band covers ~the bottom quarter of y → at most the
    // bottom row of tiles plus straddlers
    assert(zRead.inputFiles.length <= 8,
      s"z-order y-band scanned ${zRead.inputFiles.length} of 16 files")
  }

  test("per-file bloom index prunes point lookups min/max stats cannot") {
    val dir = tmpDir("bloomidx") + "/t"
    // clustered by v — k is uniform across every file, so k's min/max
    // stats span the domain in all files (zero skipping potential)
    val df = scala.util.Random.shuffle((1L to 8000L).toList)
      .map(i => (i, (i * 7919L) % 8000L)).toDF("k", "v")
    Sink.clusteredWrite(df, dir, Seq("v"), numFiles = 16)
    assert(Sink.writeFileBloom(spark, dir, "k",
      expectedItemsPerFile = 10000L) === 16)
    val hit = Sink.bloomPointRead(spark, dir, "k", 4321L)
    assert(hit.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((4321L, (4321L * 7919L) % 8000L)))
    // the whole point: the lookup opens ~1 file (fp-bounded), not 16
    assert(hit.inputFiles.length <= 3,
      s"bloom index opened ${hit.inputFiles.length} of 16 files")
    // an absent key prunes everything (no false negatives needed) —
    // a rare fp may keep a file; the residual filter yields 0 rows
    val miss = Sink.bloomPointRead(spark, dir, "k", 999999L)
    assert(miss.count() === 0L)
  }

  test("skewed/degenerate columns still round-trip (layout-only scaling)") {
    val dir = tmpDir("zskew") + "/t"
    // y constant (zero span) — scaling must not divide by zero
    val df = (1L to 1000L).map(i => (i, 7L)).toDF("x", "y")
    Sink.zorderWrite(df, dir, Seq("x", "y"), numFiles = 4)
    assert(spark.read.parquet(dir).count() === 1000L)
    Sink.writeFileStats(spark, dir, Seq("x", "y"))
    assert(Sink.prunedReadMulti(spark, dir, Seq(("x", 1L, 100L), ("y", 7L, 7L)))
      .count() === 100L)
    // a band missing the constant entirely prunes every file
    assert(Sink.prunedReadMulti(spark, dir, Seq(("y", 8L, 9L))).count() === 0L)
  }
}
