package graft.examples

import graft.{Tables, TempDirs}
import graft.operators.{Geo, Search, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 stress legs — the PROBE-vs-INDEX-SIZE scale law for the
  * Stores-backed batch probe keys (r13 verdict ask #4), plus the
  * skewed-density law for the salted `Geo.radiusJoin` (ask #2).
  *
  * The maintained-index keys time a PROBE against a persisted index;
  * their 100 TB claim is that probe cost tracks the PROBE's touched
  * mass (posting lists of the probe terms / the nprobe probed cells),
  * not total index size. Each leg grows the index ~10× with content
  * the fixed probe set never touches — new-term postings (the
  * realistic web-corpus growth mode: new content adds new vocabulary
  * and new postings for OTHER terms), hash-shifted trigram postings,
  * vectors landing in non-probed IVF cells — and re-times the
  * identical probe. A probe whose cost is posting-list/cell-bound
  * shows exponent ~0; one that secretly scans the index shows ~1.
  *
  * Measured 2026-08-16, local[32], sf0.1, min-of-2 after warmup,
  * exponent = ln(t_big/t_1x)/ln(factor):
  *
  *  | leg | probe                      | t @1x  | t @~10x | exp   | claim |
  *  |-----|----------------------------|--------|---------|-------|-------|
  *  | 32  | multiPhraseSearch (posidx) | 0.58 s | 0.56 s  | −0.02 | ~0    |
  *  | 33  | substringSearch (trigram)  | 0.22 s | 0.31 s  | 0.14  | ~0    |
  *  | 34  | bm25TopKIndexed (postings) | 0.50 s | 0.44 s  | −0.05 | ~0    |
  *  | 35  | ivfTopKIndexed (IVF cells) | 0.26 s | 0.40 s  | 0.19  | ~0    |
  *  | 36  | radiusJoin 10× dense cells | 0.56 s | 1.67 s  | 0.48  | ≤1    |
  *
  *  | leg 36b (ONE mega-cell, shuffle join) | unsalted | salted 8×8 |
  *  |---------------------------------------|----------|------------|
  *  | occupancy 12,000 (~1.4e8 cand pairs)  |  5.77 s  |   1.30 s   |
  *  | occupancy 24,000                      | 22.33 s  |   2.40 s   |
  *  | occupancy 48,000 (~2.3e9 cand pairs)  | 103.71 s |   7.75 s   |
  *  | doubling exponent (12k→24k / 24k→48k) | 1.95/2.22|  0.88/1.69 |
  *
  * Reading: legs 32-35 hold near-FLAT — a ~10× index moves the probe
  * by at most ~1.5×, the parquet scan-and-filter floor (the probe
  * predicate pushes into the store scan), not per-row probe work.
  * Leg 36: 10× the number of constant-width dense cells is
  * corpus-LINEAR (0.48 ≤ 1 — per-reducer work stays cell-bounded).
  * Leg 36b pins the salt's actual regime: with broadcast DISABLED
  * (the 100 TB shape — neither side fits an executor; at probe scale
  * Spark broadcasts the small side and a BroadcastHashJoin hides the
  * skew entirely, measured unsalted 0.9 s < salted 1.4 s), the
  * unsalted mega-cell is ONE reducer and measures exactly quadratic
  * in occupancy (doubling exponents 1.95/2.22) while the 8×8
  * pair-grid spreads it 64 ways — 13.4× faster at 48k occupancy and
  * flattening toward work/64 as the cell grows. The salt buys the
  * per-reducer BOUND, which is what survives a 1000-executor cluster
  * and an urban-density cell three orders bigger.
  *
  * Run: `sbt "runMain graft.examples.StressR14"` (local[32]).
  */
object StressR14 {

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def timed(label: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s ($n rows)")
    sec
  }

  private def minOf2(label: String)(f: => Long): Double = {
    f // warmup
    math.min(timed(s"$label pass1")(f), timed(s"$label pass2")(f))
  }

  private def exponent(t1: Double, tN: Double, factor: Double): Double =
    math.log(tN / t1) / math.log(factor)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    val Off = 1000000000L

    // ---- leg 32: phrase probe vs positional-index size ----
    // pad copies carry PREFIXED terms: the index grows 10x, the probe
    // phrases' posting lists do not
    val pos1 = Search.positionalFrame(docs, "doc_id", "text")
    def posCopies(n: Int): DataFrame =
      (0 until n).map { i =>
        if (i == 0) pos1
        else pos1.select((col("id") + lit(i * Off)).as("id"),
          concat(lit(s"c${i}_"), col("term")).as("term"), col("pos"))
      }.reduce(_ unionByName _)
    val phrases = Seq(Seq("table", "table"), Seq("value", "table"),
      Seq("fast", "sort", "key"), Seq("quantum", "leap"))
    def posStore(n: Int): String = {
      val dir = TempDirs.create("stress_posidx_")
      posCopies(n).write.parquet(dir + "/t"); dir + "/t"
    }
    val ps1 = posStore(1); val ps10 = posStore(10)
    val l32a = minOf2("multiPhraseSearch @1x index")(
      force(Search.multiPhraseSearch(spark.read.parquet(ps1), phrases)))
    val l32b = minOf2("multiPhraseSearch @10x index")(
      force(Search.multiPhraseSearch(spark.read.parquet(ps10), phrases)))
    println(f"[stress] leg32 exponent ${exponent(l32a, l32b, 10.0)}%.2f")

    // ---- leg 33: trigram substring probe vs index size ----
    // pad copies shift the gram hash — new postings the fixed
    // pattern's gram IN-list never selects
    val tri1 = Search.trigramFrame(docs, "doc_id", "text")
    def triCopies(n: Int): DataFrame =
      (0 until n).map { i =>
        if (i == 0) tri1
        else tri1.select((col("id") + lit(i * Off)).as("id"),
          (col("gram") + lit(i * 1000000007L)).as("gram"))
      }.reduce(_ unionByName _)
    def triStore(n: Int): String = {
      val dir = TempDirs.create("stress_triidx_")
      triCopies(n).write.parquet(dir + "/t"); dir + "/t"
    }
    val ts1 = triStore(1); val ts10 = triStore(10)
    val l33a = minOf2("substringSearch @1x index")(
      force(Search.substringSearch(spark.read.parquet(ts1), docs,
        "doc_id", "text", "data group")))
    val l33b = minOf2("substringSearch @10x index")(
      force(Search.substringSearch(spark.read.parquet(ts10), docs,
        "doc_id", "text", "data group")))
    println(f"[stress] leg33 exponent ${exponent(l33a, l33b, 10.0)}%.2f")

    // ---- leg 34: bm25 indexed probe vs postings size ----
    // pad copies carry prefixed terms (df of the probe terms fixed);
    // the lens frame grows too — its 2-column corpus-stats aggregate
    // is the one legitimately corpus-sized piece of the probe
    val (p1, l1) = graft.functions.Text.bm25IndexFrames(docs, "doc_id", "text")
    def bmStore(n: Int): (String, String) = {
      val dir = TempDirs.create("stress_bm25idx_")
      (0 until n).map { i =>
        if (i == 0) p1
        else p1.select((col("doc_id") + lit(i * Off)).as("doc_id"),
          concat(lit(s"c${i}_"), col("term")).as("term"), col("tf"))
      }.reduce(_ unionByName _).write.parquet(dir + "/p")
      (0 until n).map { i =>
        if (i == 0) l1
        else l1.select((col("doc_id") + lit(i * Off)).as("doc_id"), col("len"))
      }.reduce(_ unionByName _).write.parquet(dir + "/l")
      (dir + "/p", dir + "/l")
    }
    val (bp1, bl1) = bmStore(1); val (bp10, bl10) = bmStore(10)
    val qts = Seq("spark", "hash", "join")
    val l34a = minOf2("bm25TopKIndexed @1x index")(
      force(graft.functions.Text.bm25TopKIndexed(
        spark.read.parquet(bp1), spark.read.parquet(bl1), qts, k = 50)))
    val l34b = minOf2("bm25TopKIndexed @10x index")(
      force(graft.functions.Text.bm25TopKIndexed(
        spark.read.parquet(bp10), spark.read.parquet(bl10), qts, k = 50)))
    println(f"[stress] leg34 exponent ${exponent(l34a, l34b, 10.0)}%.2f")

    // ---- leg 35: IVF probe vs index size ----
    // nlist=64, 2 fixed queries at nprobe=4 probe <=8 cells; pad =
    // replicas of NON-probed-cell vectors only, so the probed mass
    // is constant while the index grows ~10x (factor measured)
    val embs = Tables.embeddings(spark, d)
    val cents = embs.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val queries = embs.filter(col("vec_id") < 2)
    val qvecs = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toSeq)
    def sqDist(q: Seq[Double], c: Seq[Double]): Double =
      -2.0 * q.zip(c).map { case (a, b) => a * b }.sum +
        c.map(x => x * x).sum
    val probed = qvecs.flatMap(q =>
      cents.map { case (cell, c) => (sqDist(q, c), cell) }
        .sortBy(identity).take(4).map(_._2)).toSet
    val idx1 = Similarity.ivfIndexFrame(embs, "vec_id", "embedding", cents)
    val pad = idx1.filter(!col("__cell").isin(probed.toSeq: _*))
    def ivfStore(n: Int): String = {
      val dir = TempDirs.create("stress_ivfidx_")
      (0 until n).map { i =>
        if (i == 0) idx1
        else pad.withColumn("neighbor_id", col("neighbor_id") + lit(i * Off))
      }.reduce(_ unionByName _).write.parquet(dir + "/t")
      dir + "/t"
    }
    val is1 = ivfStore(1); val is10 = ivfStore(10)
    val factor = spark.read.parquet(is10).count().toDouble /
      spark.read.parquet(is1).count()
    val l35a = minOf2("ivfTopKIndexed @1x index")(
      force(Similarity.ivfTopKIndexed(spark.read.parquet(is1), queries,
        "embedding", "vec_id", k = 10, centroids = cents, nprobe = 4)))
    val l35b = minOf2(f"ivfTopKIndexed @${factor}%.1fx index")(
      force(Similarity.ivfTopKIndexed(spark.read.parquet(is10), queries,
        "embedding", "vec_id", k = 10, centroids = cents, nprobe = 4)))
    println(f"[stress] leg35 exponent ${exponent(l35a, l35b, factor)}%.2f")

    // ---- leg 36: radiusJoin, 10x constant-width dense cells ----
    // urban-density fixture: each "city" is one radius-sized cell
    // holding `width` points; scaling the CITY COUNT 10x at constant
    // width must be corpus-linear (per-cell work is bounded, the
    // pair-grid salt spreads it)
    val r = 1000L
    def cities(n: Int, width: Int): DataFrame =
      spark.range(n.toLong * width).select(
        col("id"),
        (floor(col("id") / width) * lit(100L * r)
          + pmod(col("id") * 7919L, lit(r))).as("x"),
        pmod(col("id") * 104729L, lit(r)).as("y"))
    def geoRun(src: DataFrame, thresh: Long): Long =
      force(Geo.radiusJoin(src, "id", src, "id", "x", "y", r,
        selfJoin = true, hotCellThreshold = thresh, salts = 4))
    val g1 = minOf2("radiusJoin @10 dense cells")(
      geoRun(cities(10, 600), thresh = 100L))
    val g10 = minOf2("radiusJoin @100 dense cells")(
      geoRun(cities(100, 600), thresh = 100L))
    println(f"[stress] leg36 exponent ${exponent(g1, g10, 10.0)}%.2f")

    // ---- leg 36b: ONE mega-cell, salted vs unsalted, occupancy sweep ----
    // Broadcast joins are disabled for this leg: at probe scale Spark
    // broadcasts the (tiny) left side, and a BroadcastHashJoin has no
    // per-key reducer — the mega-cell work parallelizes across the
    // streaming side's partitions and the skew is invisible (measured:
    // unsalted BEAT salted 0.9 s vs 1.4 s with broadcast on). At
    // 100 TB neither side broadcasts; the join is a shuffle join and
    // the unsalted mega-cell IS one reducer — that is the regime the
    // salt exists for, so the leg pins it explicitly.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeBc = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val sweep = Seq(12000, 24000, 48000).map { w =>
        val mega = cities(1, w)
        val gu = minOf2(s"radiusJoin mega-cell $w UNSALTED")(
          geoRun(mega, thresh = Long.MaxValue / 4))
        val gs = minOf2(s"radiusJoin mega-cell $w salted 8x8")(
          force(Geo.radiusJoin(mega, "id", mega, "id", "x", "y", r,
            selfJoin = true, hotCellThreshold = 100L, salts = 8)))
        (w, gu, gs)
      }
      sweep.sliding(2).foreach { case Seq((w1, u1, s1), (w2, u2, s2)) =>
        println(f"[stress] leg36b $w1%d->$w2%d occupancy-doubling exponent: " +
          f"unsalted ${exponent(u1, u2, 2.0)}%.2f  salted ${exponent(s1, s2, 2.0)}%.2f")
      }
      val (w, gu, gs) = sweep.last
      println(f"[stress] leg36b @$w%d: salted $gs%.2f s vs unsalted $gu%.2f s " +
        f"(${gu / gs}%.1fx)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevAqeBc match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }

    spark.stop()
  }
}
