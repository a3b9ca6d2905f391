package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  // deterministic synthetic corpus: 8 clusters of 16 vectors in R^16
  private lazy val corpus = {
    val rows = for {
      cluster <- 0 until 8
      member <- 0 until 16
    } yield {
      val id = cluster * 16L + member
      val v = Array.tabulate(16) { d =>
        val base = if (d == cluster * 2) 1.0f else 0.0f
        // small deterministic jitter per member
        base + 0.05f * (((id * 31 + d * 7) % 11).toInt - 5)
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("bruteForceTopK: neighbors are ranked by cosine, self excluded") {
    val q = corpus.filter($"vec_id" === 0)
    val out = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", "vec_id", k = 5)
      .orderBy("rank").collect()
    assert(out.length === 5)
    assert(!out.map(_.getLong(1)).contains(0L))
    val cosines = out.map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    // top neighbors come from the same cluster (ids 1..15)
    assert(out.take(3).map(_.getLong(1)).forall(_ < 16L))
  }

  test("lshTopK recall vs brute force ≥ 0.6 with 4 tables × 8 planes") {
    val queries = corpus.filter($"vec_id" % 16 === 0) // one per cluster
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k))
    val approx = pairs(Similarity.lshTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, planes = 8, tables = 4))
    val recall = truth.intersect(approx).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall $recall too low")

    // multi-probe (flip the lowest-margin sign bits of the QUERY
    // buckets): candidate set is a superset per construction, so
    // recall can only rise — and the extra keys exist only on the
    // broadcast query side
    val probed = pairs(Similarity.lshTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, planes = 8, tables = 4, nprobe = 4))
    val recallP = truth.intersect(probed).size.toDouble / truth.size
    assert(recallP >= recall,
      s"multi-probe recall $recallP fell below single-probe $recall")
    assert(recallP >= 0.8, s"multi-probe recall $recallP below 0.8")
  }

  test("hyperplaneProbeBuckets: base first, single-bit flips, nprobe=1 degenerates") {
    val one = corpus.limit(1)
    def buckets(np: Int): Seq[Long] = one.select(
      Similarity.hyperplaneProbeBuckets($"embedding", planes = 8, table = 0,
        nprobe = np).as("b"))
      .collect()(0).getAs[collection.Seq[Long]]("b").toSeq
    val base = one.select(
      Similarity.hyperplaneBucket($"embedding", planes = 8, table = 0).as("b"))
      .collect()(0).getLong(0)
    assert(buckets(1) === Seq(base))
    val b4 = buckets(4)
    assert(b4.length === 4 && b4.head === base && b4.distinct === b4)
    // every probe differs from the base in exactly one bit
    b4.tail.foreach { p =>
      assert(java.lang.Long.bitCount(p ^ base) === 1, s"probe $p vs base $base")
    }
  }

  test("lshTopK candidate generation never shuffles embedding vectors") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.ArrayType
    val queries = corpus.filter($"vec_id" % 16 === 0)
    val df = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      "vec_id", k = 5, planes = 8, tables = 4)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // materialized AQE shuffles hide inside QueryStageExec LEAVES —
    // plain collect() never descends into them
    def allShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case q: QueryStageExec => allShuffles(q.plan)
      case e: ShuffleExchangeLike => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    val shuffles = allShuffles(plan)
    assert(shuffles.nonEmpty, "expected at least one shuffle in the plan")
    // an array column may only ever move keyed by the id (the ONE
    // survivor vector fetch); the (table, bucket) candidate join and
    // the pair distinct shuffle bare scalars only
    shuffles.foreach { s =>
      val arrayCols = s.output.filter(_.dataType.isInstanceOf[ArrayType])
      val keyNames: Seq[String] = s.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name).toSeq)
        case _ => Seq.empty
      }
      assert(arrayCols.isEmpty || keyNames.forall(Set("neighbor_id", "query_id")),
        s"bucket/pair shuffle carries array columns ${arrayCols.map(_.name)} " +
          s"keyed by $keyNames")
    }
  }

  test("ivfTopK recall vs brute force ≥ 0.8 probing half the cells") {
    val queries = corpus.filter($"vec_id" % 16 === 0)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k))
    val ivf = pairs(Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, nlist = 8, nprobe = 4))
    val recall = truth.intersect(ivf).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall too low")
    // ivf is a subset of the exact ranking universe — sanity on shape
    val out = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      "vec_id", k, nlist = 8, nprobe = 4).collect()
    assert(out.forall(_.getInt(3) <= k))
    // a pre-trained quantizer is reusable across calls (train once per
    // corpus version, probe many times) and reproduces the same result
    val model = Similarity.trainIvfQuantizer(corpus, "embedding", nlist = 8)
    val reused = pairs(Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, nlist = 8, nprobe = 4,
      model = Some(model)))
    assert(reused === ivf)
  }

  test("knnLabel: majority vote, deterministic tie-break to the lowest label") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f), 7),
      (2L, Array(0.9f, 0.1f), 7),
      (3L, Array(0.0f, 1.0f), 3),
      (4L, Array(0.1f, 0.9f), 3)
    ).toDF("vec_id", "embedding", "label")
    val unl = Seq((100L, Array(1.0f, 0.05f)), (101L, Array(0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnLabel(labeled, unl, "vec_id", "embedding",
        "label", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(100L) === ((7, 2L))) // both near neighbors vote 7
    assert(out(101L) === ((3, 2L)))
    // k=4 sees all four seeds → 2:2 tie → lowest label wins
    val tied = Similarity.knnLabel(labeled, unl, "vec_id", "embedding",
        "label", k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tied(100L) === 3 && tied(101L) === 3)
  }

  test("incremental IVF: appended index batches answer identically to a full rebuild") {
    val queries = corpus.filter($"vec_id" % 16 === 0)
    val cents = Similarity.trainIvfQuantizer(corpus, "embedding", nlist = 8)
      .clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val full = res(Similarity.ivfTopKWith(corpus, queries, "vec_id",
      "embedding", "vec_id", k = 5, centroids = cents, nprobe = 4))
    // frozen centroids ⇒ per-row assignment is deterministic, so two
    // batch-built frames unioned ≡ the full corpus indexed at once —
    // the contract the daily-ingest path [ann_ivf_incr_topk] grades
    val idx = Similarity.ivfIndexFrame(corpus.filter($"vec_id" < 30),
        "vec_id", "embedding", cents)
      .unionByName(Similarity.ivfIndexFrame(corpus.filter($"vec_id" >= 30),
        "vec_id", "embedding", cents))
    val incr = res(Similarity.ivfTopKIndexed(idx, queries, "embedding",
      "vec_id", k = 5, centroids = cents, nprobe = 4))
    assert(incr === full)
  }

  test("IVF quantizer survives save/load with identical bucket assignments") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_q").toString
    val model = Similarity.trainIvfQuantizer(corpus, "embedding", nlist = 8)
    Similarity.saveIvfQuantizer(model, s"$dir/quantizer")
    val loaded = Similarity.loadIvfQuantizer(s"$dir/quantizer")
    // centroids identical bit-for-bit
    assert(loaded.clusterCenters.map(_.toArray.toSeq).toSeq ===
      model.clusterCenters.map(_.toArray.toSeq).toSeq)
    // and the whole serving path reproduces the same ranking
    val queries = corpus.filter($"vec_id" % 16 === 0)
    def res(m: org.apache.spark.ml.clustering.KMeansModel) =
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", "vec_id",
          k = 5, nlist = 8, nprobe = 4, model = Some(m))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(res(loaded) === res(model))
  }

  test("hyperplaneBucket is deterministic across evaluations") {
    val b1 = corpus.select(Similarity.hyperplaneBucket($"embedding", 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b2 = corpus.select(Similarity.hyperplaneBucket($"embedding", 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 === b2)
  }

  test("sqTopK: int8 codes in range, degenerate dims, high recall, exact rerank") {
    val stats = Similarity.trainSq(corpus, "embedding")
    assert(stats.length === 16)
    // every code in tinyint range; clamp arithmetic exact
    val codes = corpus.select(
      Similarity.sqEncode($"embedding", stats.toSeq).as("c"))
      .select(explode($"c").as("v")).agg(min("v"), max("v")).head
    assert(codes.getByte(0) >= -128 && codes.getByte(1) <= 127)
    // a constant dimension encodes -128 everywhere (degenerate branch)
    val withConst = corpus.select($"vec_id",
      concat($"embedding", array(lit(3.5f))).as("embedding"))
    val constStats = Similarity.trainSq(withConst, "embedding")
    assert(constStats(16) === ((3.5, 3.5)))
    val lastCode = withConst.select(
      Similarity.sqEncode($"embedding", constStats.toSeq).as("c"))
      .select(element_at($"c", 17).as("v")).distinct().collect()
    assert(lastCode.map(_.getByte(0)).toSeq === Seq(-128.toByte))
    // recall vs brute force: int8 on this corpus with 4x rerank
    // should be near-exact
    val queries = corpus.filter($"vec_id" % 16 === 0)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k))
    val sq = Similarity.sqTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, rerankMult = 4)
    val recall = truth.intersect(pairs(sq)).size.toDouble / truth.size
    assert(recall >= 0.9, s"sq8 recall $recall below 0.9")
    // rerank scores are the EXACT cosine: every surviving pair's score
    // equals the brute-force cosine for that pair
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "vec_id", k)
      .select($"query_id", $"neighbor_id", $"cosine".as("bc"))
    val joined = sq.join(brute, Seq("query_id", "neighbor_id"))
      .filter($"cosine" =!= $"bc").count()
    assert(joined === 0L, "rerank cosine diverged from brute force")
    // pre-trained stats reuse gives the identical result (stats are
    // trained over the NORMALIZED vectors, as sqTopK quantizes them)
    val normStats = Similarity.trainSq(
      corpus.select(Similarity.unitNorm($"embedding").as("nv")), "nv")
    val again = Similarity.sqTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k, rerankMult = 4,
      stats = Some(normStats))
    assert(pairs(again) === pairs(sq))
    Par.release()
  }

  test("pqTopK: trained + deterministic codebooks, recall, exact rerank") {
    val queries = corpus.filter($"vec_id" % 16 === 0)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "vec_id", k))
    // trained codebooks (m=4 subspaces of 4 dims, 8 codes each)
    val books = Similarity.trainPq(corpus, "embedding", dims = 16,
      m = 4, ncodes = 8)
    assert(books.length === 4 && books.forall(_.length === 8) &&
      books.forall(_.forall(_.length === 4)))
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      "vec_id", k, dims = 16, m = 4, ncodes = 8, rerankMult = 4,
      codebooks = Some(books))
    val recall = truth.intersect(pairs(pq)).size.toDouble / truth.size
    assert(recall >= 0.6, s"pq recall $recall below 0.6")
    // rerank scores are the exact cosine
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "vec_id", k)
      .select($"query_id", $"neighbor_id", $"cosine".as("bc"))
    val diverged = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", k, dims = 16, codebooks = Some(books))
      .join(brute, Seq("query_id", "neighbor_id"))
      .filter($"cosine" =!= $"bc").count()
    assert(diverged === 0L, "rerank cosine diverged from brute force")
    // deterministic codebooks (subvectors of the 8 lowest-id vectors,
    // normalized — the SQL-replicable variant the graded query uses)
    val first = corpus.filter($"vec_id" < 8)
      .select($"vec_id", Similarity.unitNorm($"embedding").as("nv"))
      .orderBy($"vec_id").collect()
      .map(_.getSeq[Double](1).toSeq)
    val detBooks = (0 until 4).map(j => first.map(_.slice(j * 4, j * 4 + 4)).toSeq)
    val det1 = pairs(Similarity.pqTopKWith(corpus, queries, "vec_id",
      "embedding", "vec_id", k, detBooks, rerankMult = 4))
    val det2 = pairs(Similarity.pqTopKWith(corpus.repartition(7), queries,
      "vec_id", "embedding", "vec_id", k, detBooks, rerankMult = 4))
    assert(det1 === det2)
    Par.release()
  }
}
