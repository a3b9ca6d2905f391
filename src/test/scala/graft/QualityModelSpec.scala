package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  // 30 diverse docs (distinct words, ≥25 words) and 30 repetitive
  // spam docs — linearly separable in the signal space by design
  private lazy val corpus = {
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo",
      "sierra", "tango", "uniform", "victor", "whiskey", "xray",
      "yankee", "zulu")
    val good = (0 until 30).map { i =>
      val words = (0 until 30).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i, words.mkString(" "))
    }
    val bad = (30 until 60).map { i =>
      (i, Seq.fill(30)("spam").mkString(" "))
    }
    (good ++ bad).toDF("doc_id", "text")
  }

  test("features: one row per doc with the documented signal columns") {
    val f = QualityModel.features(corpus, "doc_id", "text")
    assert(f.count() === 60)
    assert(f.columns.toSeq === Seq("doc_id", "f_words",
      "f_distinct_ratio", "f_top_word_frac", "f_top_ngram_frac",
      "f_dup_ngram_frac", "f_mean_word_len", "f_stopword_ratio"))
    val spamRow = f.filter(col("doc_id") === 30).collect()(0)
    assert(spamRow.getAs[Double]("f_top_word_frac") === 1.0)
    assert(spamRow.getAs[Double]("f_distinct_ratio") < 0.05)
  }

  test("trainScore separates planted good and spam docs") {
    val scored = QualityModel.trainScore(corpus, "doc_id", "text",
      minWords = 10L, maxWords = 1000L,
      minDistinctRatio = 0.3, maxTopWordFrac = 0.5)
    assert(scored.count() === 60)
    val rows = scored.collect().map(r => (r.getAs[Int]("doc_id"),
      r.getAs[Int]("label"), r.getAs[Double]("quality_score"),
      r.getAs[Int]("pred"))).toSeq
    // teacher labels: the diverse docs keep, the spam docs fail
    assert(rows.filter(_._1 < 30).forall(_._2 === 1))
    assert(rows.filter(_._1 >= 30).forall(_._2 === 0))
    // scores live in [0, 1]
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    // the model reproduces its teacher on this separable corpus
    val agree = rows.count(r => r._2 === r._4)
    assert(agree >= 54, s"model agrees with teacher on only $agree/60")
    // and the score GAP is wide: mean P(keep) of good ≫ spam
    val goodMean = rows.filter(_._2 == 1).map(_._3).sum / 30
    val badMean = rows.filter(_._2 == 0).map(_._3).sum / 30
    assert(goodMean > badMean + 0.5,
      s"no separation: good=$goodMean bad=$badMean")
    graft.Par.release()
  }
}
