package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** fastText-style document quality classifier — the model-based filter tier
  * of web-corpus curation (CCNet, Wenzek et al. 2020; the GPT-3 data work,
  * Brown et al. 2020 appendix A): train a LINEAR classifier on hashed
  * bag-of-words features to score "does this document look like the target
  * corpus?", then keep documents the model scores above a threshold. The
  * heuristic tier ([[graft.ops.LlmData]] quality/repetition scores) catches
  * boilerplate; this tier catches distributional drift the heuristics
  * can't express. Complements [[graft.ops.LlmData.dsirSelect]]: DSIR is the
  * closed-form importance weight over the same hashed features; this is the
  * trained-discriminator version of the same question.
  *
  * Weak labels: the heuristic-tier composite quality score
  * ([[graft.ops.LlmData.qualityScore]]) thresholded at its corpus median —
  * the bootstrap construction real pipelines use (FineWeb-Edu trains its
  * filter on scored labels; CCNet on "looks like the curated corpus").
  * The model must REDISCOVER the heuristic's decision surface from raw
  * hashed bag-of-words + two scalars, measured on a held-out split — the
  * point being that once trained, the linear scorer generalizes to signals
  * the fixed formula misses. (A lang-based label is NOT used: the synthetic
  * corpus shares one 31-token vocabulary across all langs with matched
  * frequencies, so that label is unlearnable by construction — measured
  * held-out AUC 0.54.) Train/test split uses the engine's deterministic
  * [[graft.ops.Etl.hashBucket]] rather than `randomSplit`, so membership is
  * stable under repartitioning and reproducible in any engine.
  *
  * Scale shape: featurization is per-row narrow work (tokenize → murmur3
  * bucket counts → sparse vector, no shuffle); LBFGS does one
  * treeAggregate gradient pass per iteration (driver state = one
  * numFeatures-sized dense vector, 2^12 doubles here — constant in corpus
  * size); scoring is a per-row model broadcast. The same design holds at
  * 100 TB with the gradient passes as the only corpus scans.
  */
object QualityFilter {

  val NumFeatures = 4096 // 2^12 hashed-term buckets

  /** Tokens column → hashed term-frequency vector + two scalar stats the
    * fastText recipe keeps (token count, mean token length). */
  def pipeline(labelCol: String): Pipeline = {
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(NumFeatures)
    val asm = new VectorAssembler()
      .setInputCols(Array("tf", "n_toks_d", "mean_tok_len"))
      .setOutputCol("features").setHandleInvalid("skip")
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.0)
    new Pipeline().setStages(Array(tf, asm, lr))
  }

  /** Threshold for the heuristic-score weak label — the corpus median of
    * [[graft.ops.LlmData.qualityScore]]'s composite on the synthetic
    * corpus (measured 0.624 at sf0.001), giving balanced classes whose
    * boundary is the stopword-density band, not just the length band. */
  val LabelThreshold = 0.62

  /** Documents frame with weak label + the classifier's input columns. */
  def featurize(spark: SparkSession, dir: String,
                threshold: Double = LabelThreshold): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        Text.tokensLower($"text").as("toks"),
        when(graft.ops.LlmData.qualityCol($"text") >= threshold, 1.0)
          .otherwise(0.0).as("is_target"))
      .withColumn("n_toks_d", size($"toks").cast("double"))
      .withColumn("mean_tok_len",
        when(size($"toks") > 0,
          aggregate(transform($"toks", t => length(t)), lit(0),
            (acc, v) => acc + v).cast("double") / size($"toks"))
          .otherwise(0.0))
  }

  /** Train on the deterministic 80% hash split, score everything.
    * Returns (model, heldOutPredictions, fullCorpusScored). */
  def trainScore(spark: SparkSession, dir: String,
                 threshold: Double = LabelThreshold): (PipelineModel, DataFrame, DataFrame) = {
    val df = featurize(spark, dir, threshold).cache()
    val bucket = graft.ops.Etl.hashBucket(col("doc_id"))
    val model = pipeline("is_target").fit(df.filter(bucket < 80).repartition(4))
    val scored = model.transform(df)
    (model, scored.filter(bucket >= 80), scored)
  }
}
