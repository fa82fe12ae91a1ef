package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.sql.DataFrame

/** Gradient-boosted-trees sibling of [[RandomForestPipeline]] — the second
  * tree-ensemble family a model-comparison workflow reaches for (beyond
  * the reference's RF-only surface, like [[ModelSelection]] and
  * [[QualityFilter]] before it). Reuses the assembler, sample/split and
  * evaluation machinery so RF-vs-GBT numbers differ only in the learner.
  *
  * Scale posture: GBT training is sequential in trees (each iteration fits
  * to the previous ensemble's residuals — boosting cannot parallelize
  * across trees the way a forest does) but each iteration is the same
  * distributed histogram aggregation as RF, so wall-clock scales with
  * maxIter × (one tree's level jobs) and the sampled-training-set
  * right-sizing note on [[RandomForestPipeline.trainPredict]] applies
  * unchanged. The fitted ensemble lives on the driver and broadcasts for
  * inference.
  */
object GbtPipeline {

  /** Deterministic pinned config: shallow trees × 10 boosting rounds —
    * the conventional depth-vs-iterations tradeoff flipped from RF's
    * deep-trees × many. */
  def classifier(labelCol: String): GBTClassifier =
    new GBTClassifier()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setMaxIter(10)
      .setMaxDepth(4)
      .setStepSize(0.1)
      .setSeed(42)
      .setCacheNodeIds(true)

  def pipeline(featureCols: Seq[String], labelCol: String): Pipeline =
    new Pipeline().setStages(
      Array(RandomForestPipeline.assembler(featureCols), classifier(labelCol)))

  /** Delegates to [[RandomForestPipeline.trainPredictWith]] — ONE
    * sample/split/fit/transform definition for both families, so the
    * identical-held-out-rows contract (same seeds ⇒ metric deltas are
    * model deltas) is structural, not copy-kept. */
  def trainPredict(df: DataFrame, featureCols: Seq[String], labelCol: String,
                   sampleFraction: Double = 0.3, seed: Long = 42,
                   trainPartitions: Int = 4): (PipelineModel, DataFrame) =
    RandomForestPipeline.trainPredictWith(pipeline(featureCols, labelCol), df,
      sampleFraction, seed, trainPartitions)
}
