package graft.ml

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hyperparameter selection over the pinned RF pipeline — beyond-reference
  * (SURVEY §2.10: the reference hard-codes numTrees=30/maxDepth=8 with no
  * search; a real user's next step after reproducing its models is
  * selecting those numbers instead of trusting them).
  *
  * Both MLlib strategies are exposed:
  *   - [[trainValidationSelect]]: one 75/25 split per grid point — fits
  *     |grid| models. The cheap screen.
  *   - [[crossValidateSelect]]: k-fold CV — fits |grid|×k models. The
  *     variance-controlled confirm.
  *
  * At 100 TB both parallelize two ways: each fit is MLlib's distributed
  * level-wise training (SCALE.md §ML), and independent grid points are
  * dispatched concurrently by `setParallelism` — grid search is
  * embarrassingly parallel above the data parallelism. Selection state
  * (metrics per grid point) is O(|grid|) on the driver, never data-sized.
  */
object ModelSelection {

  /** The default screen grid: tree count only, depth pinned to the
    * reference's 8 — small by design so the registered query stays cheap
    * at test SF; widen per use. */
  def defaultGrid(rf: RandomForestClassifier): Array[ParamMap] =
    new ParamGridBuilder()
      .addGrid(rf.numTrees, Array(10, 30))
      .build()

  private def evaluator(labelCol: String): BinaryClassificationEvaluator =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")

  /** TrainValidationSplit over the assembled pipeline. Returns the fitted
    * selector (best model inside) — metrics via [[report]]. */
  def trainValidationSelect(df: DataFrame, featureCols: Seq[String], labelCol: String,
                            trainRatio: Double = 0.75, seed: Long = 42,
                            parallelism: Int = 2): TrainValidationSplitModel = {
    val rf = RandomForestPipeline.classifier(labelCol)
    val pipe = new org.apache.spark.ml.Pipeline()
      .setStages(Array(RandomForestPipeline.assembler(featureCols), rf))
    new TrainValidationSplit()
      .setEstimator(pipe)
      .setEstimatorParamMaps(defaultGrid(rf))
      .setEvaluator(evaluator(labelCol))
      .setTrainRatio(trainRatio)
      .setSeed(seed)
      .setParallelism(parallelism)
      .fit(df)
  }

  /** k-fold CrossValidator over the same pipeline/grid. */
  def crossValidateSelect(df: DataFrame, featureCols: Seq[String], labelCol: String,
                          folds: Int = 2, seed: Long = 42,
                          parallelism: Int = 2): CrossValidatorModel = {
    val rf = RandomForestPipeline.classifier(labelCol)
    val pipe = new org.apache.spark.ml.Pipeline()
      .setStages(Array(RandomForestPipeline.assembler(featureCols), rf))
    new CrossValidator()
      .setEstimator(pipe)
      .setEstimatorParamMaps(defaultGrid(rf))
      .setEvaluator(evaluator(labelCol))
      .setNumFolds(folds)
      .setSeed(seed)
      .setParallelism(parallelism)
      .fit(df)
  }

  /** One row per grid point: the searched param values, the validation
    * metric, and whether it won. Works for either selector's output. */
  def report(spark: SparkSession, grid: Array[ParamMap],
             metrics: Array[Double]): DataFrame = {
    import spark.implicits._
    val best = metrics.indices.maxBy(metrics)
    grid.zip(metrics).zipWithIndex.map { case ((pm, m), i) =>
      val params = pm.toSeq.sortBy(_.param.name)
        .map(p => s"${p.param.name}=${p.value}").mkString(",")
      (params, m, i == best)
    }.toSeq.toDF("params", "val_auc", "is_best")
  }
}
