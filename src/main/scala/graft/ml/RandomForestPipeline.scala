package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RandomForest train/evaluate machinery shared by [[CongestionModel]] and
  * [[DelayModel]] (SURVEY §2.8 M3-M9, §3.3;
  * /root/reference/nyc_taxi_final.py:785-822, 890-912, 956-960).
  *
  * The classifier config is pinned to the reference's
  * (nyc_taxi_final.py:792-802). Training at cluster scale is MLlib's
  * distributed histogram aggregation — one job per tree depth level — with
  * the fitted forest held on the driver and broadcast for inference, so
  * nothing here collects data-sized relations.
  */
object RandomForestPipeline {

  /** M3: feature assembly, rows with nulls skipped
    * (nyc_taxi_final.py:785-789). */
  def assembler(featureCols: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")

  /** M4: the pinned RandomForest config (nyc_taxi_final.py:792-802). */
  def classifier(labelCol: String): RandomForestClassifier =
    new RandomForestClassifier()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setNumTrees(30)
      .setMaxDepth(8)
      .setMinInstancesPerNode(10)
      .setSubsamplingRate(0.7)
      .setFeatureSubsetStrategy("sqrt")
      .setSeed(42)
      .setCacheNodeIds(true)

  /** M5: assembler → classifier pipeline (nyc_taxi_final.py:805-806). */
  def pipeline(featureCols: Seq[String], labelCol: String): Pipeline =
    new Pipeline().setStages(Array(assembler(featureCols), classifier(labelCol)))

  /** X1 + X2 + M5/M6: sample, 80/20 split, fit, transform the held-out set
    * (nyc_taxi_final.py:744, 808, 822, 890). Returns (model, predictions).
    */
  def trainPredict(df: DataFrame, featureCols: Seq[String], labelCol: String,
                   sampleFraction: Double = 0.3, seed: Long = 42,
                   trainPartitions: Int = 4): (PipelineModel, DataFrame) =
    trainPredictWith(pipeline(featureCols, labelCol), df,
      sampleFraction, seed, trainPartitions)

  /** The sample → split → fit → transform core, shared with
    * [[GbtPipeline]] so both model families see IDENTICAL held-out rows
    * under the same seeds (MlPipelineSpec asserts the contract) — one
    * definition, structurally impossible to drift. */
  def trainPredictWith(pipe: Pipeline, df: DataFrame,
                       sampleFraction: Double = 0.3, seed: Long = 42,
                       trainPartitions: Int = 4): (PipelineModel, DataFrame) = {
    val sampled =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed)
    // Right-size the training input: every RF level-job task allocates the
    // FULL per-node split-stats aggregate (#nodes × #features × #bins ×
    // #classes doubles — tens of MB at depth 8 × 30 trees), so task count,
    // not row count, dominates cost on the sampled training set. The sample
    // is orders of magnitude smaller than the corpus; shrinking it to a few
    // fat partitions is the same move the reference makes with
    // shuffle.partitions=4 on its 4-core cluster (nyc_taxi_final.py:706).
    // At a real 100 TB deployment, scale trainPartitions to the sampled
    // size, not the corpus size.
    val Array(train, test) = sampled.randomSplit(Array(0.8, 0.2), seed)
    val model = pipe.fit(train.repartition(trainPartitions))
    (model, model.transform(test))
  }

  /** M8 + M9: areaUnderROC on rawPrediction plus the four weighted
    * multiclass metrics off one reused evaluator
    * (nyc_taxi_final.py:897-912). */
  def evaluate(predictions: DataFrame, labelCol: String): Map[String, Double] = {
    val binary = new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
    val multi = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
    Map(
      "roc_auc" -> binary.evaluate(predictions),
      "accuracy" -> multi.setMetricName("accuracy").evaluate(predictions),
      "weighted_precision" -> multi.setMetricName("weightedPrecision").evaluate(predictions),
      "weighted_recall" -> multi.setMetricName("weightedRecall").evaluate(predictions),
      "f1" -> multi.setMetricName("f1").evaluate(predictions))
  }

  /** M7 + O2: feature importances off the forest (last pipeline stage),
    * mapped to per-SLOT names via the assembled column's ML attribute
    * metadata (vector inputs like `time_period_ohe` expand to one slot per
    * category), driver-side sorted descending with a name tie-break.
    *
    * NOTE the reference instead zips the raw `feature_cols` list against the
    * slot array (nyc_taxi_final.py:836-838) — misaligned whenever a vector
    * column expands; deliberate deviation, documented per SURVEY §2.11.
    */
  def featureImportances(model: PipelineModel, predictions: DataFrame): Seq[(String, Double)] = {
    val imps = model.stages.last match {
      case rf: RandomForestClassificationModel => rf.featureImportances.toArray
      case gbt: org.apache.spark.ml.classification.GBTClassificationModel =>
        gbt.featureImportances.toArray
      case other => throw new IllegalArgumentException(
        s"no importances for final stage ${other.getClass.getSimpleName}")
    }
    val attrs = AttributeGroup.fromStructField(predictions.schema("features")).attributes
    val names = attrs match {
      case Some(a) => a.map(at => at.name.getOrElse(s"f${at.index.getOrElse(-1)}"))
      case None => imps.indices.map(i => s"f$i").toArray
    }
    names.zip(imps).toSeq.sortBy { case (n, imp) => (-imp, n) }
  }

  /** S8: overwrite model sink + load round-trip
    * (nyc_taxi_final.py:956-960). */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)
}

/** The is_congested classifier (pipeline 3, nyc_taxi_final.py:655-966). */
object CongestionModel {
  /** nyc_taxi_final.py:747-752. */
  val featureCols: Seq[String] = Seq(
    "trip_distance", "tolls_amount", "extra",
    "hour", "minute", "day_of_week", "day_of_month", "month", "is_holiday",
    "time_period_ohe", "avg_speed_time_period",
    "tmin", "prcp", "DOLocationID", "PULocationID")
  val labelCol = "is_congested"

  def trainPredict(df: DataFrame, sampleFraction: Double = 0.3): (PipelineModel, DataFrame) =
    RandomForestPipeline.trainPredict(df, featureCols, labelCol, sampleFraction)
}

/** The is_delayed classifier (pipeline 4, nyc_taxi_final.py:971-1282).
  * Defines its own sample explicitly — the reference accidentally reuses
  * pipeline 3's `sampled_df` (quirk §2.11.1), fixed here. */
object DelayModel {
  /** nyc_taxi_final.py:1059-1065. */
  val featureCols: Seq[String] = Seq(
    "trip_distance", "extra", "tolls_amount", "congestion_surcharge",
    "hour", "minute", "day_of_week", "day_of_month", "month", "is_holiday",
    "time_period_ohe", "avg_speed_time_period",
    "tmin", "prcp", "DOLocationID", "PULocationID", "is_congested")
  val labelCol = "is_delayed"

  /** Label per nyc_taxi_final.py:1053-1056 via TaxiFeatures.delayLabel
    * (multiplier 1.0 — the code, not the 10% markdown). */
  def withLabel(df: DataFrame, multiplier: Double = 1.0): DataFrame =
    graft.etl.TaxiFeatures.delayLabel(df, multiplier)

  def trainPredict(df: DataFrame, sampleFraction: Double = 0.3): (PipelineModel, DataFrame) =
    RandomForestPipeline.trainPredict(withLabel(df), featureCols, labelCol, sampleFraction)
}
