package graft.ml

import graft.SparkSpec
import graft.ops.Etl

/** Hyperparameter-selection machinery (ml.ModelSelection): winner
  * selection, grid/metric alignment, and CV fold math on the sf0.001
  * congestion frame. */
class ModelSelectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val frame = FeatureEncoding
    .encode(Etl.etlFeatures(spark, sf), Seq("time_period"))
    .cache()
  private val cols = Seq("trip_distance", "hour", "minute", "day_of_week",
    "day_of_month", "month", "is_holiday", "time_period_ohe",
    "avg_speed_time_period", "expected_duration")

  test("TrainValidationSplit: one metric per grid point, best model carries the winning params") {
    val tvs = ModelSelection.trainValidationSelect(frame.repartition(4), cols,
      CongestionModel.labelCol)
    val grid = tvs.getEstimatorParamMaps
    assert(grid.length == 2)
    assert(tvs.validationMetrics.length == grid.length)
    assert(tvs.validationMetrics.forall(m => m >= 0.0 && m <= 1.0))
    val bestIdx = tvs.validationMetrics.indices.maxBy(tvs.validationMetrics)
    val bestTrees = grid(bestIdx).toSeq
      .find(_.param.name == "numTrees").get.value.asInstanceOf[Int]
    val fitted = tvs.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]
    assert(fitted.getNumTrees == bestTrees,
      s"best model has ${fitted.getNumTrees} trees, metrics chose $bestTrees")

    val rep = ModelSelection.report(spark, grid, tvs.validationMetrics)
    assert(rep.count() == grid.length)
    assert(rep.filter("is_best").count() == 1)
    val bestRow = rep.filter("is_best").collect()(0)
    assert(bestRow.getAs[String]("params").contains(s"numTrees=$bestTrees"))
    assert(bestRow.getAs[Double]("val_auc") == tvs.validationMetrics.max)
  }

  test("CrossValidator: avgMetrics align with the grid and the winner is the argmax") {
    val cv = ModelSelection.crossValidateSelect(frame.repartition(4), cols,
      CongestionModel.labelCol, folds = 2)
    assert(cv.avgMetrics.length == cv.getEstimatorParamMaps.length)
    assert(cv.avgMetrics.forall(m => m >= 0.0 && m <= 1.0))
    val bestIdx = cv.avgMetrics.indices.maxBy(cv.avgMetrics)
    val bestTrees = cv.getEstimatorParamMaps(bestIdx).toSeq
      .find(_.param.name == "numTrees").get.value.asInstanceOf[Int]
    val fitted = cv.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]
    assert(fitted.getNumTrees == bestTrees)
  }
}
