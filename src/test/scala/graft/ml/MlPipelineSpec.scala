package graft.ml

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1-M9 coverage on a deterministic synthetic frame with the reference's
  * taxi feature schema (SURVEY §5 test plan item 4).
  */
class MlPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** ~600 rows, label learnably correlated with distance/hour. */
  private lazy val taxiFeatures: DataFrame = {
    val rows = (0 until 600).map { i =>
      val hour = i % 24
      val congested = if (hour >= 7 && hour <= 10 && i % 4 != 0) 1 else 0
      val dist = 1.0 + (i % 10) + (if (congested == 1) 0.0 else 3.0)
      (dist, 0.5, 1.0 + i % 3, hour, i % 60, i % 7 + 1, i % 28 + 1, i % 6 + 1,
        if (i % 7 >= 5) 1 else 0,
        Seq("morning", "afternoon", "evening", "night")(hour / 6),
        8.0 + i % 5, 4.0 + i % 3, 0.1 * (i % 4), i % 40, i % 50,
        congested, 10.0 + i % 20)
    }
    rows.toDF("trip_distance", "tolls_amount", "extra", "hour", "minute",
      "day_of_week", "day_of_month", "month", "is_holiday", "time_period",
      "avg_speed_time_period", "tmin", "prcp", "DOLocationID", "PULocationID",
      "is_congested", "duration_min")
  }

  private lazy val encoded = FeatureEncoding.encode(taxiFeatures, Seq("time_period")).cache()

  test("M1 StringIndexer: frequencyDesc order, keep bucket for unseen labels") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(3)("a") ++ Seq.fill(1)("c")).toDF("cat")
    val (indexed, models) = FeatureEncoding.indexCategoricals(df, Seq("cat"))
    assert(models.head.labels.toSeq == Seq("b", "a", "c"))
    val m = indexed.groupBy($"cat").agg(first($"cat_idx")).as[(String, Double)].collect().toMap
    assert(m == Map("b" -> 0.0, "a" -> 1.0, "c" -> 2.0))
    // handleInvalid=keep: unseen label maps to numLabels
    val unseen = models.head.transform(Seq("zzz").toDF("cat"))
      .select($"cat_idx").as[Double].head()
    assert(unseen == 3.0)
  }

  test("M2 OneHotEncoder dropLast=false: one slot per category, hot position == index") {
    val df = (Seq.fill(4)("x") ++ Seq.fill(2)("y")).toDF("cat")
    val (indexed, _) = FeatureEncoding.indexCategoricals(df, Seq("cat"))
    val (enc, _) = FeatureEncoding.oneHotEncode(indexed, Seq("cat"))
    val rows = enc.select($"cat_idx", $"cat_ohe").as[(Double, Vector)].collect()
    rows.foreach { case (idx, vec) =>
      assert(vec.toArray.count(_ == 1.0) == 1)
      assert(vec(idx.toInt) == 1.0)
    }
  }

  test("encode drops the raw and index columns and appends *_ohe") {
    assert(!encoded.columns.contains("time_period"))
    assert(!encoded.columns.contains("time_period_idx"))
    assert(encoded.columns.contains("time_period_ohe"))
  }

  test("M3-M6+M8/M9: congestion pipeline trains, predicts, and beats chance") {
    val (model, predictions) = CongestionModel.trainPredict(encoded, sampleFraction = 1.0)
    val preds = predictions.cache()
    assert(preds.count() > 0)
    assert(preds.columns.toSet.intersect(Set("rawPrediction", "probability", "prediction")).size == 3)
    val metrics = RandomForestPipeline.evaluate(preds, "is_congested")
    assert(metrics.keySet == Set("roc_auc", "accuracy", "weighted_precision", "weighted_recall", "f1"))
    assert(metrics("roc_auc") > 0.5, s"AUC ${metrics("roc_auc")} not above chance")
    assert(metrics("accuracy") > 0.5)
  }

  test("M7: featureImportances expand OHE slots, sum to ~1, sorted descending") {
    val (model, predictions) = CongestionModel.trainPredict(encoded, sampleFraction = 1.0)
    val imps = RandomForestPipeline.featureImportances(model, predictions)
    // 14 scalar features + 4 OHE category slots + the handleInvalid=keep
    // __unknown slot (StringIndexer keep + OneHotEncoder dropLast=false
    // yields numLabels+1 vector positions)
    assert(imps.size == 19, s"expected 19 slots, got ${imps.size}: ${imps.map(_._1)}")
    assert(imps.exists(_._1 == "time_period_ohe___unknown"))
    assert(math.abs(imps.map(_._2).sum - 1.0) < 1e-6)
    assert(imps.map(-_._2) == imps.map(-_._2).sorted)
    assert(imps.exists(_._1.startsWith("time_period_ohe")))
  }

  test("GBT twin: same split as RF, beats chance, importances normalized") {
    val (model, predictions) = GbtPipeline.trainPredict(encoded,
      CongestionModel.featureCols, "is_congested", sampleFraction = 1.0)
    val preds = predictions.cache()
    assert(preds.count() > 0)
    val metrics = RandomForestPipeline.evaluate(preds, "is_congested")
    assert(metrics("roc_auc") > 0.8, s"GBT AUC ${metrics("roc_auc")} below floor")
    // identical seeds → identical held-out rows as the RF run: metric
    // deltas between the families are model deltas, not split luck
    val (_, rfPreds) = CongestionModel.trainPredict(encoded, sampleFraction = 1.0)
    val gbtRows = preds.select($"trip_distance", $"hour", $"minute").collect().toSet
    val rfRows = rfPreds.select($"trip_distance", $"hour", $"minute").collect().toSet
    assert(gbtRows == rfRows, "GBT and RF held-out sets diverge despite shared seeds")
    val imps = RandomForestPipeline.featureImportances(model, preds)
    assert(math.abs(imps.map(_._2).sum - 1.0) < 1e-6)
    assert(imps.map(-_._2) == imps.map(-_._2).sorted)
    preds.unpersist()
  }

  test("S8: model save/load round-trip preserves predictions") {
    val (model, predictions) = CongestionModel.trainPredict(encoded, sampleFraction = 1.0)
    val path = "target/test-tmp/congestion_model"
    RandomForestPipeline.save(model, path)
    val reloaded = RandomForestPipeline.load(path)
    val a = predictions.select($"prediction").as[Double].collect().toSeq
    val b = reloaded.transform(
      predictions.drop("features", "rawPrediction", "probability", "prediction"))
      .select($"prediction").as[Double].collect().toSeq
    assert(a == b)
  }

  test("DelayModel: explicit label (quirk §2.11.1 fixed), trains end-to-end") {
    val withDur = encoded
      .withColumn("congestion_surcharge", when($"is_congested" === 1, 2.5).otherwise(0.0))
      .withColumn("expected_duration", $"duration_min" * (lit(0.8) + (col("hour") % 3) * 0.2))
    val labeled = DelayModel.withLabel(withDur)
    assert(labeled.filter(!$"is_delayed".isin(0, 1)).count() == 0)
    assert(labeled.filter($"is_delayed" === 1).count() > 0)
    val (model, preds) = DelayModel.trainPredict(withDur, sampleFraction = 1.0)
    val metrics = RandomForestPipeline.evaluate(preds, "is_delayed")
    assert(metrics("roc_auc") > 0.5)
  }
}
