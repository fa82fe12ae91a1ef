package graft.etl

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.ml.{CongestionModel, FeatureEncoding, RandomForestPipeline}
import org.apache.spark.sql.functions._

/** The reference notebook's four pipelines run END-TO-END through the
  * library on generated fixtures (SURVEY §3): weather CSV → clean →
  * parquet; taxi parquet glob → features → weather join → encode →
  * partitioned sink; congestion model train/eval/importances/save/load.
  * One test per pipeline boundary, state handed through the filesystem
  * exactly as the reference does.
  */
class ReferenceWorkflowSpec extends SparkSpec {
  import spark.implicits._

  private val root = "target/test-tmp/refflow"
  private val weatherCsvDir = s"$root/weather_csv"
  private val weatherCleanDir = s"$root/weather_clean"
  private val taxiRawDir = s"$root/taxi_raw"
  private val finalDir = s"$root/final"
  private val modelDir = s"$root/model"

  private def genFixtures(): Unit = {
    // weather: daily rows Jan–Jun 2024 (+ out-of-window noise)
    Files.createDirectories(Paths.get(weatherCsvDir))
    val lines = (1 to 180).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1)
      s"$date,10.0,${d % 15}.5,20.0,${d % 4}.25,0,90,3.0,6.0,1013.0,200"
    } :+ "2023-06-01,9.0,1.0,19.0,0.0,0,90,3.0,6.0,1013.0,200"
    Files.write(Paths.get(weatherCsvDir, "w.csv"), lines.mkString("\n").getBytes)
    // taxi: 800 trips across the window, surcharge correlated with hour
    val trips = (0 until 800).map { i =>
      val day = i % 150 + 1
      val hour = i % 24
      val pickup = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1).atTime(hour, i % 60))
      val durMin = 5 + i % 40
      val dropoff = new java.sql.Timestamp(pickup.getTime + durMin * 60000L)
      val congested = hour >= 7 && hour <= 10 && i % 3 != 0
      (pickup, dropoff, 1.0 + i % 12, if (congested) 2.5 else 0.0,
        i % 30, i % 40, 0.5 + i % 3, if (i % 11 == 0) 6.0 else 0.0)
    }
    trips.toDF("tpep_pickup_datetime", "tpep_dropoff_datetime", "trip_distance",
        "congestion_surcharge", "PULocationID", "DOLocationID", "extra", "tolls_amount")
      .write.mode("overwrite").parquet(taxiRawDir)
  }

  test("pipeline 1: weather CSV → clean → parquet") {
    genFixtures()
    val cleaned = WeatherClean.clean(WeatherClean.readWeather(spark, weatherCsvDir), yr = 2024)
    WeatherClean.write(cleaned, weatherCleanDir)
    val back = WeatherClean.readCleaned(spark, weatherCleanDir)
    assert(back.count() == 180) // 2023 row filtered out
    assert(back.schema("tmin").dataType.typeName == "double")
  }

  test("pipeline 2: taxi glob → features → weather join → encode → partitioned parquet") {
    val taxi = TaxiFeatures.readTaxi(spark, s"$taxiRawDir/*.parquet")
    val weather = WeatherClean.readCleaned(spark, weatherCleanDir)
    val features = TaxiFeatures.featurePipeline(taxi, weather)
    val encoded = FeatureEncoding.encode(features, Seq("time_period"))
    encoded.repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(finalDir)
    val back = spark.read.parquet(finalDir)
    assert(back.count() > 500)
    assert(back.columns.contains("time_period_ohe"))
    assert(back.filter($"tmin".isNull || $"prcp".isNull).count() == 0) // weather fill
    assert(back.select(countDistinct($"month")).as[Long].head() >= 5)  // partitioned
  }

  test("pipeline 3: congestion model trains on the final dataset, beats chance, round-trips") {
    val data = spark.read.parquet(finalDir)
    val (model, predictions) = CongestionModel.trainPredict(data, sampleFraction = 1.0)
    val preds = predictions.cache()
    val metrics = RandomForestPipeline.evaluate(preds, "is_congested")
    assert(metrics("roc_auc") > 0.5, s"AUC ${metrics("roc_auc")}")
    val imps = RandomForestPipeline.featureImportances(model, preds)
    assert(math.abs(imps.map(_._2).sum - 1.0) < 1e-6)
    RandomForestPipeline.save(model, modelDir)
    val reloaded = RandomForestPipeline.load(modelDir)
    assert(reloaded.stages.length == model.stages.length)
  }
}
