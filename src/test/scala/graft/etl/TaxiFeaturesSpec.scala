package graft.etl

import java.sql.{Date, Timestamp}
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture tests pinning the reference's derived-feature semantics
  * (SURVEY §2.9, quirks §2.11) on tiny in-memory frames with the real taxi
  * schema.
  */
class TaxiFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** A valid row template; override fields per test. */
  private def row(pickup: String, dropoff: String, dist: Double = 2.0,
                  surcharge: Double = 0.0, pu: Int = 1, dou: Int = 2,
                  extra: Double = 0.5, tolls: Double = 0.0) =
    (ts(pickup), ts(dropoff), dist, surcharge, pu, dou, extra, tolls)

  private def taxiDf(rows: Seq[(Timestamp, Timestamp, Double, Double, Int, Int, Double, Double)]): DataFrame =
    rows.toDF("tpep_pickup_datetime", "tpep_dropoff_datetime", "trip_distance",
      "congestion_surcharge", "PULocationID", "DOLocationID", "extra", "tolls_amount")

  test("readTaxi: explicit 8-column schema over a parquet glob (S4)") {
    val fixtureDir = "target/test-tmp/taxi_parquet"
    val df = taxiDf(Seq(
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00"),
      row("2024-03-05 11:00:00", "2024-03-05 11:30:00")))
    df.write.mode("overwrite").parquet(fixtureDir)
    val back = TaxiFeatures.readTaxi(spark, s"$fixtureDir/*.parquet")
    assert(back.schema == TaxiFeatures.taxiSchema)
    assert(back.count() == 2)
  }

  test("timePeriod partitions all 24 hours into the reference's 4 bins") {
    val df = (0 until 24).map(h => (h, f"2024-03-04 $h%02d:30:00"))
      .toDF("h", "s").withColumn("t", to_timestamp($"s")).withColumn("hour", hour($"t"))
    val out = TaxiFeatures.timePeriod(df).select($"h", $"time_period").as[(Int, String)].collect().toMap
    (0 to 5).foreach(h => assert(out(h) == "night"))
    (6 to 11).foreach(h => assert(out(h) == "morning"))
    (12 to 16).foreach(h => assert(out(h) == "afternoon"))
    (17 to 23).foreach(h => assert(out(h) == "evening"))
  }

  test("timeFeatures: is_holiday marks exactly Sat/Sun; dayofweek is 1=Sunday") {
    // 2024-03-03 is a Sunday, 2024-03-09 a Saturday, 2024-03-05 a Tuesday.
    val df = taxiDf(Seq(
      row("2024-03-03 10:00:00", "2024-03-03 10:20:00"),
      row("2024-03-09 10:00:00", "2024-03-09 10:20:00"),
      row("2024-03-05 10:00:00", "2024-03-05 10:20:00")))
    val out = TaxiFeatures.timeFeatures(df)
      .select($"day_of_week", $"is_holiday").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 1), (7, 1), (3, 0)))
  }

  test("duration is second-granularity minutes and drops the timestamps") {
    val df = taxiDf(Seq(row("2024-03-04 10:00:00", "2024-03-04 10:12:30")))
    val out = TaxiFeatures.duration(df)
    assert(out.select($"duration_min").as[Double].head() == 12.5)
    assert(!out.columns.contains("tpep_pickup_datetime"))
    assert(!out.columns.contains("tpep_dropoff_datetime"))
  }

  test("histSpeedAgg is the weighted ratio-of-sums, not mean-of-means") {
    // Two trips in one group: (10 mi, 30 min) and (1 mi, 30 min).
    // Ratio-of-sums: (10+1)/(60+1e-6)*60 ≈ 11 mph.
    // Mean-of-means would give (20 + 2)/2 = 11 too — so use asymmetric
    // durations: (10 mi, 10 min) → 60 mph, (1 mi, 50 min) → 1.2 mph;
    // weighted = 11/(60+1e-6)*60 ≈ 11 mph, mean-of-means = 30.6.
    val df = taxiDf(Seq(
      row("2024-03-04 10:00:00", "2024-03-04 10:10:00", dist = 10.0),
      row("2024-03-04 11:00:00", "2024-03-04 11:50:00", dist = 1.0)))
    val feat = TaxiFeatures.duration(TaxiFeatures.timePeriod(TaxiFeatures.timeFeatures(df)))
    val speed = TaxiFeatures.histSpeedAgg(feat, keys = Seq("PULocationID", "DOLocationID"))
      .select($"hist_avg_speed").as[Double].head()
    assert(math.abs(speed - 11.0) < 1e-4)
  }

  test("withHistAvgSpeed preserves row count and leaves no null speeds") {
    val df = taxiDf((0 until 20).map(i =>
      row(f"2024-03-0${i % 5 + 1}%d 10:00:00", f"2024-03-0${i % 5 + 1}%d 10:30:00",
        dist = 1.0 + i, pu = i % 3)))
    val feat = TaxiFeatures.speed(TaxiFeatures.duration(
      TaxiFeatures.timePeriod(TaxiFeatures.timeFeatures(df))))
    val out = TaxiFeatures.withHistAvgSpeed(feat)
    assert(out.count() == 20)
    assert(out.filter($"avg_speed_time_period".isNull).count() == 0)
    assert(!out.columns.contains("hist_avg_speed"))
    assert(!out.columns.contains("speed_mph"))
  }

  test("duration outlier filter runs AFTER the aggregate (quirk §2.11.4): outliers shape the speed") {
    // One group: a normal trip (4 mi / 20 min) plus a 300-minute outlier
    // (4 mi / 300 min). Aggregate-then-filter keeps the outlier's drag:
    // speed = 8/(320+1e-6)*60 = 1.5 mph, not 12 mph.
    val df = taxiDf(Seq(
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", dist = 4.0),
      row("2024-03-04 11:00:00", "2024-03-04 16:00:00", dist = 4.0)))
    val feat = TaxiFeatures.speed(TaxiFeatures.duration(
      TaxiFeatures.timePeriod(TaxiFeatures.timeFeatures(df))))
    val out = TaxiFeatures.durationFilter(TaxiFeatures.withHistAvgSpeed(feat))
    assert(out.count() == 1) // the 300-min trip itself is filtered out…
    val speed = out.select($"avg_speed_time_period").as[Double].head()
    assert(math.abs(speed - 1.5) < 0.01) // …but it dragged the average down
  }

  test("outlierFilter enforces the reference bounds (code, not markdown: surcharge >= 0 kept)") {
    val df = taxiDf(Seq(
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00"),                    // valid
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", dist = 0.4),        // too short
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", dist = 61.0),       // too long
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", surcharge = -1.0),  // negative surcharge
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", surcharge = 0.0),   // zero surcharge KEPT
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", extra = 10.0),      // extra out of range
      row("2024-03-04 10:00:00", "2024-03-04 10:20:00", tolls = 50.0)))     // tolls out of range
    assert(TaxiFeatures.outlierFilter(df).count() == 2)
  }

  test("dropNulls drops rows null in any subset column") {
    val df = Seq(
      (Some(1.0), Some(2.0)),
      (None, Some(2.0)),
      (Some(1.0), None)).toDF("a", "b")
    assert(TaxiFeatures.dropNulls(df, Seq("a", "b")).count() == 1)
    assert(TaxiFeatures.dropNulls(df, Seq("a")).count() == 2)
  }

  test("delayLabel uses the code's multiplier 1.0, parameterized (quirk §2.11.2)") {
    val df = Seq((10.0, 9.0), (10.0, 10.0), (10.0, 11.0)).toDF("duration_min", "expected_duration")
    assert(TaxiFeatures.delayLabel(df).select($"is_delayed").as[Int].collect().toSeq == Seq(1, 0, 0))
    // with the markdown's 1.1 the middle row flips nothing, first stays 1 only if 10 > 9*1.1=9.9
    assert(TaxiFeatures.delayLabel(df, 1.1).select($"is_delayed").as[Int].collect().toSeq == Seq(1, 0, 0))
    assert(TaxiFeatures.delayLabel(df, 0.8).select($"is_delayed").as[Int].collect().toSeq == Seq(1, 1, 1))
  }

  test("joinWeather broadcast-left-joins on date, zero-fills missing days, drops date") {
    val df = Seq((Date.valueOf("2024-03-04"), 1), (Date.valueOf("2024-03-05"), 2)).toDF("date", "id")
    val weather = Seq((Date.valueOf("2024-03-04"), 5.5, 0.2)).toDF("date", "tmin", "prcp")
    val out = TaxiFeatures.joinWeather(df, weather).orderBy($"id")
    assert(!out.columns.contains("date"))
    assert(out.select($"tmin", $"prcp").as[(Double, Double)].collect().toSeq ==
      Seq((5.5, 0.2), (0.0, 0.0)))
  }

  test("featurePipeline emits the reference's final schema (time_period pre-OHE) and sane labels") {
    val rows = (0 until 40).map { i =>
      row(f"2024-03-${i % 9 + 1}%02d ${i % 24}%02d:00:00",
        f"2024-03-${i % 9 + 1}%02d ${i % 24}%02d:${20 + i % 30}%02d:00",
        dist = 1.0 + i % 7, surcharge = if (i % 3 == 0) 2.5 else 0.0,
        pu = i % 4, dou = i % 5)
    }
    val weather = (1 to 9).map(d => (Date.valueOf(f"2024-03-0$d%d"), 4.0, 0.1))
      .toDF("date", "tmin", "prcp")
    val out = TaxiFeatures.featurePipeline(taxiDf(rows), weather)
    val expected = Seq("month", "day_of_month", "hour", "minute", "day_of_week",
      "is_holiday", "time_period", "trip_distance", "congestion_surcharge", "extra",
      "tolls_amount", "expected_duration", "avg_speed_time_period", "tmin", "prcp",
      "PULocationID", "DOLocationID", "is_congested", "duration_min")
    assert(out.columns.toSeq == expected)
    assert(out.count() > 0)
    assert(out.filter($"is_congested" === 1).count() > 0)
    assert(out.filter(!$"is_congested".isin(0, 1)).count() == 0)
  }
}
