package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Taxi feature-engineering pipeline parity (SURVEY §2.9/§3.2;
  * /root/reference/nyc_taxi_final.py:298-650) as composable pure
  * `DataFrame => DataFrame` steps. Column names default to the reference's
  * taxi schema; key names are parameters so the same semantics run over the
  * test corpus (see ops.Etl's events-based analog query).
  *
  * Semantics pinned to the reference CODE (not its markdown) per SURVEY
  * §2.11: delay multiplier defaults to 1.0 (not 1.1), the historical-speed
  * aggregate includes each trip itself, and the duration outlier filter runs
  * AFTER the aggregate so outliers contribute to the speed statistics.
  *
  * Scale notes (100 TB): every step is a narrow projection except
  * [[histAvgSpeed]] (one hash-agg shuffle + one join-back shuffle on the
  * grouping keys; the aggregated side is tiny — #groups, not #rows — so AQE
  * demotes the join to broadcast at runtime) and [[joinWeather]] (explicit
  * broadcast of the O(days) weather table). The global fallback speed is the
  * reference's deliberate O(1) driver scalar (nyc_taxi_final.py:491), kept a
  * scalar rather than a cross join.
  */
object TaxiFeatures {

  /** 8-column taxi read schema (nyc_taxi_final.py:306-315). */
  val taxiSchema: StructType = StructType(Seq(
    StructField("tpep_pickup_datetime", TimestampType, nullable = true),
    StructField("tpep_dropoff_datetime", TimestampType, nullable = true),
    StructField("trip_distance", DoubleType, nullable = true),
    StructField("congestion_surcharge", DoubleType, nullable = true),
    StructField("PULocationID", IntegerType, nullable = true),
    StructField("DOLocationID", IntegerType, nullable = true),
    StructField("extra", DoubleType, nullable = true),
    StructField("tolls_amount", DoubleType, nullable = true)))

  /** S4: parquet glob scan with explicit schema (nyc_taxi_final.py:318). */
  def readTaxi(spark: org.apache.spark.sql.SparkSession, glob: String): DataFrame =
    spark.read.schema(taxiSchema).parquet(glob)

  /** P3: drop rows null in any of the given columns (nyc_taxi_final.py:373). */
  def dropNulls(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop(subset)

  /** P4: conjunctive range/outlier filter (nyc_taxi_final.py:376-384). */
  def outlierFilter(df: DataFrame): DataFrame =
    df.filter(
      col("trip_distance") > 0.5 && col("trip_distance") < 60.0 &&
      col("congestion_surcharge") >= 0 &&
      col("extra") >= 0 && col("extra") < 10.0 &&
      col("tolls_amount") >= 0 && col("tolls_amount") < 50.0)

  /** F9/F8 + is_holiday + date: time features off the pickup timestamp
    * (nyc_taxi_final.py:412-425). dayofweek is Spark's 1=Sunday..7=Saturday.
    */
  def timeFeatures(df: DataFrame, tsCol: String = "tpep_pickup_datetime"): DataFrame =
    df.withColumn("minute", minute(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))
      .withColumn("day_of_week", dayofweek(col(tsCol)))
      .withColumn("day_of_month", dayofmonth(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("is_holiday",
        when(col("day_of_week").isin(1, 7), lit(1)).otherwise(lit(0)))
      .withColumn("date", to_date(col(tsCol)))

  /** F3: 4-arm chained-CASE hour binning (nyc_taxi_final.py:428-434). */
  def timePeriod(df: DataFrame, hourCol: String = "hour"): DataFrame =
    df.withColumn("time_period",
      when(col(hourCol).between(6, 11), lit("morning"))
        .when(col(hourCol).between(12, 16), lit("afternoon"))
        .when(col(hourCol).between(17, 23), lit("evening"))
        .otherwise(lit("night")))

  /** F11: second-granularity duration in minutes, then P7-drop of the raw
    * timestamps (nyc_taxi_final.py:460-465). */
  def duration(df: DataFrame,
               pickup: String = "tpep_pickup_datetime",
               dropoff: String = "tpep_dropoff_datetime"): DataFrame =
    df.withColumn("duration_min",
        (unix_timestamp(col(dropoff)) - unix_timestamp(col(pickup))) / 60)
      .drop(pickup, dropoff)

  /** Per-trip speed with epsilon guard (nyc_taxi_final.py:468). */
  def speed(df: DataFrame, distCol: String = "trip_distance"): DataFrame =
    df.withColumn("speed_mph", col(distCol) / (col("duration_min") / 60 + lit(1e-6)))

  /** A4: the signature ratio-of-sums historical-speed aggregate
    * (nyc_taxi_final.py:471-481) — weighted mean, NOT mean-of-means. */
  def histSpeedAgg(df: DataFrame,
                   keys: Seq[String] = Seq("PULocationID", "DOLocationID", "time_period", "day_of_week"),
                   distCol: String = "trip_distance"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg((sum(col(distCol)) / (sum(col("duration_min")) + lit(1e-6)) * 60)
        .as("hist_avg_speed"))

  /** J1 + A5 + F6/P8: join the aggregate back on its keys (left), round,
    * null-fill from the global-average driver scalar, drop intermediates
    * (nyc_taxi_final.py:482-499).
    *
    * The aggregate is cached before its two consumers (the global-avg
    * action and the join) so the upstream scan+shuffle runs once (X3).
    */
  def withHistAvgSpeed(df: DataFrame,
                       keys: Seq[String] = Seq("PULocationID", "DOLocationID", "time_period", "day_of_week"),
                       distCol: String = "trip_distance"): DataFrame = {
    val hist = histSpeedAgg(df, keys, distCol).cache()
    val row = hist.agg(avg(col("hist_avg_speed"))).first()
    val globalSpeed = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    df.join(hist, keys, "left")
      .withColumn("avg_speed_time_period_hist", round(col("hist_avg_speed"), 2))
      .withColumn("avg_speed_time_period",
        when(col("avg_speed_time_period_hist").isNull, globalSpeed)
          .otherwise(col("avg_speed_time_period_hist")))
      .drop("avg_speed_time_period_hist", "hist_avg_speed", "speed_mph")
  }

  /** P5: duration outlier filter, deliberately AFTER the aggregate
    * (nyc_taxi_final.py:502-505; quirk §2.11.4 preserved). */
  def durationFilter(df: DataFrame, lo: Double = 2, hi: Double = 180): DataFrame =
    df.filter(col("duration_min") > lo && col("duration_min") < hi)

  /** expected_duration off the historical speed (nyc_taxi_final.py:526). */
  def expectedDuration(df: DataFrame, distCol: String = "trip_distance"): DataFrame =
    df.withColumn("expected_duration",
      round(col(distCol) / (col("avg_speed_time_period") + lit(1e-6)) * 60, 2))

  /** F2: is_congested = surcharge > 0 (nyc_taxi_final.py:530-533). */
  def congestionLabel(df: DataFrame, surchargeCol: String = "congestion_surcharge"): DataFrame =
    df.withColumn("is_congested",
      when(col(surchargeCol) > 0, lit(1)).otherwise(lit(0)))

  /** is_delayed = duration > expected × multiplier (nyc_taxi_final.py:1053-1056).
    * The reference's markdown says 1.1, its code says 1 — code wins, the
    * multiplier is a parameter (quirk §2.11.2). */
  def delayLabel(df: DataFrame, multiplier: Double = 1.0): DataFrame =
    df.withColumn("is_delayed",
      when(col("duration_min") > col("expected_duration") * multiplier, 1).otherwise(0))

  /** J2 + P8 + P7: broadcast-left-join daily weather on date, zero-fill the
    * missing days, drop the key (nyc_taxi_final.py:563-564). */
  def joinWeather(df: DataFrame, weather: DataFrame): DataFrame =
    df.join(broadcast(weather), Seq("date"), "left")
      .na.fill(Map("tmin" -> 0.0, "prcp" -> 0.0))
      .drop("date")

  /** P6: the reference's 19-column final selection (nyc_taxi_final.py:607-614);
    * `withOhe=false` before encoding has run. */
  def finalSelect(df: DataFrame, withOhe: Boolean = true): DataFrame = {
    val cols = Seq("month", "day_of_month", "hour", "minute", "day_of_week", "is_holiday") ++
      (if (withOhe) Seq("time_period_ohe") else Seq("time_period")) ++
      Seq("trip_distance", "congestion_surcharge", "extra", "tolls_amount",
        "expected_duration", "avg_speed_time_period", "tmin", "prcp",
        "PULocationID", "DOLocationID", "is_congested", "duration_min")
    df.select(cols.map(col): _*)
  }

  /** The full preprocessing composition in reference order
    * (nyc_taxi_final.py:373-614), pre-encoding. */
  def featurePipeline(taxi: DataFrame, weather: DataFrame): DataFrame = {
    val cleaned = outlierFilter(dropNulls(taxi, taxiSchema.fieldNames.toSeq))
    val timed = timePeriod(timeFeatures(cleaned))
    val durated = speed(duration(timed))
    val withHist = durationFilter(withHistAvgSpeed(durated))
    val labeled = congestionLabel(expectedDuration(withHist))
    finalSelect(joinWeather(labeled, weather), withOhe = false)
  }
}
