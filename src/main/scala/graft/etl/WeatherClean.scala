package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weather-preprocessing pipeline parity (SURVEY §3.1;
  * /root/reference/nyc_taxi_final.py:113-234): CSV with explicit schema →
  * select/round/filter → audit aggregates → parquet sink.
  *
  * All functions are pure `DataFrame => DataFrame` so each step is
  * independently testable; the audit queries are the reference's inline
  * validation (nyc_taxi_final.py:206-223) expressed as result DataFrames
  * instead of `show()` side effects.
  *
  * Scale notes: the CSV scan carries the explicit schema (no inference
  * pass over 100 TB of text), `clean` is a narrow project+filter fused into
  * the scan by codegen, and `repartitionByDate` mirrors the reference's
  * write-locality repartition (a single hash shuffle, X4).
  */
object WeatherClean {

  /** 11-column Meteostat daily schema (nyc_taxi_final.py:167-179). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = true),
    StructField("tavg", FloatType, nullable = true),
    StructField("tmin", FloatType, nullable = true),
    StructField("tmax", FloatType, nullable = true),
    StructField("prcp", FloatType, nullable = true),
    StructField("snow", IntegerType, nullable = true),
    StructField("wdir", IntegerType, nullable = true),
    StructField("wspd", FloatType, nullable = true),
    StructField("wpgt", FloatType, nullable = true),
    StructField("pres", FloatType, nullable = true),
    StructField("tsun", IntegerType, nullable = true)))

  /** S3: headerless positional CSV scan with explicit schema + X4 repartition
    * (nyc_taxi_final.py:187). */
  def readWeather(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(weatherSchema).csv(path).repartition(col("date"))

  /** P1+P2: project date/tmin/prcp with round(2), filter a Jan–Jun year
    * window (nyc_taxi_final.py:194-199). Year is a parameter — the
    * reference pins 2024; the test corpus uses TPC-H years. The filter is a
    * raw date-range predicate so parquet/CSV scans can prune on the column
    * rather than evaluating year()/month() per row.
    */
  def clean(df: DataFrame, yr: Int = 2024): DataFrame =
    df.select(
        col("date"),
        round(col("tmin"), 2).as("tmin"),
        round(col("prcp"), 2).as("prcp"))
      .filter(col("date").between(
        lit(f"$yr%04d-01-01").cast("date"), lit(f"$yr%04d-06-30").cast("date")))

  /** A1: date-range validation aggregate (nyc_taxi_final.py:206-210). */
  def dateStats(df: DataFrame): DataFrame =
    df.agg(min("date").as("min_date"), max("date").as("max_date"),
      count("date").as("record_count"))

  /** A2: per-column null counts (nyc_taxi_final.py:214-216). */
  def nullCounts(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c => sum(col(c).isNull.cast("int")).as(c)): _*)

  /** A3: negative-precipitation audit (nyc_taxi_final.py:220-222). */
  def invalidValues(df: DataFrame): DataFrame =
    df.select(sum((col("prcp") < 0).cast("int")).as("negative_prcp"))

  /** S6: overwrite parquet sink (nyc_taxi_final.py:231). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Cleaned-weather read-back schema for the taxi join
    * (nyc_taxi_final.py:553-560): float storage upcast to double. */
  val cleanedSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = true),
    StructField("tmin", FloatType, nullable = true),
    StructField("prcp", FloatType, nullable = true)))

  def readCleaned(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(cleanedSchema).parquet(path)
      .withColumn("tmin", col("tmin").cast("double"))
      .withColumn("prcp", col("prcp").cast("double"))
}
