package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Mirrors the reference's scan surface (SURVEY §2.1 S4/S5:
  * /root/reference/nyc_taxi_final.py:318, 740) — parquet scans whose schema
  * comes from the footer. At 100 TB these would be partitioned-directory
  * scans; the API is identical, and filter/column pushdown into the
  * vectorized parquet reader is what matters (verified via .explain in the
  * test suite).
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4's vectorized
    * reader rejects outright. Read nanos as long (legacy conf) and convert
    * to a microsecond TimestampType with integer division (`DIV` — a plain
    * `/` would route through double and lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Deliberately session-level (advisor flagged it): the conf is consulted
    // lazily at scan planning/execution, so save-and-restore around this
    // builder would break the read at action time. The setting only changes
    // decoding of TIMESTAMP(NANOS) parquet columns — `events.ts` is the only
    // one in the corpus — and "nanos as long" is precisely the contract the
    // conversion below relies on, so it is inert for every other read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
}
