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
  /** Loads `events` and normalizes `ts` to ONE documented contract:
    * `TimestampType` at microsecond precision, UTC instants (every graft
    * session pins `spark.sql.session.timeZone=UTC`, so wall-clock values in
    * the files are preserved verbatim). All eight events consumers
    * (ops/Analytics, LlmData, Relational, Ml, Funcs, AsOf, Etl,
    * streaming/StreamSessionize) rely on this seam and never cast `ts`
    * themselves.
    *
    * The physical encoding of `ts` in the source parquet has drifted across
    * testdata regenerations (TIMESTAMP(NANOS) ↔ INT64 TIMESTAMP(MICROS)
    * NTZ), so the read is schema-adaptive rather than hard-coded to one
    * encoding — the same robustness the reference buys with explicit read
    * schemas (nyc_taxi_final.py:306-315):
    *   - TIMESTAMP(NANOS): Spark 4's reader rejects it outright; retry with
    *     `spark.sql.legacy.parquet.nanosAsLong` (set only on this path, so
    *     the session conf is untouched for MICROS data) and convert with
    *     integer division (`DIV` — a plain `/` would route through double
    *     and lose precision above 2^53 ns).
    *   - TIMESTAMP_NTZ (micros, no zone): cast to TimestampType; with the
    *     session at UTC this reinterprets the wall clock as a UTC instant,
    *     bit-identical to the NANOS-era values.
    *   - TimestampType: already the contract, pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$dir/events.parquet"
    val raw =
      try spark.read.parquet(path)
      catch {
        // TIMESTAMP(NANOS) footer: schema conversion fails at load time
        // unless nanos decode as long. The conf only changes decoding of
        // NANOS columns, so setting it here (after a NANOS file is proven
        // present) is inert for every other read in the session.
        case e: Exception if {
          val m = Option(e.getMessage).getOrElse("")
          m.contains("NANOS") || m.contains("nanosAsLong")
        } =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    raw.schema("ts").dataType match {
      case LongType           => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType   => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected NANOS-as-long, TIMESTAMP_NTZ or TIMESTAMP)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
}
