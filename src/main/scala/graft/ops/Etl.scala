package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}
import graft.etl.{TaxiFeatures, WeatherClean}

/** Verified queries exercising the ETL-parity modules (etl.TaxiFeatures /
  * etl.WeatherClean) over the driver's test corpus: the full
  * feature-engineering composition (SURVEY §3.2), the CSV→clean→parquet
  * weather pipeline (§3.1, S3), the partitioned parquet sink (S7/X4), and
  * the sample/split determinism surface (X1/X2).
  *
  * Where the reference sums raw doubles (hist_avg_speed,
  * nyc_taxi_final.py:471-481), the ORACLED analogs sum integer cents /
  * integer minutes instead so the grouped quotients are bit-identical to
  * DuckDB under any partitioning; the reference-exact double-sum versions in
  * etl.TaxiFeatures are fixture-tested in scalatest where tiny inputs make
  * double summation deterministic.
  */
object Etl {

  /** Repo-local scratch root for sink/CSV round-trip fixtures (the driver
    * runs Verify/Bench from arbitrary cwd, so the path is absolute). */
  private val fixtureRoot = "/root/repo/target/qfixtures"

  private def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Build-once-per-JVM input fixtures (same contract as
    * streaming.StreamSessionize.inputOnce): for queries whose INPUT is a
    * derived file-format fixture (the taxi parquet glob, the weather CSV),
    * re-writing it on every invocation charges fixture I/O to the operator
    * under measurement — bench iterations 2+ and repeated verify calls
    * should only READ. The fixture for a given (key, sf dir) is a pure
    * function of the corpus, hence immutable within a process. NOT used
    * where the write IS the operator under test (parquetSink, compaction). */
  private val builtFixtures = scala.collection.concurrent.TrieMap[String, String]()
  private def fixtureOnce(key: String, dir: String)(build: String => Unit): String =
    builtFixtures.getOrElseUpdate(s"$key|$dir", {
      val path = s"$fixtureRoot/${key}_${tag(dir)}"
      build(path)
      path
    })

  /** Escape hatch for harnesses that rewrite a corpus dir in-place within
    * one JVM (r7 advice): the memo assumes a corpus is immutable per
    * process, so a regenerated dir would otherwise keep serving fixtures
    * built from the old data. Normal Verify/Bench runs never need this. */
  private[graft] def clearFixtureCache(): Unit = builtFixtures.clear()

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  // -------------------------------------------------------- taxi-analog ETL

  /** The taxi feature pipeline (SURVEY §2.9) run over `events`:
    * pickup = ts, dropoff = ts + props.k minutes (so duration_min == k
    * exactly), trip_distance = value, congestion analog = value - 200.
    * Composes the etl.TaxiFeatures steps in reference order: na.drop →
    * range filter → time features → time_period → duration via
    * unix_timestamp diff → ratio-of-sums hist aggregate per
    * (event_type, time_period, day_of_week) → left join-back + round +
    * global fill → duration outlier filter AFTER the aggregate →
    * expected_duration → labels → final select.
    */
  def etlFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val allCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = TaxiFeatures.dropNulls(Tables.events(spark, dir), allCols)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .na.drop(Seq("k"))
      .filter($"value" > 0.5 && $"value" < 400)
      .withColumn("tpep_pickup_datetime", $"ts")
      .withColumn("tpep_dropoff_datetime", expr("ts + make_interval(0, 0, 0, 0, 0, k, 0)"))
    val timed = TaxiFeatures.timePeriod(TaxiFeatures.timeFeatures(base, "ts"))
    val durated = TaxiFeatures.duration(timed)
    // Exact-math variant of TaxiFeatures.histSpeedAgg + withHistAvgSpeed:
    // value summed as cents (long), duration as exact integer minutes, so
    // the quotient is the same double in Spark and DuckDB.
    val keys = Seq("event_type", "time_period", "day_of_week")
    val hist = durated
      .groupBy(keys.map(col): _*)
      .agg((sum(cents($"value")) / lit(100.0) / (sum($"k") + lit(1e-6)) * 60)
        .as("hist_avg_speed"))
      .cache()
    val row = hist.agg(avg($"hist_avg_speed")).first()
    val globalSpeed = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val withHist = durated.join(hist, keys, "left")
      .withColumn("avg_speed_time_period",
        when(round($"hist_avg_speed", 2).isNull, globalSpeed)
          .otherwise(round($"hist_avg_speed", 2)))
      .drop("hist_avg_speed")
    val filtered = TaxiFeatures.durationFilter(withHist)
    val labeled = TaxiFeatures.delayLabel(
      TaxiFeatures.congestionLabel(
        TaxiFeatures.expectedDuration(filtered, distCol = "value")
          .withColumn("congestion_surcharge", $"value" - lit(200.0))))
    labeled.select($"event_id", $"month", $"day_of_month", $"hour", $"minute",
      $"day_of_week", $"is_holiday", $"time_period", $"value".as("trip_distance"),
      $"duration_min", $"avg_speed_time_period", $"expected_duration",
      $"is_congested", $"is_delayed")
  }

  private val etlFeaturesSql =
    """WITH base AS (
      |  SELECT event_id, ts, event_type, value,
      |         CAST(props->>'k' AS INTEGER) AS k
      |  FROM events
      |  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
      |    AND CAST(props->>'k' AS INTEGER) IS NOT NULL
      |    AND value > 0.5 AND value < 400
      |), feat AS (
      |  SELECT event_id, event_type, value, k,
      |    minute(ts) AS minute, hour(ts) AS hour,
      |    dayofweek(ts) + 1 AS day_of_week, day(ts) AS day_of_month,
      |    month(ts) AS month,
      |    CASE WHEN dayofweek(ts) + 1 IN (1, 7) THEN 1 ELSE 0 END AS is_holiday,
      |    CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
      |         WHEN hour(ts) BETWEEN 12 AND 16 THEN 'afternoon'
      |         WHEN hour(ts) BETWEEN 17 AND 23 THEN 'evening'
      |         ELSE 'night' END AS time_period,
      |    CAST(k AS DOUBLE) AS duration_min
      |  FROM base
      |), hist AS (
      |  SELECT event_type, time_period, day_of_week,
      |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0
      |      / (SUM(k) + 1e-6) * 60 AS hist_avg_speed
      |  FROM feat GROUP BY 1, 2, 3
      |)
      |SELECT f.event_id, f.month, f.day_of_month, f.hour, f.minute,
      |  f.day_of_week, f.is_holiday, f.time_period, f.value AS trip_distance,
      |  f.duration_min,
      |  round(h.hist_avg_speed, 2) AS avg_speed_time_period,
      |  round(f.value / (round(h.hist_avg_speed, 2) + 1e-6) * 60, 2) AS expected_duration,
      |  CASE WHEN f.value - 200.0 > 0 THEN 1 ELSE 0 END AS is_congested,
      |  CASE WHEN f.duration_min > round(f.value / (round(h.hist_avg_speed, 2) + 1e-6) * 60, 2) * 1.0
      |       THEN 1 ELSE 0 END AS is_delayed
      |FROM feat f
      |LEFT JOIN hist h ON f.event_type = h.event_type
      |  AND f.time_period = h.time_period AND f.day_of_week = h.day_of_week
      |WHERE f.duration_min > 2 AND f.duration_min < 180""".stripMargin

  // ------------------------------------------------------ weather CSV round-trip

  /** S3 + §3.1: derive a deterministic weather-shaped daily table from
    * `orders` (integer-valued measures — exact through the float schema and
    * the CSV text round-trip), write it as headerless CSV, re-read it with
    * WeatherClean's explicit 11-column schema (positional, no inference),
    * and run the reference clean (select+round+filter on a Jan–Jun window).
    */
  def weatherCsv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val csvPath = fixtureOnce("weather_csv", dir) { out =>
      val daily = Tables.orders(spark, dir)
        .groupBy(to_date($"o_orderdate").as("date"))
        .agg(
          count(lit(1)).cast("int").as("tavg"),
          (min($"o_orderkey") % 500).cast("int").as("tmin"),
          (max($"o_orderkey") % 500).cast("int").as("tmax"),
          (min($"o_custkey") % 100).cast("int").as("prcp"),
          (max($"o_custkey") % 10).cast("int").as("snow"),
          lit(0).as("wdir"), lit(0).cast("int").as("wspd"),
          lit(0).cast("int").as("wpgt"), lit(0).cast("int").as("pres"),
          lit(0).as("tsun"))
        .select($"date", $"tavg", $"tmin", $"tmax", $"prcp", $"snow",
          $"wdir", $"wspd", $"wpgt", $"pres", $"tsun")
      daily.write.mode("overwrite").csv(out)
    }
    WeatherClean.clean(WeatherClean.readWeather(spark, csvPath), yr = 1995)
      .select(date_format($"date", "yyyy-MM-dd").as("wdate"), $"tmin", $"prcp")
  }

  private val weatherCsvSql =
    """SELECT strftime(d, '%Y-%m-%d') AS wdate,
      |       CAST(tmin_i AS FLOAT) AS tmin,
      |       CAST(prcp_i AS FLOAT) AS prcp
      |FROM (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         CAST(MIN(o_orderkey) % 500 AS INTEGER) AS tmin_i,
      |         CAST(MIN(o_custkey) % 100 AS INTEGER) AS prcp_i
      |  FROM orders GROUP BY 1)
      |WHERE d BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'""".stripMargin

  // ------------------------------------------------------ partitioned parquet sink

  /** S7 + X4 + S5: repartition by the partition column (one file per
    * partition dir instead of #tasks × #partitions small files — the thing
    * that matters at 100 TB), write partitionBy, read back from the
    * partition-directory layout, and aggregate per partition value.
    */
  def parquetSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = s"$fixtureRoot/sink_${tag(dir)}"
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("odate"), $"o_orderpriority")
      .repartition($"o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    spark.read.parquet(out)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")) / lit(100.0)).as("sum_price"),
        min($"odate").as("min_date"), max($"odate").as("max_date"))
  }

  private val parquetSinkSql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price,
      |  MIN(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
      |  MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
      |FROM orders GROUP BY 1""".stripMargin

  // ------------------------------------------------------------ sample / split

  /** X1/X2: seed-pinned sample + randomSplit invariants as a 3-row result
    * (no DuckDB oracle — Bernoulli sampling is engine-specific; the driver
    * records a rows-only check and scalatest asserts seed-stability,
    * disjointness and coverage).
    */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir).select($"o_orderkey")
    // cache: the three counts below are separate actions — uncached, each
    // would re-scan orders and re-draw the Bernoulli sample from lineage
    val sampled = ord.sample(withReplacement = false, 0.3, seed = 42).cache()
    val Array(train, test) = sampled.randomSplit(Array(0.8, 0.2), seed = 42)
    val nSampled = sampled.count()
    val nTrain = train.count()
    val nTest = test.count()
    sampled.unpersist()
    Seq(("sampled", nSampled), ("train", nTrain), ("test", nTest))
      .toDF("split", "n_rows")
  }

  // ------------------------------------------------- deterministic hash sample

  /** Affine hash bucket in [0, buckets): `((key mod p)·a + b) mod p mod
    * buckets` with p = 2^31−1 and LCG constants — pure 64-bit integer math
    * any engine computes identically (the `key mod p` pre-reduction keeps
    * the product under 2^63 for arbitrary BIGINT keys). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    ((key % lit(2147483647L)) * lit(1103515245L) + lit(12345L)) %
      lit(2147483647L) % lit(buckets.toLong)

  /** X1/X2 production variant (reference's seeded Bernoulli sample/split:
    * nyc_taxi_final.py:744, 808): deterministic hash-bucket sampling.
    * `sample(fraction, seed)` depends on partition layout — re-reading the
    * same data with different file splits draws a different sample, and no
    * external engine can reproduce it. Bucketing each row by an affine hash
    * of its key gives the sample a 100 TB pipeline wants: stable under
    * repartitioning, reproducible in any engine (hence fully oracled),
    * and consistent across runs — a row is in `train` forever. Sample =
    * buckets 0–29 (30%), split 24/6 → 80/20 train/test; emits per-split
    * count + integer-cents revenue so the oracle hash-checks the exact
    * membership, not just sizes. Narrow scalar math + one hash agg. */
  def hashSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("bucket", hashBucket($"o_orderkey"))
      .filter($"bucket" < 30)
      .withColumn("split", when($"bucket" < 24, lit("train")).otherwise(lit("test")))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_rows"),
        (sum(cents($"o_totalprice")) / lit(100.0)).as("sum_price"))
  }

  private val hashSampleSql =
    """SELECT CASE WHEN bucket < 24 THEN 'train' ELSE 'test' END AS split,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price
      |FROM (
      |  SELECT o_totalprice,
      |    ((o_orderkey % 2147483647) * 1103515245 + 12345) % 2147483647 % 100 AS bucket
      |  FROM orders)
      |WHERE bucket < 30
      |GROUP BY 1""".stripMargin

  // -------------------------------------------------- epoch-shuffle layout

  /** Epoch-mixed affine hash in [0, p): [[hashBucket]]'s scheme with the
    * epoch folded in, so each epoch induces an independent-looking but
    * fully deterministic permutation of the corpus. Same overflow bound:
    * (p−1)·1103515245 + 12345 + epoch·2654435761 stays far under 2^63 for
    * any sane epoch count. */
  def epochHash(key: Column, epoch: Column): Column =
    ((key % lit(2147483647L)) * lit(1103515245L) + lit(12345L) +
      epoch * lit(2654435761L)) % lit(2147483647L)

  /** Deterministic per-epoch training shuffle — the "global shuffle each
    * epoch" every LLM training loader needs, as a layout any engine can
    * reproduce. Each document is assigned, per epoch, a shard
    * (`epochHash % nShards`) and a position within the shard (rank of the
    * hash, doc_id tie-break), giving a different permutation per epoch
    * with zero RNG state: resumable mid-epoch, reproducible across reruns
    * and engines, stable under repartitioning — none of which a
    * `sample`/`orderBy(rand(seed))` shuffle guarantees. At 100 TB the
    * window becomes `write.partitionBy(epoch, shard).sortWithinPartitions
    * (h)` — position is then implicit in file order and no global sort
    * ever runs; the registered query keeps the row_number form so the
    * oracle pins the exact permutation. Emits per-(epoch, shard) counts
    * plus a position-weighted id checksum: any membership OR order change
    * shifts `order_check`. One shuffle per window partition; nothing
    * driver-side. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nShards = 8
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"epoch", $"shard").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id")
      .withColumn("epoch", explode(array(lit(0L), lit(1L))))
      .withColumn("h", epochHash($"doc_id", $"epoch"))
      .withColumn("shard", $"h" % lit(nShards.toLong))
      .withColumn("position", row_number().over(w).cast("long"))
      .groupBy($"epoch", $"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"position" * ($"doc_id" % lit(1000003L))).as("order_check"),
        min($"h").as("min_h"), max($"h").as("max_h"))
  }

  private val epochShuffleSql =
    """WITH a AS (
      |  SELECT doc_id, epoch,
      |    ((doc_id % 2147483647) * 1103515245 + 12345 + epoch * 2654435761)
      |      % 2147483647 AS h
      |  FROM documents
      |  CROSS JOIN (SELECT unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS epoch)
      |), r AS (
      |  SELECT epoch, h % 8 AS shard, h, doc_id,
      |    CAST(row_number() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id)
      |      AS BIGINT) AS position
      |  FROM a
      |)
      |SELECT epoch, shard, COUNT(*) AS n_docs,
      |  CAST(SUM(position * (doc_id % 1000003)) AS BIGINT) AS order_check,
      |  MIN(h) AS min_h, MAX(h) AS max_h
      |FROM r GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- SCD type 2

  /** Slowly-changing-dimension type 2 — the history-keeping counterpart of
    * [[mergeUpsert]] (which keeps latest-wins only): every version of a key
    * is retained with a validity interval, closed by the next version's
    * arrival date. The change feed is the same deterministic derivation
    * (every 7th key re-priced 30 days later). One `lead()` window over
    * (key, valid_from) builds the intervals — exactly one shuffle on the
    * dimension key, the same shape a MERGE-based SCD2 load executes at any
    * scale. Output groups by (is_current, status) with per-group key
    * counts, integer-cents revenue, and the date span, so a wrong interval
    * (unclosed history row, misdated close, dropped version) shifts a
    * group's membership and hash-fails. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val v1 = orders.select($"o_orderkey".as("key"),
      $"o_orderstatus".as("status"), cents($"o_totalprice").as("price_c"),
      to_date($"o_orderdate").as("valid_from"))
    val v2 = orders.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey".as("key"), lit("U").as("status"),
        (cents($"o_totalprice") + lit(100L)).as("price_c"),
        date_add(to_date($"o_orderdate"), 30).as("valid_from"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"valid_from")
    v1.unionByName(v2)
      .withColumn("valid_to", date_sub(lead($"valid_from", 1).over(w), 1))
      .withColumn("is_current", $"valid_to".isNull)
      .groupBy($"is_current", $"status")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"key").as("n_keys"),
        (sum($"price_c") / lit(100.0)).as("sum_price"),
        date_format(min($"valid_from"), "yyyy-MM-dd").as("min_from"),
        date_format(max($"valid_from"), "yyyy-MM-dd").as("max_from"))
  }

  private val scd2Sql =
    """WITH v AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(o_orderdate AS DATE) AS valid_from
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey AS key, 'U' AS status,
      |    CAST(round(o_totalprice*100) AS BIGINT) + 100 AS price_c,
      |    CAST(o_orderdate AS DATE) + 30 AS valid_from
      |  FROM orders WHERE o_orderkey % 7 = 0
      |), iv AS (
      |  SELECT *,
      |    lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) - 1
      |      AS valid_to
      |  FROM v
      |)
      |SELECT valid_to IS NULL AS is_current, status,
      |  COUNT(*) AS n_rows, COUNT(DISTINCT key) AS n_keys,
      |  CAST(SUM(price_c) AS DOUBLE)/100.0 AS sum_price,
      |  strftime(MIN(valid_from), '%Y-%m-%d') AS min_from,
      |  strftime(MAX(valid_from), '%Y-%m-%d') AS max_from
      |FROM iv GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- CDC merge

  /** CDC merge/upsert — the latest-version-wins MERGE every incremental
    * 100 TB pipeline runs between a snapshot and a change feed. The change
    * batch is derived deterministically from `orders` (every 7th key is an
    * UPDATE with a re-priced row, every 13th key arrives negated as an
    * INSERT of a new key), merged latest-wins by (key, version) with one
    * `row_number` window — exactly one shuffle on the merge key, the same
    * shape a storage-side MERGE INTO executes. Emits per-status counts,
    * integer-cents revenue, and changed-row counts so a wrong merge (stale
    * version kept, insert dropped, update double-applied) shifts every
    * aggregate and hash-fails. At scale the window is equivalently a
    * max-version semi-join; both are one key-shuffle — the window keeps the
    * single-pass form.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val base = orders.select($"o_orderkey".as("key"),
      $"o_orderstatus".as("status"), cents($"o_totalprice").as("price_c"),
      lit(1L).as("version"))
    val updates = orders.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey".as("key"), lit("U").as("status"),
        (cents($"o_totalprice") + lit(100L)).as("price_c"), lit(2L).as("version"))
    // insert keys are `-k - 1`: strictly negative for every base key ≥ 0,
    // so an insert can never collide with an update (orderkey 0 is
    // divisible by 7 AND 13 — a plain negation would merge its insert and
    // update under one key and leave latest-wins ambiguous)
    val inserts = orders.filter($"o_orderkey" % 13 === 0)
      .select((-$"o_orderkey" - 1).as("key"), lit("N").as("status"),
        cents($"o_totalprice").as("price_c"), lit(2L).as("version"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"version".desc)
    base.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .groupBy($"status")
      .agg(count(lit(1)).as("n_rows"),
        (sum($"price_c") / lit(100.0)).as("sum_price"),
        sum(when($"version" === 2L, 1L).otherwise(0L)).as("n_changed"),
        min($"key").as("min_key"), max($"key").as("max_key"))
  }

  private val mergeUpsertSql =
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(1 AS BIGINT) AS version
      |  FROM orders
      |), upd AS (
      |  SELECT o_orderkey AS key, 'U' AS status,
      |    CAST(round(o_totalprice*100) AS BIGINT) + 100 AS price_c,
      |    CAST(2 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 7 = 0
      |), ins AS (
      |  SELECT -o_orderkey - 1 AS key, 'N' AS status,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(2 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 13 = 0
      |), m AS (
      |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY version DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |)
      |SELECT status, COUNT(*) AS n_rows,
      |  CAST(SUM(price_c) AS DOUBLE)/100.0 AS sum_price,
      |  CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  MIN(key) AS min_key, MAX(key) AS max_key
      |FROM m WHERE rn = 1 GROUP BY 1""".stripMargin

  // ------------------------------------------------------ data expectations

  /** Data-quality expectation suite — the validation gate a production
    * pipeline runs before publishing a table (Deequ/Great-Expectations
    * style): range checks, null checks, accepted-value sets, key
    * uniqueness and referential integrity, each emitted as a
    * (check_name, n_violations, pass) row. Thresholds are deliberately
    * tight enough that some checks FAIL on the corpus — a validation
    * report is only trustworthy if the failing path is exercised.
    *
    * Scale shape: all per-table checks FUSE into one aggregation pass per
    * table (one scan of lineitem, one of orders — not one scan per check),
    * unpivoted to rows via `stack`; the referential check is one
    * broadcast-able anti-join keyed on the dimension key. Nothing
    * driver-side, output is O(checks). */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).agg(
      sum(when(!$"l_quantity".between(1, 30), 1L).otherwise(0L)).as("c_qty"),
      sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("c_ship"),
      sum(when($"l_discount" > 0.05, 1L).otherwise(0L)).as("c_disc"),
      sum(when($"l_extendedprice" <= 0, 1L).otherwise(0L)).as("c_price"))
      .select(expr(
        """stack(4,
          |  'lineitem.l_quantity in [1,30]', c_qty,
          |  'lineitem.l_shipdate not null', c_ship,
          |  'lineitem.l_discount <= 0.05', c_disc,
          |  'lineitem.l_extendedprice > 0', c_price) AS (check_name, n_violations)
          |""".stripMargin))
    val ord = Tables.orders(spark, dir).agg(
      (count(lit(1)) - count_distinct($"o_orderkey")).as("c_dup"),
      sum(when(!$"o_orderstatus".isin("O", "F", "P"), 1L).otherwise(0L)).as("c_status"),
      sum(when($"o_totalprice" > 300000, 1L).otherwise(0L)).as("c_total"))
      .select(expr(
        """stack(3,
          |  'orders.o_orderkey unique', c_dup,
          |  'orders.o_orderstatus in (O,F,P)', c_status,
          |  'orders.o_totalprice <= 300000', c_total) AS (check_name, n_violations)
          |""".stripMargin))
    val ref = Tables.orders(spark, dir).select($"o_custkey")
      .join(Tables.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders.o_custkey references customer").as("check_name"),
        $"n_violations")
    li.unionByName(ord).unionByName(ref)
      .withColumn("pass", ($"n_violations" === 0L).cast("int"))
  }

  private val expectationsSql =
    """WITH li AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 30 THEN 1 ELSE 0 END) AS BIGINT) AS c_qty,
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_ship,
      |    CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc,
      |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_price
      |  FROM lineitem
      |), ord AS (
      |  SELECT
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS c_dup,
      |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS c_status,
      |    CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS c_total
      |  FROM orders
      |), u AS (
      |  SELECT 'lineitem.l_quantity in [1,30]' AS check_name, c_qty AS n_violations FROM li
      |  UNION ALL SELECT 'lineitem.l_shipdate not null', c_ship FROM li
      |  UNION ALL SELECT 'lineitem.l_discount <= 0.05', c_disc FROM li
      |  UNION ALL SELECT 'lineitem.l_extendedprice > 0', c_price FROM li
      |  UNION ALL SELECT 'orders.o_orderkey unique', c_dup FROM ord
      |  UNION ALL SELECT 'orders.o_orderstatus in (O,F,P)', c_status FROM ord
      |  UNION ALL SELECT 'orders.o_totalprice <= 300000', c_total FROM ord
      |  UNION ALL SELECT 'orders.o_custkey references customer',
      |    (SELECT COUNT(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |)
      |SELECT check_name, n_violations,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass
      |FROM u""".stripMargin

  // ---------------------------------------------------- stratified split

  /** Exact stratified train/val/test split — eval-set creation with
    * guaranteed per-stratum proportions: within each stratum (`lang`),
    * rows are ranked deterministically and assigned 80/10/10 by rank mod
    * 10. Unlike [[hashSample]] (whose per-stratum fractions only converge
    * in expectation), the split is exact per stratum — what a benchmark
    * dev-set build needs. One row_number window per stratum + one hash
    * agg; the window partitions by stratum, so parallelism is bounded by
    * stratum count — fine for eval-set-sized strata; shard finer (e.g.
    * lang × source) when strata are corpus-sized. */
  def stratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
    Tables.documents(spark, dir)
      .select($"lang", $"doc_id",
        graft.functions.Text.tokenCount($"text").cast("long").as("n_tok"))
      .withColumn("slot", (row_number().over(w) - 1) % 10)
      .withColumn("split",
        when($"slot" <= 7, "train").when($"slot" === 8, "val").otherwise("test"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"doc_id").as("id_sum"),
        sum($"n_tok").as("n_tokens"))
  }

  private val stratifiedSplitSql =
    """WITH r AS (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 10 AS slot
      |  FROM documents
      |)
      |SELECT lang,
      |  CASE WHEN slot <= 7 THEN 'train' WHEN slot = 8 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM r GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- priority sampling

  /** Deterministic fixed-SIZE per-group sample by hash priority: within
    * each market segment keep the K customers with the smallest md5
    * hash — the engine-portable equivalent of a per-group reservoir
    * sample (uniform over the group, stable under repartitioning and
    * across engines, and UNLIKE `sample(fraction)` it yields an exact
    * count per group). The hash-bucket sample ([[hashBucket]]) fixes the
    * RATE; this fixes the SIZE — the two sampling contracts a pipeline
    * needs. md5 (not the rolling hash) because selection must be
    * uniform; ties are impossible (distinct keys hash distinctly at
    * 60 bits for any real table) but the (hash, key) order pins
    * determinism anyway.
    *
    * Scale shape: one window shuffle on the group key; rank ≤ K prunes
    * everything else. At very hot groups, replace with the two-phase
    * per-partition top-K + merge (TakeOrdered shape) — same contract. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_mktsegment")
      .orderBy($"h", $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        graft.functions.Text.md5Long($"c_custkey".cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"c_custkey", $"c_mktsegment", $"rk")
  }

  private val prioritySampleSql =
    """SELECT c_custkey, c_mktsegment, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT c_custkey, c_mktsegment,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |           ORDER BY ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT,
      |                    c_custkey) AS rk
      |  FROM customer
      |)
      |WHERE rk <= 20""".stripMargin

  /** Small-file compaction — the table-maintenance job every long-lived
    * 100 TB lake needs: streaming/incremental ingest leaves partitions
    * fragmented into thousands of KB-sized files, and scan cost becomes
    * task-scheduling cost (one task per file) instead of I/O. The job
    * rewrites each partition to its target file count (here 1 per
    * partition at test SF; size-based — bytes/128MB — in production).
    *
    * The rewrite stages into a sibling directory and then swaps it in
    * with a filesystem rename — NEVER `spark.read.parquet(p).write
    * .mode("overwrite").parquet(p)`: reading the directory being
    * overwritten only "works" while dynamic partition overwrite happens
    * to stage output before commit, is the read-under-write pattern
    * Spark rejects outright for INSERT, and a mid-commit failure loses
    * the table. Stage+rename costs one extra directory of transient
    * space and gives readers an atomic switch (HDFS rename is atomic;
    * on object stores use a metastore/table-format pointer swap —
    * Iceberg/Delta do exactly this). On a table format with snapshot
    * isolation, per-partition dynamic overwrite of only the fragmented
    * partitions is the cheaper production variant.
    *
    * The query builds a deliberately fragmented fixture (16-way
    * repartition under partitionBy → up to 16 files per partition),
    * compacts it, and emits per-partition row counts + the post-compaction
    * file count + a fragmentation-reduced flag. Row counts and sums are
    * DuckDB-oracled; file counts assert the compaction itself.
    */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = s"$fixtureRoot/compact_${tag(dir)}"
    def filesPerPartition(root: String): Map[String, Long] = {
      val base = new java.io.File(root)
      val parts = Option(base.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      parts.map { p =>
        val n = Option(p.listFiles()).getOrElse(Array.empty)
          .count(f => f.getName.endsWith(".parquet"))
        p.getName.stripPrefix("event_type=") -> n.toLong
      }.toMap
    }
    // Fragmented ingest state: every partition carries one file per
    // ingest task that touched it.
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartition(16)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val before = filesPerPartition(out)
    // The compaction pass: per-partition rewrite into a staging sibling,
    // then an atomic rename swap (see scaladoc for why not in-place).
    val staging = s"$out.compacting"
    spark.read.parquet(out)
      .repartition($"event_type")   // 1 task (→ 1 file) per partition key
      .write.mode("overwrite").partitionBy("event_type").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(out)
    fs.delete(outPath, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), outPath))
      throw new java.io.IOException(s"compaction swap failed: $staging -> $out")
    val after = filesPerPartition(out)
    val stats = spark.read.parquet(out)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        (sum(cents($"value")) / lit(100.0)).as("sum_value"))
    val beforeDf = before.toSeq.toDF("event_type", "files_before")
    val afterDf = after.toSeq.toDF("event_type", "files_after")
    stats.join(beforeDf, "event_type").join(afterDf, "event_type")
      .select($"event_type", $"n_rows", $"sum_value",
        $"files_after",
        ($"files_before" > $"files_after").as("fragmentation_reduced"))
  }

  private val compactionSql =
    """SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
      |  CAST(1 AS BIGINT) AS files_after,
      |  TRUE AS fragmentation_reduced
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------------------- literal taxi ETL

  /** The LITERAL taxi feature pipeline — [[graft.etl.TaxiFeatures
    * .featurePipeline]] exactly as composed for the reference schema
    * (nyc_taxi_final.py:306-614) — under the DuckDB oracle end-to-end.
    * The events-based `q_etl_features` oracles a structural analog with
    * exact-integer aggregate math; this query instead runs the real
    * 8-column taxi schema, the real glob parquet scan (S4: the 4-file
    * fixture read through `readTaxi` with a star glob and the explicit
    * schema), and the real DOUBLE-summing `histSpeedAgg`, and still
    * hash-matches DuckDB because the fixture is constructed so double
    * addition cannot round: trip_distance/surcharge/extra/tolls are
    * multiples of 0.25 (dyadic rationals — every partial sum of ≤60k of
    * them is exactly representable, so Spark's partition-order partial
    * sums and DuckDB's sequential sum produce the same bits) and
    * durations are whole minutes (duration_min is an exact integer
    * double). The fixture derives every column from `events` with pure
    * integer arithmetic, so the oracle rebuilds it in SQL; the weather
    * dimension comes from the event dates with day-of-month gaps
    * (day % 7 == 0 missing) so the broadcast-left-join's na.fill(0) path
    * is exercised under the hash. Quirk §2.11.4 is load-bearing here:
    * rows the duration filter later drops (k outside (2,180)) DO
    * contribute to hist_avg_speed, and the oracle reproduces that by
    * aggregating pre-filter. */
  def taxiEtl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val path = fixtureOnce("taxi", dir) { out =>
      val taxi = ev.select(
        $"ts".as("tpep_pickup_datetime"),
        expr("ts + make_interval(0, 0, 0, 0, 0, CAST(event_id % 200 AS INT) + 1, 0)")
          .as("tpep_dropoff_datetime"),
        (($"event_id" % 236 + 3) * 0.25).as("trip_distance"),
        (($"event_id" % 5 - 1) * 0.25).as("congestion_surcharge"),
        ($"user_id" % 8).cast("int").as("PULocationID"),
        (($"user_id" + $"event_id") % 8).cast("int").as("DOLocationID"),
        (($"event_id" % 41) * 0.25).as("extra"),
        when($"event_id" % 97 === 0, lit(null).cast("double"))
          .otherwise(($"event_id" % 201) * 0.25).as("tolls_amount"))
      taxi.repartition(4).write.mode("overwrite").parquet(out)
    }
    val weather = ev.select(to_date($"ts").as("date")).distinct()
      .filter(dayofmonth($"date") % 7 =!= 0)
      .select($"date",
        (dayofmonth($"date") % 30).cast("double").as("tmin"),
        (dayofmonth($"date") * 7 % 25).cast("double").as("prcp"))
    TaxiFeatures.featurePipeline(
      TaxiFeatures.readTaxi(spark, s"$path/*.parquet"), weather)
  }

  private val taxiEtlSql =
    """WITH taxi AS (
      |  SELECT ts,
      |    ((event_id % 236) + 3) * 0.25e0 AS trip_distance,
      |    ((event_id % 5) - 1) * 0.25e0 AS congestion_surcharge,
      |    CAST(user_id % 8 AS INTEGER) AS pu,
      |    CAST((user_id + event_id) % 8 AS INTEGER) AS dol,
      |    (event_id % 41) * 0.25e0 AS extra,
      |    CASE WHEN event_id % 97 = 0 THEN NULL
      |         ELSE (event_id % 201) * 0.25e0 END AS tolls_amount,
      |    CAST((event_id % 200) + 1 AS DOUBLE) AS duration_min
      |  FROM events
      |), clean AS (
      |  SELECT * FROM taxi
      |  WHERE tolls_amount IS NOT NULL
      |    AND trip_distance > 0.5 AND trip_distance < 60.0
      |    AND congestion_surcharge >= 0
      |    AND extra >= 0 AND extra < 10.0
      |    AND tolls_amount >= 0 AND tolls_amount < 50.0
      |), feat AS (
      |  SELECT *,
      |    minute(ts) AS minute, hour(ts) AS hour,
      |    dayofweek(ts) + 1 AS day_of_week, day(ts) AS day_of_month,
      |    month(ts) AS month,
      |    CASE WHEN dayofweek(ts) + 1 IN (1, 7) THEN 1 ELSE 0 END AS is_holiday,
      |    CAST(ts AS DATE) AS d,
      |    CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
      |         WHEN hour(ts) BETWEEN 12 AND 16 THEN 'afternoon'
      |         WHEN hour(ts) BETWEEN 17 AND 23 THEN 'evening'
      |         ELSE 'night' END AS time_period
      |  FROM clean
      |), hist AS (
      |  SELECT pu, dol, time_period, day_of_week,
      |    SUM(trip_distance) / (SUM(duration_min) + 1e-6) * 60 AS hist_avg_speed
      |  FROM feat GROUP BY 1, 2, 3, 4
      |), weather AS (
      |  SELECT d,
      |    CAST(day(d) % 30 AS DOUBLE) AS tmin,
      |    CAST(day(d) * 7 % 25 AS DOUBLE) AS prcp
      |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
      |  WHERE day(d) % 7 <> 0
      |)
      |SELECT f.month, f.day_of_month, f.hour, f.minute, f.day_of_week,
      |  f.is_holiday, f.time_period, f.trip_distance, f.congestion_surcharge,
      |  f.extra, f.tolls_amount,
      |  round(f.trip_distance / (round(h.hist_avg_speed, 2) + 1e-6) * 60, 2)
      |    AS expected_duration,
      |  round(h.hist_avg_speed, 2) AS avg_speed_time_period,
      |  COALESCE(w.tmin, 0.0) AS tmin, COALESCE(w.prcp, 0.0) AS prcp,
      |  f.pu AS "PULocationID", f.dol AS "DOLocationID",
      |  CASE WHEN f.congestion_surcharge > 0 THEN 1 ELSE 0 END AS is_congested,
      |  f.duration_min
      |FROM feat f
      |LEFT JOIN hist h ON f.pu = h.pu AND f.dol = h.dol
      |  AND f.time_period = h.time_period AND f.day_of_week = h.day_of_week
      |LEFT JOIN weather w ON f.d = w.d
      |WHERE f.duration_min > 2 AND f.duration_min < 180""".stripMargin

  // ---------------------------------------------------------------- registry

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_priority_sample", prioritySample, Some(prioritySampleSql)),
    VerifiedQuery("q_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    VerifiedQuery("q_etl_features", etlFeatures, Some(etlFeaturesSql)),
    VerifiedQuery("q_weather_csv", weatherCsv, Some(weatherCsvSql)),
    VerifiedQuery("q_parquet_sink", parquetSink, Some(parquetSinkSql)),
    VerifiedQuery("q_sample_split", sampleSplit, None,
      rowsOnly = Some(graft.RowsOnlyContract(
        reason = "Bernoulli sample() output depends on physical row layout",
        columns = Seq("split", "n_rows"),
        test = "EtlOpsSpec seed-stability + disjointness/coverage",
        twin = Some("q_hash_sample"),
        exactRowsSql = Some("SELECT 3")))), // sampled/train/test count rows
    VerifiedQuery("q_hash_sample", hashSample, Some(hashSampleSql)),
    VerifiedQuery("q_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    VerifiedQuery("q_scd2", scd2, Some(scd2Sql)),
    VerifiedQuery("q_expectations", expectations, Some(expectationsSql)),
    VerifiedQuery("q_stratified_split", stratifiedSplit, Some(stratifiedSplitSql)),
    VerifiedQuery("q_compaction", compaction, Some(compactionSql)),
    VerifiedQuery("q_taxi_etl", taxiEtl, Some(taxiEtlSql)),
  )
}
