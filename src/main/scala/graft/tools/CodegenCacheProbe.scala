package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the codegen-cache eviction cost the bench registry pays
  * (r10 verdict item 6 / r9 item 7 — "q_khop_bfs pays ~3.7 s of warm in
  * every bench median").
  *
  * Hypothesis under test: a query's slow "first" iteration is dominated
  * by Janino compilation of its generated stages, and in a 170-query
  * bench loop Spark's generated-class cache (default
  * `spark.sql.codegen.cache.maxEntries` = 100) evicts every query's
  * classes between iterations — so EVERY bench iteration recompiles
  * every query, and the recorded medians measure a perpetual-cold-codegen
  * regime no production deployment runs in (a repeated query compiles
  * once). The probe times a heavy-codegen query (q_khop_bfs — a 3-round
  * unrolled iterative plan), churns the cache with `churn` distinct
  * single-stage queries (distinct literals → distinct generated source →
  * distinct cache entries), and re-times the query. If the re-run is as
  * slow as the cold run at maxEntries=100 but steady-state fast at a
  * registry-sized cache, the eviction hypothesis is proven and sizing
  * the cache to the registry is the fix that reports steady state
  * without hiding the compile cost (iteration-1 rows keep it).
  *
  * Usage: runMain graft.tools.CodegenCacheProbe <sfDir> <maxEntries> [churn]
  */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxEntries = args.lift(1).getOrElse("100")
    val churn = args.lift(2).map(_.toInt).getOrElse(300)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tuning.Key, "true")
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeKhop(): Double = {
      val t0 = System.nanoTime()
      graft.ops.Graph.kHopQuery(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = timeKhop()
    val warm = timeKhop() // immediate re-run: cache hit at any setting
    // churn: distinct literals make distinct generated source per query
    (1 to churn).foreach { i =>
      spark.range(100).selectExpr(s"sum(id % ${i + 7}) as s").collect()
    }
    val postChurn = timeKhop()
    println(f"[codegen-cache] maxEntries=$maxEntries%s churn=$churn%d " +
      f"cold=$cold%.2f warm=$warm%.2f post_churn=$postChurn%.2f")
    spark.stop()
  }
}
