package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time arbitrary registered queries under the Bench session
  * conf (local[32], fixture tuning on). Args: [sfDir] [comma-list of query
  * names] [iters]. Prints per-iteration seconds per query.
  *
  * Protocol matches Bench since round 11: `spark.catalog.clearCache()`
  * runs BEFORE EVERY iteration. Without it, any registered query that
  * returns a materialized `.cache()`ed frame (kHopQuery, pageRankQuery,
  * splitLeakage — the materialize-before-release pattern) plan-matches
  * its own previous invocation's cached result and re-reads rows instead
  * of executing: BenchEnvProbe measured q_khop_bfs at 1.1 s cache-read vs
  * 4.1 s honest cold run at sf0.1. Every pre-r11 "solo steady" number for
  * a self-caching query is a cache-read, and the gap it showed against
  * the (clearCache-protected, always-honest) bench medians was THIS, not
  * a once-per-JVM tier warm. Set SPARK_GRAFT_PROFILE_KEEP_CACHE=1 to opt
  * back into the reuse regime when measuring exactly that.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("q_hist_rate"))
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tuning.Key, "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    spark.sparkContext.setCheckpointDir(ckptRoot.getAbsolutePath)
    val qs = graft.SparkEntry.queries
    val keepCache = sys.env.get("SPARK_GRAFT_PROFILE_KEEP_CACHE").contains("1")
    names.foreach { n =>
      val times = (1 to iters).map { _ =>
        if (!keepCache) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // Bench's force contract, not collect(): full row evaluation via a
        // checksum aggregate, ONE row to the driver. collect() on a
        // pair-emitting query at probe scale is a driver OOM, and it would
        // time result serialization the bench never pays (r10: the sf100
        // near-dup probe died exactly that way).
        val df = qs(n)(spark, dir)
        import org.apache.spark.sql.functions.{col, struct, xxhash64, expr}
        val checksummed =
          try Some(df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h")))
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        checksummed match {
          case Some(h) => h.agg(expr("bit_xor(h)")).collect()
          case None    => df.foreach(_ => ())
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
