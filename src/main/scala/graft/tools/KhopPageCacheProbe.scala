package graft.tools

import org.apache.spark.sql.SparkSession

/** Settle the khop probe-scale band (r13 verdict item 5): r12 recorded
  * 88–94 s steady for q_khop_bfs at sf100, the r13 re-measurement saw
  * 178–287 s on untouched code and HYPOTHESIZED the gap is OS page-cache
  * state (the 4.3 GB corpus + edge table either ride the cache across
  * runs or re-read from disk). This probe turns the hypothesis into a
  * measurement: ONE JVM (so JIT/codegen state is shared — the r13 noise
  * floor showed separate-JVM points carry ~2x spread of their own),
  * R interleaved rounds of
  *
  *   1. `sync; echo 3 > /proc/sys/vm/drop_caches`  → time khop  (COLD)
  *   2. no drop                                    → time khop  (HOT)
  *
  * with `spark.catalog.clearCache()` before every measurement (the
  * honest protocol — Spark-side caches never survive between runs on
  * either arm; ONLY the OS page-cache state differs). An untimed warmup
  * first builds the materialized edge table and warms JIT, so round 1's
  * cold arm measures cache loss, not fixture construction.
  *
  * Usage: runMain graft.tools.KhopPageCacheProbe [sfDir] [rounds]
  * Needs root (the sandbox has it); prints per-round cold/hot pairs and
  * a summary band for SCALE.md.
  */
object KhopPageCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf100")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
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

    def dropPageCache(): Unit = {
      val p = new ProcessBuilder("sh", "-c",
        "sync; echo 3 > /proc/sys/vm/drop_caches").inheritIO().start()
      require(p.waitFor() == 0, "drop_caches failed — probe needs root")
    }
    def runKhop(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      import org.apache.spark.sql.functions.{col, struct, xxhash64, expr}
      val df = graft.SparkEntry.queries("q_khop_bfs")(spark, dir)
      df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }

    runKhop() // untimed: builds/validates the edge table, warms JIT
    val pairs = (1 to rounds).map { r =>
      dropPageCache()
      val cold = runKhop()
      val hot = runKhop()
      println(f"[khop-pc] round $r: cold $cold%.1f s | hot $hot%.1f s")
      (cold, hot)
    }
    val colds = pairs.map(_._1).sorted
    val hots = pairs.map(_._2).sorted
    println(f"[khop-pc] SUMMARY sf=$dir rounds=$rounds: " +
      f"cold band ${colds.head}%.1f-${colds.last}%.1f s | " +
      f"hot band ${hots.head}%.1f-${hots.last}%.1f s | " +
      f"page-cache term ~${colds.last - hots.head}%.1f s max-spread")
    spark.stop()
  }
}
