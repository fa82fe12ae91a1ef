package graft.tools

import org.apache.spark.sql.SparkSession

/** Discriminate WHY q_minhash_det_transitive_dist runs ~5× slower at
  * sf10 than the r9 epoch recorded (bench_r14_sf10: steady 402–413 s vs
  * r9's 78–94 s, while the driver-path sibling q_minhash_det_transitive
  * is FASTER than r9). Chief suspect: r9's Bench set no checkpoint dir,
  * so [[graft.ops.Similarity.connectedComponents]] took its
  * `localCheckpoint` arm; since r11 every runner sets a reliable
  * checkpoint dir and the loop takes the `checkpoint(true)` arm — which
  * runs a SECOND job per checkpointed round AND (because `.checkpoint`
  * truncates lineage only for the RDD, not the cached plan) may change
  * downstream plan reuse.
  *
  * Args: [sfDir] [mode: reliable|none] [iters]. `reliable` mirrors
  * Bench (checkpoint dir set); `none` mirrors the r9 epoch (unset →
  * localCheckpoint arm). Run both modes in separate JVMs, interleaved
  * if the box allows, and compare.
  */
object CcCkptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val mode = args.lift(1).getOrElse("reliable")
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
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
    if (mode == "reliable") {
      val ckptRoot = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
      spark.sparkContext.setCheckpointDir(ckptRoot.getAbsolutePath)
    }
    import org.apache.spark.sql.functions.{col, struct, xxhash64, expr}
    (1 to iters).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_minhash_det_transitive_dist")(spark, dir)
      df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      println(f"[cc-ckpt] mode=$mode iter $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
