package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Tables, Tuning}

/** Second-stage discriminator for the sf10 distributed-CC slowdown
  * (bench_r14_sf10: q_minhash_det_transitive_dist steady ~400 s where
  * r9 recorded ~85 s; ProfileCC localizes 392 s INSIDE
  * `connectedComponents` over a 27k-edge candidate graph — absurd for
  * the loop's per-round work, which is a handful of 32-partition joins
  * over cached KB-scale frames).
  *
  * Hypothesis: the loop's `sym.cache()` is not being hit by the round
  * jobs, so every round re-evaluates the 46-s shingle→minhash→band
  * candidate pipeline (392 ≈ 8.5 × 46). Test: hand the loop a candidate
  * frame that is ITSELF cache-materialized first — if the loop then runs
  * in seconds, the recompute is proven and the fix is to materialize
  * `sym` eagerly (or checkpoint the INPUT) inside connectedComponents;
  * if it still takes ~390 s, the loop's own jobs are the cost and the
  * probe prints per-round details via a listener.
  */
object CcLoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(Tuning.Key, "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    spark.sparkContext.setCheckpointDir(ckpt.getAbsolutePath)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccloop] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tuning.spread(Tables.documents(spark, dir))
    val (cand0, release) = graft.ops.SimilarityProfileAccess.detCandidates(docs)
    val cand = cand0.cache()
    t("candidates cache-materialize")(println("  edges: " + cand.count()))
    t("cc over CACHED candidates") {
      println("  nodes: " + graft.ops.Similarity
        .connectedComponents(cand, localThreshold = 0L).count())
    }
    cand.unpersist()
    release()
    spark.stop()
  }
}
