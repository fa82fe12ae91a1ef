package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Tables, Tuning}

/** Dev-only stage profiler for the distributed connected-components path
  * (the `q_minhash_det_transitive_dist` registered query). */
object ProfileCC {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tuning.Key, "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    spark.sparkContext.setCheckpointDir(ckpt.getAbsolutePath)
    val docs = Tuning.spread(Tables.documents(spark, dir))
    t("warmup count")(docs.count())
    val (cand, release) = graft.ops.SimilarityProfileAccess.detCandidates(docs)
    t("candidates count")(println("  edges: " + cand.count()))
    t("cc distributed") {
      val comps = graft.ops.Similarity.connectedComponents(cand, localThreshold = 0L)
      println("  nodes: " + comps.count())
    }
    release()
    t("full dist query") {
      graft.ops.Similarity.minhashDetTransitiveDistQuery(spark, dir).count()
    }
    spark.stop()
  }
}
