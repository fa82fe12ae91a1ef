package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Dev profiler for the sign-LSH signature scan: times
  * [[graft.ops.Similarity.hyperplaneSignatures]] at a sweep of key widths
  * over a corpus, isolating the scan from candidate generation — the r10
  * decomposition tool for the adaptive-vs-fixed ANN cost question.
  * Usage: runMain graft.tools.SigWidthProbe [sfDir] [widths,csv]
  */
object SigWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val widths = args.lift(1).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(4, 10, 13))
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tuning.Key, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sig] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f  ($r)")
    }
    t("count")(emb.count())
    for (w <- widths) {
      val sigs = graft.ops.Similarity.hyperplaneSignatures(emb, 16, w)
      val plan = sigs.queryExecution.executedPlan.toString
      val gen = plan.linesIterator.find(_.contains("Generate")).getOrElse("?")
      println(s"[sig] bits=$w generate-node: ${gen.trim.take(80)}")
      for (it <- 1 to 2)
        t(s"bits=$w it$it")(sigs.agg(expr("bit_xor(key)")).collect()(0))
    }
    spark.stop()
  }
}
