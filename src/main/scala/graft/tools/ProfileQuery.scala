package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time arbitrary registered queries under the Bench session
  * conf (local[32], fixture tuning on). Args: [sfDir] [comma-list of query
  * names] [iters]. Prints per-iteration seconds per query.
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
    names.foreach { n =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
