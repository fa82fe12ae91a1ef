package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Adversarial-skew probe for the entity-resolution rewrite (r8 verdict
  * stretch item 8). The r8 distinct-name rewrite made `entityMatch` flat
  * under DUPLICATE growth (the 10× corpus repeats every name, blocks grow
  * but distinct-name pairs don't). The one remaining quadratic bound is
  * Σ_block (distinct names)² — surfaced to production monitoring via the
  * `n_block_names` audit column. This probe grows exactly that dimension:
  * K copies of sf0.1's customers with per-copy DISTINCT names that keep
  * the 14-char blocking prefix (the suffix digits sit past position 14,
  * `Customer#000xxxxxx` is 18 chars), so every block's distinct-name
  * count grows K× and in-block pair work K²× — the worst case the audit
  * column exists to alert on.
  *
  * Prints base vs skewed runtimes and the max `n_block_names` both ways,
  * so SCALE.md can record the measured exponent against the K² bound.
  *
  * Usage: runMain graft.tools.EntitySkewProbe [srcDir] [copies] [iters]
  */
object EntitySkewProbe {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(4)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val dest = "/root/repo/target/entity_skew"
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

    // K distinct-name copies: id shift keeps keys disjoint (same stride +
    // bound assert as MakeScaledCorpus); the name suffix ` ~i` lands past
    // the 14-char blocking prefix so blocks keep their size profile while
    // their DISTINCT-name count grows K×.
    val base = Tables.customer(spark, src)
    val mx = base.agg(max(col("c_custkey").cast("long"))).head().getLong(0)
    require(mx < 100000000L, s"c_custkey max $mx >= 10^8: shift would collide")
    val skewed = (0 until copies).map { i =>
      base.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L))
        .withColumn("c_name", concat(col("c_name"), lit(s" ~$i")))
    }.reduce(_ unionByName _)
    skewed.write.mode("overwrite").parquet(s"$dest/customer.parquet")

    def time(dir: String, label: String): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.ops.Entity.entityMatch(spark, dir)
        val n = df.count()
        val maxNames = df.agg(max(col("n_block_names"))).head().getLong(0)
        df.unpersist()
        ((System.nanoTime() - t0) / 1e9, n, maxNames)
      }
      val (ts, ns, ms) = (runs.map(_._1), runs.map(_._2), runs.map(_._3))
      println(f"[entity-skew] $label%-18s ${ts.map(t => f"$t%.2f").mkString(" ")} s  " +
        s"rows=${ns.head} max_n_block_names=${ms.head}")
    }
    time(src, s"base($src)")
    time(dest, s"skewed(x$copies)")
    spark.stop()
  }
}
