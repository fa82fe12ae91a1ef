package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates WHY multi-job iterative queries run 2–8× slower inside the
  * 170-query bench loop than solo-steady in a fresh JVM (q_khop_bfs 5.0 s
  * in every bench iteration vs 2.0 s solo; q_pagerank 6 s vs 0.75 s) —
  * the residual behind r9/r10 verdict "fixture warm" items after
  * [[CodegenCacheProbe]] REFUTED codegen-cache eviction (post-churn
  * re-runs are fast even at maxEntries=100).
  *
  * Protocol: fresh Bench-conf session → time probe queries 3× (solo
  * steady) → run the whole registry once (Bench's force contract) → time
  * the probe queries 3× again (in-bench regime). Reports both, plus the
  * candidate environment deltas: driver heap in use, GC time, shuffle
  * scratch file count, listener-bus queue size. Whichever delta explains
  * the slowdown is the one the bench protocol should manage explicitly.
  *
  * Usage: runMain graft.tools.BenchEnvProbe [sfDir] [probeNames]
  */
object BenchEnvProbe {
  private def force(df: DataFrame): Unit = {
    val checksummed =
      try Some(df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    checksummed match {
      case Some(h) => h.agg(expr("bit_xor(h)")).collect()
      case None    => df.foreach(_ => ())
    }
  }

  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(_.getCollectionTime).sum

  private def heapUsedMb: Long =
    (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)

  private def countFiles(root: java.io.File): Long =
    if (!root.exists()) 0L
    else if (root.isFile) 1L
    else Option(root.listFiles()).map(_.map(countFiles).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probeNames = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("q_khop_bfs", "q_pagerank", "q_label_prop"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val localDir = new java.io.File(
      spark.sparkContext.getConf.get("spark.local.dir", System.getProperty("java.io.tmpdir")))

    val qs = graft.SparkEntry.queries
    // clearCache before EVERY timed run (the bench protocol): without it a
    // self-caching query's later runs are cache reads (see ProfileQuery),
    // and the phase comparison below would be meaningless
    def timeProbe(tag: String): Unit = probeNames.foreach { n =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        force(qs(n)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[env-probe] $tag $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    def env(tag: String): Unit =
      println(f"[env-probe] $tag heap=${heapUsedMb}MB gc=${gcMillis}ms " +
        f"scratch_files=${countFiles(localDir)}")

    env("fresh    ")
    timeProbe("fresh    ")
    val t0 = System.nanoTime()
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try force(fn(spark, dir))
      catch { case e: Throwable => println(s"[env-probe] $name FAILED: ${e.getMessage}") }
    }
    println(f"[env-probe] registry pass ${(System.nanoTime() - t0) / 1e9}%.1f s")
    env("post-pass")
    timeProbe("post-pass")
    // candidate fix: force a full GC cycle (ContextCleaner drains
    // weak-ref queues and deletes accumulated shuffle scratch only when
    // the driver GC collects the references)
    System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
    env("post-gc  ")
    timeProbe("post-gc  ")
    spark.stop()
  }
}
