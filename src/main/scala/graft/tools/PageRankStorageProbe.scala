package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
import org.apache.spark.storage.StorageLevel

/** Dev probe for the r12 verdict's one moving number: sf100 pagerank
  * steady state (SCALE.md recorded a 192–303 s band "still decaying at
  * iter 3"). Runs the registered interaction PageRank to CONVERGENCE
  * under each edge-frame persistence posture so the scale design is
  * chosen on evidence, not defaults:
  *
  *   memory_and_disk — the registered query's `.persist(MEMORY_AND_DISK)`
  *   disk_only       — columnar cache kept off-heap-pressure entirely
  *   none            — no persistence: every round re-derives the edge
  *                     frame from the bucketed table (scan +
  *                     exchange-free degree agg + elided repartition)
  *
  * Protocol = ProfileQuery's honest regime: `clearCache()` before every
  * iteration, checksum-force (never collect), steady state = the median
  * of the last 3 iterations once the curve flattens. Args:
  * [sfDir] [iters] [comma-list of postures].
  */
object PageRankStorageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf100")
    val iters = args.lift(1).map(_.toInt).getOrElse(6)
    val postures = args.lift(2).map(_.split(',').toSeq)
      .getOrElse(Seq("memory_and_disk", "disk_only", "none"))
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
    // pay the one-time edge-table build OUTSIDE any timed posture
    val t0 = System.nanoTime()
    graft.ops.Graph.interactionEdgeTable(spark, dir).count()
    println(f"[prprobe] edge table ensured in ${(System.nanoTime() - t0) / 1e9}%.1f s (one-time per dataset)")
    postures.foreach { p =>
      val storage = p match {
        case "none"            => None
        case "disk_only"       => Some(StorageLevel.DISK_ONLY)
        case "memory_and_disk" => Some(StorageLevel.MEMORY_AND_DISK)
        case other => sys.error(s"unknown posture $other")
      }
      val times = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val s0 = System.nanoTime()
        val out = graft.ops.Graph.pageRank(
          graft.ops.Graph.interactionEdgeTable(spark, dir),
          iters = 5, completeGraph = true, storage = storage)
        out.select(xxhash64(struct(out.columns.toIndexedSeq.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        out.unpersist()
        (System.nanoTime() - s0) / 1e9
      }
      val steady = times.takeRight(3).sorted.apply(1)
      println(f"[prprobe] $p%-16s iters: ${times.map(t => f"$t%.1f").mkString(" ")}  steady(median last 3): $steady%.1f s")
    }
    spark.stop()
  }
}
