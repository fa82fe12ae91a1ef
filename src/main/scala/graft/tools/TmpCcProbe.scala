package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not registered): decompose cosineNearDupTransitive cost
  * at probe SF — pair build vs CC vs anti-join. */
object TmpCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tuning.Key, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    spark.sparkContext.setCheckpointDir(ckptRoot.getAbsolutePath)
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.Tables.embeddings(spark, dir)
    val pairs = graft.ops.Similarity.cosineNearDupBlocked(emb, maxRowsPerBlock = 4096)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    t("pairs count")(println("pairs=" + pairs.count()))
    val cached = pairs.cache()
    t("pairs cache")(cached.count())
    // replicate the CC loop with per-round timing
    val sym = cached.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(cached.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    t("sym materialize")(println("symEdges=" + sym.count()))
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")).cache()
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    var i = 0
    while (!converged && i < 20) {
      val round = t(s"round $i") {
        val neighborMin = sym
          .join(labels, sym("dst") === labels("doc_id"))
          .groupBy(sym("src").as("doc_id"))
          .agg(min(col("cluster")).as("nbr_min"))
        val prop = labels.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
        val jumped = prop.as("c").join(prop.as("p"), col("c.cluster") === col("p.doc_id"))
          .select(col("c.doc_id").as("doc_id"),
            least(col("c.cluster"), col("p.cluster")).as("cluster"))
        val every = sys.env.getOrElse("CC_CKPT_EVERY", "5").toInt
        val next =
          if ((i + 1) % every == 0) { jumped.cache(); val cp = jumped.checkpoint(true); jumped.unpersist(); cp }
          else jumped.cache()
        val s = Option(next.agg(sum(col("cluster").cast("decimal(38,0)")))
          .first().get(0).asInstanceOf[java.math.BigDecimal])
        if (sys.env.getOrElse("CC_MIDLOOP_UNPERSIST", "1") == "1") labels.unpersist()
        labels = next
        converged = s == prevSum
        prevSum = s
        s
      }
      println(s"[cc-probe]   round $i sum=$round converged=$converged")
      val planStr = labels.queryExecution.executedPlan.toString
      println(s"[cc-probe]   round $i plan lines=${planStr.linesIterator.size} " +
        s"imts=${"InMemoryTableScan".r.findAllIn(planStr).size}")
      i += 1
    }
    spark.stop()
  }
}
