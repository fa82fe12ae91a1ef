package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe-scale ANN recall measurement (r11 verdict item 2): the
  * batch/adaptive sign-LSH family's wall-clock is proven sub-quadratic
  * through sf100, but its recall floors were only fixture-tested (4.8k
  * clustered rows) — nothing measured recall at the WIDENED key widths the
  * adaptive schedule selects at probe scale (bits=11 at sf100). This
  * measures recall@k against brute-force ground truth on a sampled query
  * set, at whatever corpus `sfDir` holds.
  *
  * Method: ground truth = [[graft.ops.Similarity.bruteForceTopK]] (the
  * oracled exact path) for query ids 0..nSample-1; candidates under test =
  * `lshDetTopKAdaptive` with the same query ids, and `lshDetTopKBatch`
  * (whose query set `vec_id < max(3, n/1000)` CONTAINS the sample whenever
  * n ≥ 1000·nSample — asserted) filtered to the sample. Recall@k = |LSH ∩
  * exact| / |exact| over the sampled (qid, vec_id) pairs. Query ids are
  * synthetic row ids with no ordering semantics, so the id-prefix sample
  * is as unbiased as any.
  *
  * Usage: runMain graft.tools.AnnRecallProbe [sfDir] [nSample] [k]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val nSample = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
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
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, dir).cache()
    val n = emb.count()
    println(s"[ann-recall] corpus $dir n=$n sample=$nSample k=$k " +
      s"adaptive_bits=${graft.ops.Similarity.adaptiveSignBits(n)}")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

    var t0 = System.nanoTime()
    val exact = pairs(graft.ops.Similarity.bruteForceTopK(emb, nSample, k))
    val tExact = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val adaptive = pairs(
      graft.ops.Similarity.lshDetTopKAdaptive(emb, nSample.toLong, k))
    val tAdaptive = (System.nanoTime() - t0) / 1e9

    // the batch query's own query set must contain the sample
    require(math.max(3L, n / 1000L) >= nSample,
      s"batch query set max(3, n/1000)=${math.max(3L, n / 1000L)} < sample $nSample")
    t0 = System.nanoTime()
    val batch = pairs(graft.ops.Similarity.lshDetTopKBatch(emb, k)
      .filter($"qid" < nSample))
    val tBatch = (System.nanoTime() - t0) / 1e9

    def recall(got: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 0.0 else got.intersect(exact).size.toDouble / exact.size
    println(f"[ann-recall] exact pairs=${exact.size} wall=$tExact%.1fs")
    println(f"[ann-recall] q_ann_lsh_adaptive recall@$k = ${recall(adaptive)}%.4f " +
      f"(pairs=${adaptive.size}, wall=$tAdaptive%.1fs)")
    println(f"[ann-recall] q_ann_batch        recall@$k = ${recall(batch)}%.4f " +
      f"(pairs=${batch.size}, wall=$tBatch%.1fs, full batch = max(3, n/1000) queries)")
    spark.stop()
  }
}
