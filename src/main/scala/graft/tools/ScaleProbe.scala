package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Tuning}

/** One-off sf1 scale probe for the ITERATIVE tier (r5 verdict #6): the
  * three loop-shaped operators — distributed connected components,
  * PageRank, triangle census — timed at bench SF (sf0.1) and at a
  * synthesized 10× corpus ("sf1"), to measure whether per-round cost
  * scales linearly with data (the flat-per-round claim in SCALE.md).
  *
  * The 10× corpus is 10 disjoint id-shifted copies of the sf0.1 input.
  * Document text is mutated per copy with a BIJECTIVE character rotation
  * (`translate` over [a-z0-9]): a bijection preserves every intra-copy
  * Jaccard similarity exactly (dup structure per copy == sf0.1) while
  * remapping every shingle, so cross-copy similarity collapses to
  * background noise. (A first attempt used a 6-char per-copy text PREFIX
  * — a prefix is precisely the small edit MinHash is designed to see
  * through, so all 10 copies of each doc formed a cross-copy clique:
  * 256 → 248k candidate edges. Kept as the ADVERSARIAL variant via
  * `--adversarial`, because surviving a 970× edge blow-up in 10× wall
  * clock is itself a scale datapoint.) Loop round counts are unchanged
  * by construction, so the time ratio isolates per-round data-volume
  * scaling — exactly the quantity the 100 TB claim rests on.
  *
  * PageRank per-round cost is derived by differencing fixed-iteration
  * runs (T(5)−T(3))/2 and (T(3)−T(1))/2 — no production code is
  * instrumented. Results are pasted into SCALE.md §"sf1 probe".
  */
object ScaleProbe {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tuning.Key, "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    spark.sparkContext.setCheckpointDir(ckpt.getAbsolutePath)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(f"[probe] host load at start: ${osBean.getSystemLoadAverage}%.1f")

    // ---------------------------------------------------------------- CC
    val adversarial = args.contains("--adversarial")
    val docs1 = Tuning.spread(Tables.documents(spark, dir))
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    def docsAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        val mutated =
          if (i == 0) $"text"
          else if (adversarial) concat(lit(s"copy$i "), $"text")
          else translate($"text", alpha, alpha.drop(i) + alpha.take(i))
        docs1.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
          mutated.as("text"), $"lang", $"source", $"n_chars")
      }.reduce(_ unionByName _)
    for ((label, copies) <- Seq(("sf0.1", 1), ("sf1", 10))) {
      val docs = docsAt(copies).cache()
      val nDocs = docs.count()
      val (cand, release) = graft.ops.SimilarityProfileAccess.detCandidates(docs)
      val nEdges = cand.count()
      val (secs, nNodes) = time {
        graft.ops.Similarity.connectedComponents(cand, localThreshold = 0L).count()
      }
      release(); docs.unpersist()
      println(f"[probe] cc_dist $label: docs=$nDocs edges=$nEdges nodes=$nNodes total=$secs%.1f s (load ${osBean.getSystemLoadAverage}%.1f)")
    }

    // ---------------------------------------------------------- PageRank
    // Edge derivation mirrors Graph.interactionEdges (bipartite
    // supplier↔customer interaction graph, both directions).
    val pairs = Tables.lineitem(spark, dir).select($"l_suppkey", $"l_orderkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("s"), $"o_custkey".as("c")).distinct()
    val prEdges1 = pairs.select(($"s" * 2).as("src"), ($"c" * 2 + 1).as("dst"))
      .unionByName(pairs.select(($"c" * 2 + 1).as("src"), ($"s" * 2).as("dst")))
    def prEdgesAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        prEdges1.select(($"src" + lit(i * 10000000L)).as("src"),
          ($"dst" + lit(i * 10000000L)).as("dst"))
      }.reduce(_ unionByName _)
    for ((label, copies) <- Seq(("sf0.1", 1), ("sf1", 10))) {
      val edges = prEdgesAt(copies).cache()
      val nEdges = edges.count()
      val ts = Seq(1, 3, 5).map { k =>
        val (secs, _) = time(Graph05.run(edges, k))
        k -> secs
      }.toMap
      edges.unpersist()
      val perRoundLo = (ts(3) - ts(1)) / 2
      val perRoundHi = (ts(5) - ts(3)) / 2
      println(f"[probe] pagerank $label: edges=$nEdges t1=${ts(1)}%.1f t3=${ts(3)}%.1f t5=${ts(5)}%.1f s; per-round r2-3=$perRoundLo%.1f r4-5=$perRoundHi%.1f s (load ${osBean.getSystemLoadAverage}%.1f)")
    }

    // --------------------------------------------------------- triangles
    // Edge derivation mirrors Graph.coSupplierEdges (bulk co-occurrence).
    val os = Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 45)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("s")).distinct()
    val triEdges1 = os.as("a").join(os.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
    def triEdgesAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        triEdges1.select(($"u" + lit(i * 1000000L)).as("u"),
          ($"v" + lit(i * 1000000L)).as("v"))
      }.reduce(_ unionByName _)
    for ((label, copies) <- Seq(("sf0.1", 1), ("sf1", 10))) {
      val edges = triEdgesAt(copies).cache()
      val nEdges = edges.count()
      val (secs, rows) = time(graft.ops.Graph.triangleCounts(edges).count())
      edges.unpersist()
      println(f"[probe] triangles $label: edges=$nEdges nodes=$rows total=$secs%.1f s (load ${osBean.getSystemLoadAverage}%.1f)")
    }

    spark.stop()
  }

  /** Fixed-iteration PageRank run (materialized, caches released). */
  private object Graph05 {
    def run(edges: DataFrame, iters: Int): Long = {
      val out = graft.ops.Graph.pageRank(edges, iters, completeGraph = true)
      val n = out.count()
      out.unpersist()
      n
    }
  }
}
