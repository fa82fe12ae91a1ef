package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}

/** Distributed graph analytics over join-derived graphs — the second
  * iterative-compute family beside
  * [[Similarity.connectedComponents]] (label propagation): PageRank by
  * synchronous power iteration, the Pregel/GraphX shape expressed as plain
  * keyed joins + hash aggregates so Catalyst plans every round.
  *
  * All rank math is INTEGER micros: contributions use floor division
  * (`r div outdeg`), damping is `150000 + (85·Σ) div 100` — every engine
  * computes bit-identical BIGINTs in any summation order, so a fixed
  * iteration count is fully DuckDB-oracle-able (the oracle unrolls the
  * same recurrence as nested CTEs). The floor losses mean total mass is
  * not exactly conserved — deliberate: deterministic beats
  * cosmetically-normalized for a verified engine; ranks remain a correct
  * relative ordering.
  */
object Graph {

  // ------------------------------------------------ persisted edge tables

  /** Test hook: forget the per-session "already ensured" keys so a spec
    * can drive the catalog-miss paths (rebuild, re-register) in one JVM. */
  private[graft] def resetEdgeTableRegistryForTests(): Unit = Materialize.resetForTests()

  /** The r11 verdict's one architecture item: every graph query used to
    * rebuild its edge frame from `lineitem ⋈ orders` COLD, per query —
    * the honest-protocol correction measured that one scan at ~500 s of
    * khop's sf100 cold time, paid again by pagerank/labelprop/triangles.
    * At 100 TB nobody derives edges per query: the edge list is
    * materialized ONCE per dataset as a bucketed-by-`src` parquet table
    * and every graph query reads it. All the machinery (source
    * fingerprinting, cross-JVM re-registration, one-file-per-bucket
    * writes, stale-sibling cleanup) lives in [[Materialize]], shared with
    * the relational tier's bucketed fact copies. */
  private def ensureEdgeTable(spark: SparkSession, dir: String, kind: String)
                             (build: => DataFrame): DataFrame =
    // Bucket count = the session's shuffle partitions (r12 hardcoded 32,
    // which kept the planner's repartition($"src") elision tied to one
    // lucky SPARK_GRAFT_CPUS value). The bucket spec is part of the table
    // name (Materialize), so sessions sized differently coexist: each
    // reads/builds the table whose bucketing its own planner can elide.
    spark.table(Materialize.ensureBucketedTable(spark,
      s"edges_${kind}_$dir", "src",
      buckets = spark.sessionState.conf.numShufflePartitions,
      sourcePaths = Seq(s"$dir/lineitem.parquet", s"$dir/orders.parquet"))(build))

  /** One synchronous PageRank round over an edge list that already carries
    * `outdeg` on the source: ranks shuffle on the join key, contributions
    * hash-aggregate on dst (map-side partial sums), and isolated /
    * no-inbound nodes fall back to the damping floor via the left join.
    */
  private def step(nodes: DataFrame, ed: DataFrame, ranks: DataFrame,
                   completeGraph: Boolean): DataFrame = {
    val summed = ed.join(ranks, ed("src") === ranks("node"))
      .select(ed("dst"), expr("r div outdeg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("s_in"))
    if (completeGraph)
      // every node has an in-edge (e.g. a symmetrized edge set): the
      // aggregate's key set IS the node set — skip the per-round
      // node-completion join entirely (one join fewer per iteration)
      summed.select(col("dst").as("node"),
        expr("CAST(150000 + (85 * s_in) div 100 AS BIGINT)").as("r"))
    else
      nodes.join(summed, nodes("node") === summed("dst"), "left")
        .select(nodes("node"),
          expr("CAST(150000 + (85 * coalesce(s_in, CAST(0 AS BIGINT))) div 100 AS BIGINT)").as("r"))
  }

  /** Fixed-iteration PageRank over an arbitrary directed edge frame
    * (columns `src`, `dst`). Exposed for tests; [[pageRankQuery]] wraps it
    * over the supplier↔customer interaction graph.
    *
    * Scale shape: the edge list (+ out-degrees) is the only re-used frame —
    * persisted once DISK_ONLY (probe-chosen default; rationale at
    * [[pageRankPreDeg]]) over the pre-bucketed table, read by every
    * round. Each round is one
    * shuffle join (ranks onto edges by src) + one hash agg (by dst) + one
    * left join back to the node set — no driver round-trips at all for a
    * fixed K, unlike the convergence-tested CC loop. K=5 keeps lineage
    * ~15 operators deep: no checkpoint needed; a convergence-driven
    * variant would reuse [[Similarity.connectedComponents]]'s
    * checkpoint-every-5 cadence. The returned frame is materialized
    * (cache + count) before the working caches are released, so callers
    * get a computed result, not a live dependency on dropped caches. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               completeGraph: Boolean = false,
               storage: Option[org.apache.spark.storage.StorageLevel] =
                 Some(org.apache.spark.storage.StorageLevel.DISK_ONLY)): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    pageRankPreDeg(edges.join(deg, "src"), iters, completeGraph, storage)
  }

  /** PageRank loop over an edge frame that already carries `outdeg`.
    * (Kept as the seam the r12 denormalized-outdeg experiment used; the
    * registered query goes through [[pageRank]] — the per-query degree
    * aggregation over the bucketed table measured as cheap as reading a
    * persisted outdeg column, see [[interactionEdgeTable]].) */
  private[graft] def pageRankPreDeg(withDeg: DataFrame, iters: Int,
                                    completeGraph: Boolean,
                                    storage: Option[org.apache.spark.storage.StorageLevel] =
                                      Some(org.apache.spark.storage.StorageLevel.DISK_ONLY)): DataFrame = {
    // Pre-hash-partition the cached edge frame on src BEFORE caching
    // (kHopQuery's measured pattern, applied here in r11): without this
    // the cache holds the SCAN's partitioning and every round's
    // ranks⋈edges join re-shuffles the full edge side — 5 avoidable
    // edge-sized exchanges per query. (Over the bucketed edge table the
    // repartition is planner-elided — buckets == shuffle partitions.)
    // Partitioned on the join key, each round shuffles only the
    // (node-sized) ranks frame; the per-round dst aggregation still
    // shuffles, but partial aggregation collapses it to per-partition
    // partial sums first. Physical layout only — the integer rank math is
    // summation-order-independent, so the oracle hash is untouched
    // (Verify gates it).
    // Default storage = DISK_ONLY, chosen on tools/PageRankStorageProbe
    // evidence (r12 verdict item 2; full tables in SCALE.md round 13).
    // Steady medians, clearCache protocol, 6 iters:
    //   sf0.1 (8g heap):  m_a_d 2.1 s | disk_only 2.0 s | none 2.0 s
    //   sf10 (100g heap): m_a_d 43.5 s band 13.8-82.2 | disk_only 13.4 s
    //                     flat | none 24.5 s
    //   sf100 (100g heap): m_a_d 211 s band 154-226 | disk_only 212 s
    //                     band 188-249 | none 238 s
    // At sf100 the 5 join rounds' shuffles dominate and the posture is a
    // wash; at sf10 MEMORY_AND_DISK's deserialized on-heap columnar
    // batches drive GC churn (3x slower, 6x variance) while DISK_ONLY's
    // serialized batches ride the OS page cache; at bench scale they tie.
    // DISK_ONLY is the one posture whose behavior is heap-size-invariant
    // — on a real cluster the frame is read 5 times and discarded, which
    // is exactly the page-cache-backed pattern. None = no persistence
    // (every round re-derives from the bucketed table: scan +
    // exchange-free deg agg + elided repartition) costs 13-80% and is
    // kept for callers whose edge frame is cheaper than its cache.
    val repart = withDeg.repartition(col("src"))
    val ed = storage.map(repart.persist).getOrElse(repart)
    val nodes = ed.select(col("src").as("node")).distinct().cache()
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      ranks = step(nodes, ed, ranks, completeGraph)
      // single state reference per round ⇒ linear analyzed-plan growth,
      // bounded by fixed K (IterativePlanGrowthSpec pins it)
      graft.plans.PlanGrowth.record("pageRankFixedK", i, ranks)
    }
    val out = ranks.cache()
    out.count() // materialize before releasing the frames it was built from
    if (storage.isDefined) ed.unpersist()
    nodes.unpersist()
    out
  }

  /** The query graph: lineitem⋈orders distinct (supplier, customer)
    * pairs, both directions, disjoint node encoding (supplier s → 2s,
    * customer c → 2c+1). */
  private[ops] def interactionEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, dir).select($"l_suppkey", $"l_orderkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("s"), $"o_custkey".as("c"))
      .distinct()
    pairs.select(($"s" * 2).as("src"), ($"c" * 2 + 1).as("dst"))
      .unionByName(pairs.select(($"c" * 2 + 1).as("src"), ($"s" * 2).as("dst")))
  }

  /** The interaction graph as a PERSISTED bucketed table (r11 verdict item
    * 1): identical edge set to [[interactionEdges]] — the oracle SQL still
    * derives from the base tables — but pagerank/khop read the
    * materialized table instead of re-running the fact join per query.
    *
    * Deliberately (src, dst) ONLY. A v2 that denormalized `outdeg` onto
    * every edge row (moving PageRank's per-query degree aggregation into
    * the build) was measured and REVERTED in r12: per-query pagerank was
    * a wash at sf10 (18.7–19.4 s vs 16.6–18.2) and sf100 (242–264 s vs
    * 192–303, overlapping noise bands) because the degree aggregation
    * over a src-bucketed table is exchange-free and cheap next to the 5
    * join rounds — while the one-time build nearly doubled (571 → 1016 s
    * at sf100) and the table grew 33%. SCALE.md round-12 notes carry the
    * measurements. */
  private[graft] def interactionEdgeTable(spark: SparkSession, dir: String): DataFrame =
    ensureEdgeTable(spark, dir, "inter")(interactionEdges(spark, dir))

  /** The SYMMETRIZED co-supplier graph, persisted and bucketed by src —
    * one table serves both co-supplier consumers: label propagation reads
    * it directly (its votes flow both ways), and the undirected pair list
    * is recovered exactly by `src < dst` ([[coSupplierPairsFromTable]])
    * since [[coSupplierEdges]] emits each pair once with u < v. */
  private[graft] def coSupplierSymTable(spark: SparkSession, dir: String): DataFrame =
    ensureEdgeTable(spark, dir, "cosup") {
      val p = coSupplierEdges(spark, dir)
      p.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(p.select(col("v").as("src"), col("u").as("dst")))
    }

  private[graft] def coSupplierPairsFromTable(spark: SparkSession, dir: String): DataFrame =
    coSupplierSymTable(spark, dir).filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))

  /** Plan-audit helper: ONE un-executed PageRank round over the query
    * graph. [[pageRankQuery]]'s returned frame is cache-materialized, so
    * its explain prints the whole 5-round lineage below an
    * InMemoryTableScan — this exposes the per-round shape (the thing
    * that repeats at scale) for DumpPlans instead. */
  def oneRoundPlan(spark: SparkSession, dir: String): DataFrame = {
    val edges = interactionEdgeTable(spark, dir)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // mirror the registered query's shape: persisted-table scan → deg
    // join (exchange-free over the bucketed scan) → repartition
    // (planner-elided, buckets == shuffle partitions) — in the registered
    // query this sits under a cache and pays once for all 5 rounds
    val ed = edges.join(deg, "src").repartition(col("src"))
    val nodes = ed.select(col("src").as("node")).distinct()
    step(nodes, ed, nodes.select(col("node"), lit(1000000L).as("r")),
      completeGraph = true)
  }

  /** PageRank over the bipartite supplier↔customer interaction graph:
    * lineitem⋈orders yields distinct (supplier, customer) pairs; each pair
    * contributes both directed edges (interaction as mutual endorsement),
    * so every node has in- and out-edges and no dangling-mass term is
    * needed. Node ids are disjointly encoded (supplier s → 2s, customer c
    * → 2c+1). The handful of suppliers × thousands of customers makes the
    * supplier side massively hot — exactly the skew AQE handles at the
    * contribution aggregate (hot dst keys split at runtime). */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pageRank(interactionEdgeTable(spark, dir), iters = 5, completeGraph = true)
      .select($"node", ($"node" % 2).cast("int").as("node_type"),
        expr("node div 2").as("entity_id"), $"r".as("rank_micros"))
  }

  private val pageRankSql = {
    def stepSql(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.node,
         |         CAST(150000 + (85 * COALESCE(SUM(x.contrib), 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, p.r // e.outdeg AS contrib
         |    FROM ed e JOIN $prev p ON e.src = p.node
         |  ) x ON n.node = x.node
         |  GROUP BY n.node
         |)""".stripMargin
    val steps = (1 to 5).map(i => stepSql(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), edges AS (
       |  SELECT s*2 AS src, c*2+1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT c*2+1 AS src, s*2 AS dst FROM pairs
       |), deg AS (
       |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
       |), ed AS (
       |  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src
       |), nodes AS (
       |  SELECT DISTINCT src AS node FROM ed
       |), r0 AS (
       |  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |),
       |$steps
       |SELECT node, CAST(node % 2 AS INTEGER) AS node_type,
       |       node // 2 AS entity_id, r AS rank_micros
       |FROM r5""".stripMargin
  }

  /** CONVERGENCE-mode PageRank (r13 verdict item 6): iterate until
    * `max |Δr| < eps` micros or `maxIters`, whichever first — the
    * stopping rule production PageRank actually uses, beside the oracled
    * fixed-K variant. The integer rank math makes the rule fully
    * deterministic (bit-identical deltas in any summation order), so the
    * whole loop REMAINS DuckDB-oracle-able: the oracle unrolls maxIters
    * steps with per-step max-delta CTEs and selects the first converged
    * iteration — "first `it` with delta < eps, else maxIters" is the
    * query's contract on BOTH sides, at any scale factor (no SF-tuned
    * constant: a corpus that converges slower than maxIters caps
    * identically in engine and oracle).
    *
    * Shape per round: the fixed-K [[step]] plus a node-sized join+max-agg
    * convergence test — AMORTIZED to one driver round-trip per
    * `checkEvery` rounds (r14 verdict item 4): rounds accumulate
    * unchecked, then ONE job computes every pending round's max-delta as
    * a unioned keyed aggregate and the FIRST qualifying round wins —
    * byte-identical output to the per-iteration check (same "first `it`
    * with delta < eps" rule, no monotonicity assumption: every computed
    * round's delta is inspected, oldest first), at the price of at most
    * `checkEvery - 1` overshoot iterations of wasted step work. The
    * frames involved are node-sized, never edge-sized. Lineage is
    * truncated on [[Similarity.connectedComponents]]'s checkpoint-every-5
    * cadence, cache-first with a localCheckpoint fallback when the
    * session has no checkpoint dir (ADVICE r14 — previously a >=5-round
    * convergence in a dir-less session threw). Returns the converged
    * ranks (cache-materialized) and the iteration count actually run. */
  private[graft] def pageRankConverged(edges: DataFrame, eps: Long,
      maxIters: Int,
      storage: Option[org.apache.spark.storage.StorageLevel] =
        Some(org.apache.spark.storage.StorageLevel.DISK_ONLY),
      checkEvery: Int = 2): (DataFrame, Int) = {
    // ADVICE r15: 0 would throw ArithmeticException at `it % checkEvery`
    // and a negative value silently disables every mid-loop probe (all
    // runs overshoot to maxIters before the tail runCheck) — reject both
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    val spark = edges.sparkSession
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val repart = edges.join(deg, "src").repartition(col("src"))
    val ed = storage.map(repart.persist).getOrElse(repart)
    val nodes = ed.select(col("src").as("node")).distinct().cache()
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    val held = scala.collection.mutable.Buffer.empty[DataFrame]
    // rounds computed since the last convergence probe, oldest first:
    // (iteration number, that round's ranks, the previous round's ranks)
    val unchecked = scala.collection.mutable.Buffer.empty[(Int, DataFrame, DataFrame)]
    var firstConv = -1
    var convFrame: DataFrame = null
    var it = 0
    def runCheck(): Unit = if (firstConv < 0 && unchecked.nonEmpty) {
      val diffs = unchecked.map { case (i, cur, prv) =>
        cur.join(prv.select(col("node"), col("r").as("r_prev")), "node")
          .select(lit(i).as("it"), abs(col("r") - col("r_prev")).as("d"))
      }.reduce(_.unionByName(_))
      // max over zero rows is null (empty node set) — read through the
      // null guard and treat it as delta 0: an empty graph is converged
      // (ADVICE r14: the old per-round .getLong NPE'd here)
      val byIt = diffs.groupBy(col("it")).agg(max(col("d")).as("d")).collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
      unchecked.foreach { case (i, cur, _) =>
        if (firstConv < 0 && byIt.getOrElse(i, 0L) < eps) {
          firstConv = i; convFrame = cur
        }
      }
      unchecked.clear()
    }
    while (it < maxIters && firstConv < 0) {
      // complete-graph step: the callers feed SYMMETRIZED edge sets,
      // where every node has an in-edge (same contract as labelProp)
      val next = step(nodes, ed, ranks, completeGraph = true)
      it += 1
      val cached =
        if (it % 5 == 0) {
          if (spark.sparkContext.getCheckpointDir.isDefined) {
            // cache first: reliable checkpointing runs a SECOND job to
            // write the files, which would otherwise recompute the
            // round's join+agg from lineage (the Similarity.cc pattern)
            next.cache()
            val cp = next.checkpoint(true)
            next.unpersist()
            cp
          } else next.localCheckpoint(true)
        } else next.cache()
      held += cached
      graft.plans.PlanGrowth.record("pageRankConverged", it, cached)
      unchecked += ((it, cached, ranks))
      ranks = cached
      if (it % checkEvery == 0) runCheck()
    }
    runCheck() // tail rounds when maxIters is not a multiple of checkEvery
    val (outRanks, itersRun) =
      if (firstConv >= 0) (convFrame, firstConv) else (ranks, it)
    outRanks.count() // materialize before releasing the working frames
    held.foreach(h => if (h ne outRanks) h.unpersist())
    if (storage.isDefined) ed.unpersist()
    nodes.unpersist()
    (outRanks, itersRun)
  }

  /** Registered query: PageRank-to-convergence over the symmetrized bulk
    * co-supplier graph (eps = 10000 micros ≈ 1% of the initial rank,
    * cap 30) — final rank per supplier plus the iteration count the loop
    * actually ran, emitted as a column so the oracle pins the STOPPING
    * RULE, not just the final ranks. */
  def pageRankConvQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (ranks, iters) = pageRankConverged(coSupplierSymTable(spark, dir),
      eps = 10000L, maxIters = 30)
    ranks.select($"node".as("suppkey"), $"r".as("rank_micros"),
      lit(iters).as("iters_run"))
  }

  private val pageRankConvSql = {
    val maxIters = 30
    val eps = 10000L
    // r_i referenced by r_{i+1}, d_{i+1} and allr — MATERIALIZED keeps
    // DuckDB from inlining the chain into exponential re-evaluation
    def stepSql(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |         CAST(150000 + (85 * SUM(p.r // e.outdeg)) // 100 AS BIGINT) AS r
         |  FROM ed e JOIN $prev p ON e.src = p.node
         |  GROUP BY e.dst
         |)""".stripMargin
    def deltaSql(prev: String, cur: String, d: String): String =
      s"""$d AS MATERIALIZED (
         |  SELECT MAX(ABS(a.r - b.r)) AS d FROM $cur a JOIN $prev b ON a.node = b.node
         |)""".stripMargin
    val steps = (1 to maxIters).flatMap(i =>
      Seq(stepSql(s"r${i - 1}", s"r$i"), deltaSql(s"r${i - 1}", s"r$i", s"d$i")))
      .mkString(",\n")
    val deltas = (1 to maxIters)
      .map(i => s"SELECT $i AS it, (SELECT d FROM d$i) AS d").mkString(" UNION ALL ")
    val allr = (1 to maxIters)
      .map(i => s"SELECT $i AS it, node, r FROM r$i").mkString(" UNION ALL ")
    s"""WITH os AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
       |  WHERE l_quantity > 45
       |), pairs AS (
       |  SELECT DISTINCT a.s AS u, b.s AS v
       |  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |), sym AS MATERIALIZED (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL
       |  SELECT v AS src, u AS dst FROM pairs
       |), deg AS (
       |  SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src
       |), ed AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg FROM sym e JOIN deg d ON e.src = d.src
       |), nodes AS (
       |  SELECT DISTINCT src AS node FROM ed
       |), r0 AS MATERIALIZED (
       |  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |),
       |$steps,
       |deltas AS ($deltas),
       |pick AS (SELECT COALESCE(MIN(it), $maxIters) AS it FROM deltas WHERE d < $eps),
       |allr AS ($allr)
       |SELECT node AS suppkey, r AS rank_micros,
       |       CAST((SELECT it FROM pick) AS INTEGER) AS iters_run
       |FROM allr WHERE it = (SELECT it FROM pick)""".stripMargin
  }

  /** Bounded multi-source BFS (k-hop reachability) — the fourth graph
    * verb beside PageRank/triangles/label-prop: from a seed set, the
    * minimal hop distance of every node within `k` hops. The
    * neighborhood-growth curve it produces is the standard graph-mining
    * primitive for spam/fraud propagation radii and context expansion.
    *
    * Same Pregel-as-joins shape as [[pageRank]]: each round joins the
    * CURRENT frontier (nodes whose minimal distance is exactly d−1) to
    * the edge list, distincts the discovered layer, and folds it into the
    * (node, min dist) frame with one hash agg. BFS invariant: a shortest
    * path to a distance-d node ends at a distance-(d−1) node, so
    * frontier-only expansion loses nothing. Pure integer math end to end
    * ⇒ the DuckDB oracle replays it as a recursive CTE (set-semantics
    * UNION bounds the working set at nodes × k rows; MIN(dist) collapses
    * non-minimal discoveries exactly like the Spark-side agg).
    *
    * Scale shape: k fixed ⇒ k shuffle joins + k hash aggs, lineage ~5
    * ops/round (no checkpoint needed at k ≤ 5; a larger-k variant adopts
    * [[Similarity.connectedComponents]]'s cadence). The frontier filter
    * keeps each round's join input at ONE BFS layer, not the cumulative
    * reachable set.
    *
    * Returns (distances, release) — callers invoke `release()` after
    * materializing/consuming the result to drop the loop's cached rounds. */
  private[ops] def kHopReachability(edges: DataFrame, seeds: DataFrame,
                                    k: Int): (DataFrame, () => Unit) = {
    // Each round reads `dist` TWICE (frontier filter + union fold), so an
    // uncached loop doubles the lineage per round — 2^k plan blowup
    // (measured: 10.9 s → 2.6 s at sf0.1 for k=3). cache() fixes the
    // EXECUTED side of that: the cache manager substitutes one shared
    // InMemoryRelation per round at PHYSICAL-planning time, so both
    // consumers scan the same cached RDD and the DAG scheduler computes
    // each round exactly once even inside a single job. Per the r14
    // connectedComponents diagnosis, the ANALYZED logical tree is NOT
    // truncated by cache and still doubles per round — ~2^k nodes of
    // driver-side tree-walk cost, harmless at the fixed k = 3 (≤ ~8× one
    // round's plan; IterativePlanGrowthSpec pins that bound) but the
    // reason a larger-k variant must adopt connectedComponents' per-round
    // LogicalRDD flatten, not just its checkpoint cadence. The r7 loop
    // also ran a count() per
    // round to materialize before releasing the superseded round — one
    // extra job and a full cache re-read per hop (r7 verdict item 7).
    // Dropping the per-round action and keeping every round marked until
    // the CALLER's one terminal action is strictly fewer jobs with
    // identical per-round work; the held state is k small (node, dist)
    // frames, released together via the returned thunk. A larger-k
    // variant would re-introduce a materialize-and-release cadence every
    // ~5 rounds (connectedComponents') to bound memory and lineage depth.
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    var dist = seeds.select(col("node"), lit(0).as("dist")).cache()
    cached += dist
    for (d <- 1 to k) {
      // No `.distinct()` on the frontier expansion (r17): the union-fold's
      // `groupBy(node).min(dist)` already dedupes, and its partial (map-side)
      // aggregation collapses duplicate dst rows before the exchange — the
      // explicit distinct was a SECOND full exchange of the same rows per
      // round (plans/r17/q_khop_bfs_{before,after}.txt: 3 exchanges saved
      // over k=3; identical rows by construction, oracle hash unchanged).
      val next = edges.join(dist.filter(col("dist") === d - 1),
          edges("src") === col("node"))
        .select(edges("dst").as("node"), lit(d).as("dist"))
      val folded = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .cache()
      cached += folded
      graft.plans.PlanGrowth.record("kHopReachability", d, folded)
      dist = folded
    }
    (dist, () => cached.foreach(_.unpersist()))
  }

  /** Registered query: 3-hop reachability over the interaction graph from
    * the 10%-of-suppliers seed set (s_suppkey % 10 == 0 — 10 seeds at the driver gate SF, 100 at sf0.1), reported as the
    * per-distance growth curve (node count + exact id sum per BFS layer —
    * the id sum pins layer MEMBERSHIP under the hash, not just size). */
  def kHopQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The edge frame is re-joined on src every round: pre-hash-partition
    // it ONCE before caching so the cached partitioning satisfies each
    // round's join requirement and only the (small) frontier side
    // shuffles — the iterative-graph analog of bucketing. Since r12 the
    // frame READS the persisted bucketed edge table instead of rebuilding
    // lineitem⋈orders per query (the honest-protocol correction measured
    // that rebuild at ~500 s of khop's sf100 cold time). BFS needs only
    // (src, dst): the explicit projection pins that contract even if the
    // persisted table ever grows columns.
    val edges = interactionEdgeTable(spark, dir).select($"src", $"dst")
      .repartition(col("src")).cache()
    val seeds = edges.select($"src".as("node")).distinct()
      .filter($"node" % 2 === 0 && expr("(node div 2) % 10") === 0)
    val (dist, release) = kHopReachability(edges, seeds, k = 3)
    val out = dist
      .groupBy($"dist")
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_node_ids"))
      .cache()
    out.count() // the ONE terminal action — materializes every BFS round once
    release()
    edges.unpersist()
    out
  }

  private val kHopSql =
    """WITH RECURSIVE pairs AS (
      |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), edges AS (
      |  SELECT s*2 AS src, c*2+1 AS dst FROM pairs
      |  UNION ALL
      |  SELECT c*2+1 AS src, s*2 AS dst FROM pairs
      |), seeds AS (
      |  SELECT DISTINCT src AS node FROM edges
      |  WHERE src % 2 = 0 AND (src // 2) % 10 = 0
      |), bfs(node, dist) AS (
      |  SELECT node, 0 FROM seeds
      |  UNION
      |  SELECT e.dst, b.dist + 1
      |  FROM bfs b JOIN edges e ON e.src = b.node
      |  WHERE b.dist < 3
      |), md AS (
      |  SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node
      |)
      |SELECT dist, COUNT(*) AS n_nodes, CAST(SUM(node) AS BIGINT) AS sum_node_ids
      |FROM md GROUP BY dist""".stripMargin

  /** Undirected supplier co-occurrence edges: suppliers u < v that both
    * appear in some common BULK order line (quantity > 45 — the filter is
    * pushed into the parquet scan). Per-order fanout is bounded by
    * lineitems-per-order (~7), so the self-join emits O(orders · 7²)
    * candidate pairs — never quadratic in suppliers. The bulk filter is
    * what keeps the GRAPH sparse: unfiltered, every supplier co-occurs
    * with nearly every other (sf0.1: 453k edges over 1,000 nodes, wedge
    * bound 823M — measured 23.6 s), while the bulk graph is 12k edges
    * with wedge bound 604k. Density control belongs to edge DERIVATION,
    * not the triangle algorithm. */
  private[ops] def coSupplierEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val os = Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 45)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("s")).distinct()
    os.as("a").join(os.as("b"), col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
  }

  /** Per-node triangle counts over an undirected edge frame (u < v).
    *
    * Edges are re-oriented from the LOWER to the HIGHER (degree, id)
    * endpoint before the two-hop join — the classic arboricity bound: a
    * hub of degree d contributes O(d²) wedge candidates under naive id
    * orientation, but under degree orientation every node's out-degree is
    * bounded by O(√edges), which is what keeps the wedge join alive on a
    * power-law graph at 100 TB. The triangle SET is orientation-invariant
    * (each unordered triangle is enumerated exactly once under any acyclic
    * orientation), so the oracle can verify with plain id orientation
    * while the engine runs the optimized one. */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    // edges feed the degree agg (twice via the union), the orientation
    // join and nothing else; deg feeds the orientation join (both sides)
    // and the final join-back — cache both or the upstream edge
    // derivation (a lineitem self-join here) recomputes per consumer
    val edges = edges0.cache()
    val deg = edges.select($"u".as("node"))
      .unionByName(edges.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("degree"))
      .cache()
    // orient u→v when (deg(u), u) < (deg(v), v): every out-neighborhood is
    // small, so the wedge self-join below never explodes on a hub
    val e = edges
      .join(deg.select($"node".as("u"), $"degree".as("du")), Seq("u"))
      .join(deg.select($"node".as("v"), $"degree".as("dv")), Seq("v"))
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), struct($"u".as("src"), $"v".as("dst")))
          .otherwise(struct($"v".as("src"), $"u".as("dst"))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .cache()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .join(e.as("e3"), col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val perNode = tri.select(explode(array($"a", $"b", $"c")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("n_tri"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select($"node", $"degree", coalesce($"n_tri", lit(0L)).as("n_tri"))
      .cache()
    out.count() // materialize before dropping the working caches
    e.unpersist()
    deg.unpersist()
    edges.unpersist()
    out
  }

  /** Plan-audit helper: the un-materialized triangle plan (the registered
    * query cache-materializes its output, hiding the wedge join under an
    * InMemoryRelation in explain output). */
  def trianglePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplierPairsFromTable(spark, dir)
    val e = edges.select($"u".as("src"), $"v".as("dst"))
    e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .join(e.as("e3"), col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .select(explode(array(col("e1.src"), col("e1.dst"), col("e2.dst"))).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("n_tri"))
  }

  /** Registered query: triangle census of the supplier co-occurrence
    * graph — per supplier its co-occurrence degree and the number of
    * supplier triangles (cliques of mutual co-occurrence) through it. */
  def triangleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    triangleCounts(coSupplierPairsFromTable(spark, dir))
      .select($"node".as("suppkey"), $"degree", $"n_tri")
  }

  private val triangleSql =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
      |  WHERE l_quantity > 45
      |), pairs AS (
      |  SELECT DISTINCT a.s AS u, b.s AS v
      |  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
      |), deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      |    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
      |  ) GROUP BY node
      |), tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM pairs e1
      |  JOIN pairs e2 ON e1.v = e2.u
      |  JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
      |), tn AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
      |    SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
      |    UNION ALL SELECT c AS node FROM tri
      |  ) GROUP BY node
      |)
      |SELECT d.node AS suppkey, d.degree,
      |       CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_tri
      |FROM deg d LEFT JOIN tn ON d.node = tn.node""".stripMargin

  /** Fixed-round label propagation (community detection): every node
    * starts labeled with its own id; each SYNCHRONOUS round relabels every
    * node with the MODE of its neighbors' labels (ties broken by smallest
    * label — the determinism knob async LPA lacks). Three rounds over the
    * symmetrized bulk co-supplier graph.
    *
    * Distinct from [[Similarity.connectedComponents]] (min-label
    * propagation → components): mode-voting converges to DENSE
    * neighborhoods, splitting a weakly-bridged component into
    * communities.
    *
    * Shape per round: one join (labels onto edges by src), one (dst,
    * label) count agg, one per-dst argmin — all keyed shuffles; no driver
    * traffic at all for fixed K (the same contract as [[pageRank]]). */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // symmetrize: votes flow both ways along each undirected edge
    labelPropagationSym(
      edges.select($"u".as("src"), $"v".as("dst"))
        .unionByName(edges.select($"v".as("src"), $"u".as("dst"))),
      iters)
  }

  /** Label-prop loop over an ALREADY-symmetric (src, dst) edge frame —
    * split out so [[labelPropQuery]] can feed the persisted symmetric
    * table directly instead of re-deriving the symmetrization it already
    * stores. Pre-hash-partitioned on src before caching (same rationale
    * as pageRank/kHopQuery): the per-round labels⋈sym join would
    * otherwise re-shuffle the full cached edge side every iteration. */
  private[ops] def labelPropagationSym(sym0: DataFrame, iters: Int): DataFrame = {
    val spark = sym0.sparkSession
    import spark.implicits._
    val sym = sym0.repartition($"src").cache()
    var labels = sym.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (i <- 1 to iters) {
      labels = sym.join(labels, sym("src") === labels("node"))
        .groupBy(sym("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        // mode with smallest-label tie-break: min over (-cnt, label) structs
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("cnt")).as("negc"), col("label"))).as("m"))
        .select(col("node"), col("m.label").as("label"))
      // single state reference per round ⇒ linear analyzed-plan growth,
      // bounded by the fixed small iters (IterativePlanGrowthSpec pins it)
      graft.plans.PlanGrowth.record("labelPropagationSym", i, labels)
    }
    val out = labels.cache()
    out.count() // materialize before releasing the edge cache
    sym.unpersist()
    out
  }

  /** Registered query: communities of the bulk co-supplier graph — the
    * final (node, community) labeling plus each community's size as a
    * join-back. */
  def labelPropQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = labelPropagationSym(coSupplierSymTable(spark, dir), iters = 3)
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select($"node".as("suppkey"), $"label".as("community"), $"community_size")
  }

  private val labelPropSql = {
    def round(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT e.dst AS node, l.label, COUNT(*) AS cnt,
         |           row_number() OVER (PARTITION BY e.dst ORDER BY COUNT(*) DESC, l.label) AS rn
         |    FROM sym e JOIN $prev l ON e.src = l.node
         |    GROUP BY e.dst, l.label
         |  ) WHERE rn = 1
         |)""".stripMargin
    val rounds = Seq(round("l0", "l1"), round("l1", "l2"), round("l2", "l3"))
      .mkString(",\n")
    s"""WITH os AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
       |  WHERE l_quantity > 45
       |), pairs AS (
       |  SELECT DISTINCT a.s AS u, b.s AS v
       |  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |), sym AS MATERIALIZED (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL
       |  SELECT v AS src, u AS dst FROM pairs
       |), l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS node, src AS label FROM sym
       |),
       |$rounds
       |SELECT l3.node AS suppkey, l3.label AS community, s.community_size
       |FROM l3 JOIN (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size FROM l3 GROUP BY label
       |) s ON l3.label = s.label""".stripMargin
  }

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_pagerank", pageRankQuery, Some(pageRankSql)),
    VerifiedQuery("q_pagerank_conv", pageRankConvQuery, Some(pageRankConvSql)),
    VerifiedQuery("q_triangle_count", triangleQuery, Some(triangleSql)),
    VerifiedQuery("q_label_prop", labelPropQuery, Some(labelPropSql)),
    VerifiedQuery("q_khop_bfs", kHopQuery, Some(kHopSql)),
  )
}
