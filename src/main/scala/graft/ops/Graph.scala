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
    * cached once, read by every round (at 100 TB: persist to
    * MEMORY_AND_DISK or pre-bucket by src, same plan). Each round is one
    * shuffle join (ranks onto edges by src) + one hash agg (by dst) + one
    * left join back to the node set — no driver round-trips at all for a
    * fixed K, unlike the convergence-tested CC loop. K=5 keeps lineage
    * ~15 operators deep: no checkpoint needed; a convergence-driven
    * variant would reuse [[Similarity.connectedComponents]]'s
    * checkpoint-every-5 cadence. The returned frame is materialized
    * (cache + count) before the working caches are released, so callers
    * get a computed result, not a live dependency on dropped caches. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               completeGraph: Boolean = false): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(deg, "src").cache()
    val nodes = ed.select(col("src").as("node")).distinct().cache()
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) ranks = step(nodes, ed, ranks, completeGraph)
    val out = ranks.cache()
    out.count() // materialize before releasing the frames it was built from
    ed.unpersist()
    nodes.unpersist()
    out
  }

  /** The query graph: lineitem⋈orders distinct (supplier, customer)
    * pairs, both directions, disjoint node encoding (supplier s → 2s,
    * customer c → 2c+1). */
  private def interactionEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, dir).select($"l_suppkey", $"l_orderkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("s"), $"o_custkey".as("c"))
      .distinct()
    pairs.select(($"s" * 2).as("src"), ($"c" * 2 + 1).as("dst"))
      .unionByName(pairs.select(($"c" * 2 + 1).as("src"), ($"s" * 2).as("dst")))
  }

  /** Plan-audit helper: ONE un-executed PageRank round over the query
    * graph. [[pageRankQuery]]'s returned frame is cache-materialized, so
    * its explain prints the whole 5-round lineage below an
    * InMemoryTableScan — this exposes the per-round shape (the thing
    * that repeats at scale) for DumpPlans instead. */
  def oneRoundPlan(spark: SparkSession, dir: String): DataFrame = {
    val edges = interactionEdges(spark, dir)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(deg, "src")
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
    pageRank(interactionEdges(spark, dir), iters = 5, completeGraph = true)
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

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_pagerank", pageRankQuery, Some(pageRankSql)),
  )
}
