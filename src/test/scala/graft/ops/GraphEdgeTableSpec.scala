package graft.ops

import org.apache.spark.sql.functions._

/** Pins the r11-verdict-item-1 contract: the graph tier reads a PERSISTED
  * bucketed-by-src edge table instead of rebuilding `lineitem ⋈ orders`
  * per query — with (a) content identical to the raw derivation (the
  * DuckDB oracles still derive from base tables, so this is what keeps
  * the hashes green), (b) cross-JVM reuse via location re-registration
  * (no rebuild when the files already exist), and (c) the bucketed scan
  * actually engaging so the per-round joins add no src-side exchange.
  */
class GraphEdgeTableSpec extends graft.SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("interaction edge table content == raw lineitem-join-orders derivation") {
    val table = Graph.interactionEdgeTable(spark, dir)
      .select($"src", $"dst").as[(Long, Long)].collect().toSet
    val raw = Graph.interactionEdges(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(table == raw, s"persisted edge set diverges from the derivation " +
      s"(${(table diff raw).take(3)} extra, ${(raw diff table).take(3)} missing)")
  }

  test("co-supplier pairs recovered from the symmetric table == raw derivation") {
    val table = Graph.coSupplierPairsFromTable(spark, dir)
      .as[(Long, Long)].collect().toSet
    val raw = Graph.coSupplierEdges(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(table == raw)
    // and the symmetric table is exactly both orientations of the pairs
    val sym = Graph.coSupplierSymTable(spark, dir).as[(Long, Long)].collect().toSet
    assert(sym == raw ++ raw.map { case (u, v) => (v, u) })
  }

  test("existing files are RE-REGISTERED, not rebuilt, after the catalog forgets them") {
    // first touch guarantees the table exists and is registered
    val before = Graph.interactionEdgeTable(spark, dir).count()
    val tableName = spark.catalog.listTables()
      .filter($"name".startsWith("graft_mv_edges_inter_"))
      .filter($"name".contains("sf0_001"))
      .select($"name").as[String].head()
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tableName)
    val successMtime = new java.io.File(loc, "_SUCCESS").lastModified()
    assert(successMtime > 0, s"no _SUCCESS under $loc")
    // simulate a fresh JVM: catalog forgets the table, data files survive
    spark.sql(s"DROP TABLE $tableName")
    Graph.resetEdgeTableRegistryForTests()
    val after = Graph.interactionEdgeTable(spark, dir).count()
    assert(after == before)
    assert(new java.io.File(loc, "_SUCCESS").lastModified() == successMtime,
      "edge table was rebuilt — the re-register path must reuse existing files")
    // and the re-registered table still carries the bucket spec — probe
    // with a distribution-demanding plan (a BARE scan reports "Bucketed:
    // false (disabled by query planner)" by design: autoBucketedScan skips
    // bucketing when no operator wants the distribution)
    val scan = Graph.interactionEdgeTable(spark, dir)
      .groupBy($"src").count().queryExecution.executedPlan.toString
    assert(scan.contains("Bucketed: true"),
      s"re-registered table scan is not bucketed:\n$scan")
  }

  test("registered graph queries read the persisted table: no fact join below the edge cache") {
    // kHopQuery's cached edge frame must be (bucketed scan → repartition,
    // elided when redundant), NOT the old lineitem⋈orders rebuild. The
    // un-materialized one-round plan exposes the same shape for pagerank.
    val plan = Graph.oneRoundPlan(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_edges_inter"),
      s"pagerank round does not read the persisted edge table:\n$plan")
    assert(!plan.contains("lineitem"),
      s"pagerank round still rebuilds edges from the fact tables:\n$plan")
    // the bucketed read engages (the round's joins want src distribution)
    assert(plan.contains("Bucketed: true"),
      s"bucketed scan did not engage for the round join:\n$plan")
    // and the PLANNER inserts no src exchange — the only allowed one is
    // the explicit REPARTITION_BY_COL, which (a) sits under the cache in
    // the registered queries (paid once per query) and (b) is elided
    // entirely when shuffle.partitions == bucket count (the production
    // session sets both to the core count; this test session runs 4
    // partitions against 32 buckets, so it survives here)
    val planted = """Exchange hashpartitioning\(src#\d+L?, \d+\), ENSURE_REQUIREMENTS"""
      .r.findAllIn(plan).size
    assert(planted == 0,
      s"planner re-shuffles the edge side on src despite the bucketed table:\n$plan")
  }
}
