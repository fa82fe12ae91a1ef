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
    // the explicit REPARTITION_BY_COL, which sits under the cache in the
    // registered queries (paid once per query) and is elided entirely
    // when shuffle.partitions == bucket count. Since r13 the bucket count
    // IS the session's shuffle partitions (no more hardcoded 32), so the
    // elision holds at any SPARK_GRAFT_CPUS — including this 4-partition
    // test session.
    val planted = """Exchange hashpartitioning\(src#\d+L?, \d+\), ENSURE_REQUIREMENTS"""
      .r.findAllIn(plan).size
    assert(planted == 0,
      s"planner re-shuffles the edge side on src despite the bucketed table:\n$plan")
  }

  test("a changed bucket spec misses the old table and REBUILDS — never re-declares old files") {
    // The r12 verdict's one latent wrong-answer path: cross-JVM
    // re-registration used to declare the CALLER'S bucket count over files
    // written under a previous one; Spark trusts bucket metadata to elide
    // exchanges, so a mis-declared table silently drops join matches. The
    // spec now lives in the table name: a spec change is a cache miss.
    val srcDir = java.nio.file.Files.createTempDirectory("graft-mvspec-").toFile
    val srcFile = new java.io.File(srcDir, "data.parquet")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v")
      .write.mode("overwrite").parquet(srcFile.getAbsolutePath)
    // explicit file:-scheme source URI: the machinery resolves every path
    // through Hadoop FileSystem (r12 verdict item 4 — any Hadoop-FS URI).
    // FIXED base string: each test run's fixture has a fresh fingerprint,
    // so the machinery's own stale-dataset cleanup garbage-collects the
    // previous run's directories — the fixture exercises it for free.
    def ensure(buckets: Int): String = Materialize.ensureBucketedTable(spark,
      "specdrift_fixture", "k", buckets, Seq("file:" + srcFile.getAbsolutePath)) {
      spark.read.parquet(srcFile.getAbsolutePath)
    }
    val name4 = ensure(4)
    // simulate a fresh JVM whose code asks for a different bucket count:
    // catalog + session keys forgotten, data files survive
    spark.sql(s"DROP TABLE $name4")
    Materialize.resetForTests()
    val name8 = ensure(8)
    assert(name8 != name4, "bucket-spec change must change the table identity")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val files8 = new java.io.File(wh, name8).listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(files8.length == 8,
      s"8-bucket table must be BUILT as 8 one-file buckets, found ${files8.length}")
    assert(spark.sql(s"DESC FORMATTED $name8").collect().exists(r =>
      r.getString(0).trim == "Num Buckets" && r.getString(1).trim == "8"),
      "catalog does not carry the 8-bucket spec")
    // same dataset version under another spec is a LIVE coexisting table
    assert(new java.io.File(wh, name4).exists(),
      "same-fingerprint sibling under another bucket spec must coexist, not be cleaned")
    // regenerate the dataset: all old-fingerprint siblings (both specs) are
    // deleted AND their catalog entries dropped with them (ADVICE r12)
    spark.range(200).selectExpr("id AS k", "id * 3 AS v")
      .write.mode("overwrite").parquet(srcFile.getAbsolutePath)
    Materialize.resetForTests()
    val nameNew = ensure(8)
    assert(nameNew != name8, "dataset regeneration must change the fingerprint")
    assert(!new java.io.File(wh, name8).exists() && !new java.io.File(wh, name4).exists(),
      "stale-dataset siblings must be deleted across ALL bucket specs")
    assert(!spark.catalog.tableExists(name8),
      "stale sibling's catalog entry must be dropped with its files")
    assert(spark.table(nameNew).count() == 200)
    spark.sql(s"DROP TABLE $nameNew")
    // external-table DROP keeps files; the next run's fresh fingerprint
    // would GC them, but don't rely on a next run existing
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
      f.delete()
    }
    rm(new java.io.File(wh, nameNew))
    rm(srcDir)
  }
}
