package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize-once machinery for derived BUCKETED tables — the pattern a
  * 100 TB deployment uses for every expensive, reusable derivation: pay
  * the build once per dataset, then every consumer joins/aggregates
  * against a pre-bucketed table with no exchange on the bucket key.
  * Extracted from the graph tier's edge tables (r12) so the relational
  * tier's bucketed fact copies ([[Scale.ensureBucketedTables]]) share one
  * audited implementation.
  *
  * Contract:
  *  - The table name embeds a FINGERPRINT of the source files (names +
  *    sizes + mtimes): a regenerated dataset misses the old name and
  *    rebuilds; stale-fingerprint siblings are deleted at build time. (At
  *    100 TB the catalog's own table versioning plays this role.)
  *  - Cross-JVM reuse: the default in-memory session catalog forgets
  *    table METADATA at JVM exit, but the bucketed data files survive
  *    (bucket ids are carried in the file names) — a later session
  *    re-registers the existing location with the identical bucket spec
  *    instead of rebuilding. A failed build leaves no `_SUCCESS`, so the
  *    next call rebuilds rather than reading a partial table.
  *  - The build is repartitioned on the bucket column BEFORE the bucketed
  *    write (Spark's bucket hash == repartition hash), so each bucket is
  *    exactly ONE file — without it every upstream task writes a sliver
  *    of every bucket (measured: 2,049 files for the sf100 edge table, a
  *    listing+open tax on every downstream scan; 32 after).
  */
private[graft] object Materialize {

  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val lock = new Object

  private[graft] def tag(s: String): String = s.replaceAll("[^A-Za-z0-9]", "_")

  /** Test hook: forget the per-session "already ensured" keys so a spec
    * can drive the catalog-miss paths (rebuild, re-register) in one JVM. */
  private[graft] def resetForTests(): Unit = ready.clear()

  /** Fingerprint of the given source paths (files or directories). */
  private def fingerprint(paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        val fs = f.listFiles()
        if (fs != null) fs.sortBy(_.getName).foreach(walk)
      } else md.update(s"${f.getName}:${f.length}:${f.lastModified}".getBytes("UTF-8"))
    paths.foreach(p => walk(new java.io.File(p)))
    md.digest().take(4).map("%02x".format(_)).mkString
  }

  /** Ensure `graft_mv_<base>_<fingerprint>` exists as a bucketed+sorted
    * parquet table over `bucketCol` and return its catalog NAME (read it
    * with `spark.table`). `build` runs at most once per dataset version
    * (across JVMs). */
  def ensureBucketedTable(spark: SparkSession, base: String, bucketCol: String,
                          buckets: Int, sourcePaths: Seq[String])
                         (build: => DataFrame): String = {
    val name = s"graft_mv_${tag(base)}_${fingerprint(sourcePaths)}"
    val key = s"${spark.hashCode()}:$name"
    if (!ready.contains(key)) lock.synchronized {
      if (!ready.contains(key)) {
        if (!spark.catalog.tableExists(name)) {
          val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          val loc = new java.io.File(warehouse, name)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
            f.delete()
          }
          if (new java.io.File(loc, "_SUCCESS").exists()) {
            // previous JVM built it: re-register the location (schema from
            // the files themselves; bucket spec must match the write below)
            val cols = spark.read.parquet(loc.getAbsolutePath).schema.fields
              .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
            spark.sql(s"CREATE TABLE $name ($cols) USING parquet " +
              s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS " +
              s"LOCATION '${loc.toURI}'")
          } else {
            // drop partial leftovers and stale-fingerprint siblings
            val stale = Option(new java.io.File(warehouse).listFiles()).getOrElse(Array.empty)
              .filter(f => f.getName.startsWith(s"graft_mv_${tag(base)}_") &&
                f.getName != name)
            (stale :+ loc).filter(_.exists()).foreach(rm)
            build.repartition(buckets, col(bucketCol)).write.mode("overwrite")
              .bucketBy(buckets, bucketCol).sortBy(bucketCol)
              .option("path", loc.getAbsolutePath)
              .saveAsTable(name)
          }
        }
        ready.add(key)
      }
    }
    name
  }
}
