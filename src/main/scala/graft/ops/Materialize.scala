package graft.ops

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  *    sizes + mtimes) AND the bucket spec (bucket column + bucket count;
  *    the sort spec is definitionally the bucket column in this API). A
  *    regenerated dataset OR a changed bucket spec misses the old name
  *    and rebuilds — the r12 verdict's one latent wrong-answer path was
  *    re-registering old files under a NEW bucket count, which Spark
  *    would trust to elide exchanges and silently drop join matches.
  *    Tables for the same dataset under DIFFERENT bucket specs coexist
  *    (sessions sized differently share a warehouse); only stale
  *    DATASET versions (fingerprint mismatch) are cleaned. (At 100 TB
  *    the catalog's own table versioning plays this role.)
  *  - The name also embeds a short hash of the RAW base string: `tag` is
  *    lossy (all non-alphanumerics map to `_`), so without it distinct
  *    bases like `/data/sf0.1` and `/data/sf0/1` would collide on one
  *    name prefix and the stale-sibling cleanup could delete a live
  *    table of the other dataset.
  *  - Cross-JVM reuse: the default in-memory session catalog forgets
  *    table METADATA at JVM exit, but the bucketed data files survive
  *    (bucket ids are carried in the file names) — a later session
  *    re-registers the existing location with the identical bucket spec
  *    instead of rebuilding. A failed build leaves no `_SUCCESS`, so the
  *    next call rebuilds rather than reading a partial table. As a final
  *    defense the re-register path validates that no on-disk bucket id
  *    reaches the declared bucket count (possible only through manual
  *    file tampering now that the spec is in the name) and rebuilds
  *    instead of mis-declaring.
  *  - Stale-sibling cleanup DROPs the catalog entries and evicts the
  *    "ready" keys of the directories it deletes — a registered table
  *    must never outlive its files (ADVICE r12).
  *  - All filesystem access goes through Hadoop [[FileSystem]] resolved
  *    from each path's own scheme, so the machinery works over any
  *    Hadoop-FS URI (HDFS, S3A, ...) exactly as it does over the local
  *    `file:` warehouse the sandbox exercises.
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

  private def shortHash(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString

  /** Test hook: forget the per-session "already ensured" keys so a spec
    * can drive the catalog-miss paths (rebuild, re-register) in one JVM. */
  private[graft] def resetForTests(): Unit = ready.clear()

  /** Fingerprint of the given source paths (files or directories),
    * resolved through each path's own Hadoop filesystem. */
  private def fingerprint(spark: SparkSession, paths: Seq[String]): String = {
    val conf = spark.sessionState.newHadoopConf()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def walk(fs: FileSystem, st: FileStatus): Unit =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName).foreach(walk(fs, _))
      else md.update(s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
        .getBytes("UTF-8"))
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) walk(fs, fs.getFileStatus(path))
    }
    md.digest().take(4).map("%02x".format(_)).mkString
  }

  /** Bucket ids present in a bucketed table directory's file names
    * (Spark writes `part-PPPPP-<uuid>_BBBBB.c000...` — `_BBBBB` before
    * the extension is the bucket id). */
  private def bucketIdsOnDisk(fs: FileSystem, loc: Path): Seq[Int] = {
    val id = """_(\d{5})\.""".r
    fs.listStatus(loc).toSeq.map(_.getPath.getName).filter(_.startsWith("part-"))
      .flatMap(n => id.findFirstMatchIn(n).map(_.group(1).toInt))
  }

  /** Ensure `graft_mv_<base>_h<basehash>_<bucketCol>_b<buckets>_<fp>`
    * exists as a bucketed+sorted parquet table over `bucketCol` and
    * return its catalog NAME (read it with `spark.table`). `build` runs
    * at most once per (dataset version, bucket spec) — across JVMs. */
  def ensureBucketedTable(spark: SparkSession, base: String, bucketCol: String,
                          buckets: Int, sourcePaths: Seq[String])
                         (build: => DataFrame): String = {
    val fp = fingerprint(spark, sourcePaths)
    // base-identity prefix (collision-resistant), then the bucket spec,
    // then the dataset fingerprint LAST so the stale-dataset cleanup can
    // match "same base, any spec, other fingerprint" by affix
    val prefix = s"graft_mv_${tag(base)}_h${shortHash(base)}_"
    val name = s"$prefix${tag(bucketCol)}_b${buckets}_$fp"
    val key = s"${spark.hashCode()}:$name"
    if (!ready.contains(key)) lock.synchronized {
      if (!ready.contains(key)) {
        if (!spark.catalog.tableExists(name)) {
          val conf = spark.sessionState.newHadoopConf()
          val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
          val fs = warehouse.getFileSystem(conf)
          val loc = new Path(warehouse, name)
          val reusable = fs.exists(new Path(loc, "_SUCCESS")) &&
            bucketIdsOnDisk(fs, loc).forall(_ < buckets)
          if (reusable) {
            // previous JVM built it: re-register the location (schema from
            // the files themselves; the bucket spec is pinned by the name)
            val qualified = fs.makeQualified(loc)
            val cols = spark.read.parquet(qualified.toString).schema.fields
              .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
            spark.sql(s"CREATE TABLE $name ($cols) USING parquet " +
              s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS " +
              s"LOCATION '${qualified.toUri}'")
          } else {
            // drop partial leftovers, plus stale-DATASET siblings: same
            // base, fingerprint ≠ current (other bucket specs over the
            // SAME fingerprint are live coexisting tables — keep them).
            // Deleted directories take their catalog entries and ready
            // keys with them so nothing keeps resolving to gone files.
            val stale = (if (fs.exists(warehouse)) fs.listStatus(warehouse).toSeq
                         else Nil)
              .map(_.getPath).filter { p =>
                val n = p.getName
                n.startsWith(prefix) && n != name && !n.endsWith(s"_$fp")
              }
            stale.foreach { p =>
              fs.delete(p, true)
              if (spark.catalog.tableExists(p.getName))
                spark.sql(s"DROP TABLE ${p.getName}")
              ready.removeIf(_.endsWith(s":${p.getName}"))
            }
            if (fs.exists(loc)) fs.delete(loc, true)
            build.repartition(buckets, col(bucketCol)).write.mode("overwrite")
              .bucketBy(buckets, bucketCol).sortBy(bucketCol)
              .option("path", fs.makeQualified(loc).toString)
              .saveAsTable(name)
          }
        }
        ready.add(key)
      }
    }
    name
  }
}
