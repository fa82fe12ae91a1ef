package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Materialize an N× ("sf1") copy of a testdata directory for the
  * FULL-REGISTRY scale probe (r6 verdict item 4) — the same synthesis
  * rules [[ScaleProbe]] proved for the iterative tier, applied to every
  * table and written to disk so `Bench` can run the whole registry
  * against it via `SPARK_GRAFT_SF_DIR`:
  *
  *   - Fact tables become N disjoint id-shifted copies (every key column
  *     shifted by i·10^8 consistently, so FK joins stay 1:1 per copy —
  *     an unshifted FK would match all N copies and inflate join output
  *     N× beyond real growth).
  *   - `region`/`nation` stay single-copy (dimensions don't grow with
  *     fact data; their FK columns — c_nationkey, s_nationkey — are
  *     left unshifted to keep pointing at them).
  *   - `documents.text` is remapped per copy with a BIJECTIVE character
  *     rotation: intra-copy Jaccard structure is preserved exactly while
  *     cross-copy shingle similarity collapses, so the dedup tier sees
  *     real 10× growth, not N-cliques of identical docs (ScaleProbe
  *     measured the clique variant separately as `--adversarial`).
  *   - `embeddings.embedding` gets a small per-(copy, dimension)
  *     deterministic offset so copies are not cosine-identical (identical
  *     vectors would give ANN rerank degenerate ties).
  *
  * Timestamps/dates are left unchanged: time ranges don't stretch when a
  * corpus grows at fixed calendar span — per-bucket row counts grow
  * instead, which is exactly the skew profile a 10× ingest produces.
  *
  * Usage: runMain graft.tools.MakeScaledCorpus [srcDir] [destDir] [copies]
  */
object MakeScaledCorpus {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/root/repo/target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, dest, copies)
    spark.stop()
    println(s"[make-sf] wrote $copies-fold corpus to $dest")
  }

  /** The synthesis itself — separated from `main` so
    * MakeScaledCorpusSpec can pin the invariants the probe's validity
    * rests on (FK-consistent shifts, single-copy dims, per-copy text
    * bijection) on a tiny corpus. */
  def build(spark: SparkSession, src: String, dest: String, copies: Int): Unit = {
    import spark.implicits._

    def shifted(df: DataFrame, keyCols: Seq[String])(
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      // r7 advice: the i·10^8 shift silently assumed every source key
      // < 10^8; a larger source would create cross-copy key collisions and
      // break the FK-disjointness invariant the probe's validity rests on.
      // Fail loudly instead of writing an invalid corpus.
      val bounds = df.agg(max(col(keyCols.head)).cast("long"),
        keyCols.tail.map(k => max(col(k)).cast("long")): _*).head()
      keyCols.zipWithIndex.foreach { case (k, idx) =>
        val mx = if (bounds.isNullAt(idx)) 0L else bounds.getLong(idx)
        require(mx < 100000000L,
          s"key column $k has max $mx >= 10^8: copy shifts would collide — " +
            "raise the shift stride before scaling this corpus")
      }
      (0 until copies).map { i =>
        val s = i * 100000000L
        mutate(keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(s))), i)
      }.reduce(_ unionByName _)
    }

    def write(df: DataFrame, table: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dest/$table.parquet")
      println(s"[make-sf] $table: ${spark.read.parquet(s"$dest/$table.parquet").count()} rows")
    }

    // dimensions: single copy, keys untouched
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(shifted(Tables.customer(spark, src), Seq("c_custkey"))(), "customer")
    write(shifted(Tables.supplier(spark, src), Seq("s_suppkey"))(), "supplier")
    write(shifted(Tables.part(spark, src), Seq("p_partkey"))(), "part")
    write(shifted(Tables.orders(spark, src), Seq("o_orderkey", "o_custkey"))(), "orders")
    write(shifted(Tables.lineitem(spark, src),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem")
    write(shifted(Tables.events(spark, src), Seq("event_id", "user_id"))(), "events")
    write(shifted(Tables.documents(spark, src), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", translate($"text", Alpha, Alpha.drop(i % Alpha.length) + Alpha.take(i % Alpha.length)))
    }, "documents")
    write(shifted(Tables.embeddings(spark, src), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform($"embedding", (x, j) =>
          (x + ((j * 31 + lit(i) * 17) % 13 - 6).cast("float") * lit(0.01f)).cast("float")))
    }, "embeddings")
  }
}
