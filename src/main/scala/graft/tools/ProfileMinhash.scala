package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import graft.Tables
import graft.functions.Text

/** Dev-only stage profiler for the MinHash dedup path. */
object ProfileMinhash {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").coalesce(8)
    val shingled = docs.select(col("doc_id"), Text.tokensLower(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(Text.ngramsFromTokens(col("toks"), 3)).as("shingles"))
    t("warmup")(docs.count())
    t("tokens only")(docs.select(Text.tokens(lower(col("text")))).count())
    t("ngrams only")(docs.select(Text.wordNgrams(lower(col("text")), 3)).count())
    t("shingle count")(shingled.count())
    t("shingle count warm")(shingled.count())
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = t("tf transform+cache") { val v = tf.transform(shingled).cache(); v.count(); v }
    val lsh = t("lsh fit")(new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(5).setSeed(42).fit(vecs))
    val joined = lsh.approxSimilarityJoin(vecs, vecs, 0.6, "jaccard_dist")
    val pairs = t("approxSimilarityJoin")(joined.count())
    println(s"[prof] candidate pairs: $pairs")
    spark.stop()
  }
}
