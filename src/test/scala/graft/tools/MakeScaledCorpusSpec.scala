package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants the 10× scale probe's validity rests on: if the synthesized
  * corpus broke FK consistency (join fan-out would inflate N×N instead of
  * N×), duplicated dims, or copied document text verbatim (near-dup
  * cliques instead of real growth), the per-family ratios in SCALE.md
  * would measure an artifact, not scaling. Runs on sf0.001 with 2 copies.
  */
class MakeScaledCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private lazy val dest = {
    val d = "target/test-tmp/scaled2x"
    MakeScaledCorpus.build(spark, src, d, copies = 2)
    d
  }

  test("fact tables scale by the copy count; dims stay single-copy") {
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings", "customer")) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$dest/$t.parquet").count()
      assert(n1 == 2 * n0, s"$t: expected ${2 * n0}, got $n1")
    }
    for (t <- Seq("region", "nation")) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$dest/$t.parquet").count()
      assert(n1 == n0, s"dim $t duplicated: $n0 -> $n1")
    }
  }

  test("FK shifts are consistent: orders⋈customer matches scale exactly 2x, never 4x") {
    def matches(dir: String): Long =
      spark.read.parquet(s"$dir/orders.parquet").select($"o_custkey")
        .join(spark.read.parquet(s"$dir/customer.parquet").select($"c_custkey"),
          $"o_custkey" === $"c_custkey").count()
    assert(matches(dest) == 2 * matches(src),
      "join cardinality did not scale linearly — FK shift is inconsistent")
    // dim FKs left unshifted keep pointing at the single-copy dim
    val orphanNations = spark.read.parquet(s"$dest/customer.parquet")
      .join(spark.read.parquet(s"$dest/nation.parquet"),
        $"c_nationkey" === $"n_nationkey", "left_anti").count()
    assert(orphanNations == 0, s"$orphanNations customers lost their nation")
  }

  test("r10: per-copy remaps stay distinct for 1000 copies (sf100 validity)") {
    // The r8 generator's 36-way rotation repeated every 36 copies and its
    // %13 embedding offset every 13 — at the 1000-copy sf100 build that
    // means byte-identical docs and cosine-identical vectors across copies,
    // i.e. the probe would measure adversarial dup cliques, not growth.
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val perms = (0 until 1000).map(MakeScaledCorpus.permFor)
    assert(perms.distinct.size == 1000, "text permutations collide within 1000 copies")
    assert(perms.head == alpha, "copy 0 must stay byte-identical to the source")
    perms.foreach(p => assert(p.sorted == alpha.sorted, s"not a bijection: $p"))
    // embedding offset: for any fixed dimension j, i -> (31j + 997i) mod 1009
    // is injective over 0..999 (997 coprime to the prime 1009)
    val offs = (0 until 1000).map(i => (31 * 5 + i * 997) % 1009)
    assert(offs.distinct.size == 1000, "embedding offsets collide within 1000 copies")
  }

  test("copy-1 document text is remapped bijectively, not copied verbatim") {
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    val shift = 100000000L
    val pairs = docs.filter($"doc_id" < shift)
      .select($"doc_id", $"text".as("t0"), length($"text").as("l0"))
      .join(docs.filter($"doc_id" >= shift)
          .select(($"doc_id" - shift).as("doc_id"), $"text".as("t1"), length($"text").as("l1")),
        Seq("doc_id"))
    assert(pairs.count() > 0)
    // bijection: length preserved (intra-copy similarity structure intact)...
    assert(pairs.filter($"l0" =!= $"l1").count() == 0, "rotation changed text length")
    // ...but content remapped (no cross-copy exact dups)
    assert(pairs.filter($"t0" === $"t1" && $"l0" > 0).count() == 0,
      "copy-1 text identical to copy-0 — the probe would measure dup cliques")
  }
}
