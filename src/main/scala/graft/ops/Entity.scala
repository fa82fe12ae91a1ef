package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}

/** Entity resolution / record linkage: the fuzzy-matching tier between
  * exact dedup (identical keys) and the LSH near-dup ladder (long-text
  * similarity) — short dirty STRINGS matched by edit distance within
  * blocking keys. The classic shape: candidate generation by cheap
  * blocking (never all-pairs), exact scoring only inside blocks.
  *
  * `levenshtein` is a built-in with identical unit-cost semantics in
  * Spark and DuckDB, so the whole operator carries a full oracle.
  */
object Entity {

  /** Fuzzy customer matching: block on (nation, name prefix), score pairs
    * by edit distance, keep near-matches (≤ 2 edits), and emit per-entity
    * match stats with a deterministic best match (lexicographic
    * (distance, candidate-id) minimum — `min(struct(...))` on the Spark
    * side, a min-distance join-back on the SQL side; both reduce to the
    * same pair).
    *
    * Scale shape: the self-join key IS the blocking key — one shuffle of
    * each side on (nation, prefix), pairs generated only within a block
    * (Σ block² work, bounded by the blocking design — the operator's
    * documented recall/cost trade: pairs differing inside the prefix are
    * unseen, the standard blocking bargain; run multiple passes with
    * different keys to raise recall). No broadcast of the data side, no
    * cartesian anywhere. Block-size skew is an AQE skew-join case. The
    * `a < b` predicate halves the scored pairs; per-entity stats then
    * union both directions of each survivor (cheap — survivors only). */
  def entityMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.customer(spark, dir)
      .select($"c_custkey".as("ck"), $"c_name".as("nm"), $"c_nationkey".as("nk"),
        substring($"c_name", 1, 14).as("blk"))
    val a = keyed.select($"ck".as("a_ck"), $"nm".as("a_nm"), $"nk", $"blk")
    val b = keyed.select($"ck".as("b_ck"), $"nm".as("b_nm"), $"nk", $"blk")
    val scored = a.join(b, Seq("nk", "blk"))
      .filter($"a_ck" < $"b_ck")
      // thresholded levenshtein: banded O(len·k) DP with early exit,
      // returns -1 when the distance exceeds 2 — ~len/k cheaper per pair
      // than the full O(len²) matrix, same values on the kept pairs (the
      // oracle computes the full distance and filters, an identical set)
      .withColumn("dist", levenshtein($"a_nm", $"b_nm", 2))
      .filter($"dist" >= 0 && $"dist" <= 2)
    val directed = scored.select($"a_ck".as("custkey"), $"b_ck".as("other"), $"dist")
      .unionByName(scored.select($"b_ck".as("custkey"), $"a_ck".as("other"), $"dist"))
    directed.groupBy($"custkey")
      .agg(count(lit(1)).as("n_near"),
        min(struct($"dist", $"other")).as("m"))
      .select($"custkey", $"n_near",
        $"m.dist".as("min_dist"), $"m.other".as("best_match"))
  }

  private val entityMatchSql =
    """WITH keyed AS (
      |  SELECT c_custkey AS ck, c_name AS nm, c_nationkey AS nk,
      |         substring(c_name, 1, 14) AS blk
      |  FROM customer
      |), scored AS (
      |  SELECT a.ck AS a_ck, b.ck AS b_ck, levenshtein(a.nm, b.nm) AS dist
      |  FROM keyed a JOIN keyed b ON a.nk = b.nk AND a.blk = b.blk AND a.ck < b.ck
      |  WHERE levenshtein(a.nm, b.nm) <= 2
      |), directed AS (
      |  SELECT a_ck AS custkey, b_ck AS other, dist FROM scored
      |  UNION ALL
      |  SELECT b_ck AS custkey, a_ck AS other, dist FROM scored
      |), agg AS (
      |  SELECT custkey, COUNT(*) AS n_near, MIN(dist) AS min_dist
      |  FROM directed GROUP BY custkey
      |)
      |SELECT a.custkey, a.n_near, a.min_dist, MIN(d.other) AS best_match
      |FROM agg a JOIN directed d ON d.custkey = a.custkey AND d.dist = a.min_dist
      |GROUP BY a.custkey, a.n_near, a.min_dist""".stripMargin

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_entity_match", entityMatch, Some(entityMatchSql)),
  )
}
