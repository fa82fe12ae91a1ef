package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}

/** Deterministic sketch tier — the approximate data structures a 100 TB
  * pipeline uses for frequency / membership / cardinality questions
  * (count-min, Bloom, HyperLogLog), built on md5-derived integer hashes
  * (identical hex in every engine) so each sketch is bit-reproducible and
  * carries a FULL DuckDB oracle. This is the oracled twin of
  * `q_sketch_agg` (Spark's built-in HLL++/KLL, whose sketch internals are
  * engine-specific and therefore registered rows-only).
  *
  * Why md5 and not the text tier's Rabin–Karp rolling hash: sketches need
  * AVALANCHE-quality bits. Near-consecutive keys give polynomial hashes
  * that form dense arithmetic runs — measured here: an HLL on rolling
  * hashes under-estimated by 40–80% because the register index (low bits)
  * and the rho value (next bits) stay correlated, and an affine
  * post-mix mod 2³¹−1 did not fix it. md5 is uniform by construction,
  * produced identically by Spark (`md5` over utf-8 bytes) and DuckDB
  * (`md5(VARCHAR)`), and hex substrings parse to integers on both sides
  * (`conv(...,16,10)` / `('0x'||...)::BIGINT`). Rows of a sketch take
  * DISJOINT 28-bit digest chunks — independent by construction, no
  * overflow-prone arithmetic anywhere.
  *
  * Scale shape shared by all three: per-row work is a digest + a few
  * integer ops; the shuffle carries (cell, partial) pairs bounded by the
  * SKETCH size (d·w / m bits / registers — constants), never by the data;
  * the finished sketch is O(KB) and broadcast over the probe side. That
  * is the whole point of sketches at 100 TB: one linear scan, constant
  * mergeable state — `groupBy.agg(count/max)` gives Spark the map-side
  * combine for free.
  *
  * The `exact` audit columns beside each estimate are part of the
  * VERIFICATION design, not the production shape — a real run emits only
  * the sketch/estimates and skips the exact pass.
  */
object Sketches {

  /** The four 28-bit digest chunks as one array, computed in ONE native
    * pass per row ([[graft.plans.Md5Chunks]] — r17; the prior hex-string
    * digest + per-chunk substring/conv parse paid string allocation and
    * hex parsing four times per row on the sketch builds). */
  private def digest(c: Column): Column =
    call_function("graft_md5_chunks", c.cast("binary"))

  /** 28-bit integer from digest chunk j (hex chars 1+7j … 7+7j of the
    * md5; j < 4 — disjoint chunks of the 32-hex digest). */
  private def chunk(d: Column, j: Int): Column = element_at(d, j + 1)

  private def chunkSql(expr: String, j: Int): String =
    s"('0x' || substr(md5($expr), ${1 + 7 * j}, 7))::BIGINT"

  /** 60-bit integer from the first 15 hex chars of the md5
    * ([[graft.functions.Text.md5Long]]). */
  private def h60(c: Column): Column = graft.functions.Text.md5Long(c)

  private def h60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  // ------------------------------------------------------------- count-min

  private val CmDepth = 4
  private val CmWidth = 512

  /** Count-min sketch (Cormode–Muthukrishnan): d=4 hash rows × w=512
    * buckets over the lineitem part-key stream, then every part probed
    * for its estimated frequency beside the exact count. The CMS
    * guarantee — estimate ≥ true count, overcount bounded by bucket
    * collisions — is visible in the output (`overcount` ≥ 0 on every
    * row) and asserted in scalatest.
    *
    * Build is ONE linear scan: each row contributes d (row, bucket)
    * increments, pre-aggregated map-side, so the exchange carries at most
    * d·w = 2048 cells per mapper. The ≤2048-row sketch is broadcast to
    * the probe side — the probe never shuffles against the corpus. */
  def countMin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sketch = Tables.lineitem(spark, dir)
      .select(digest($"l_partkey".cast("string")).as("d"))
      .select(explode(array((0 until CmDepth).map(j =>
        struct(lit(j).as("j"),
          (chunk($"d", j) % CmWidth).as("bucket"))): _*)).as("cell"))
      .groupBy($"cell.j", $"cell.bucket")
      .agg(count(lit(1)).as("cnt"))
    val probes = Tables.part(spark, dir)
      .select($"p_partkey", digest($"p_partkey".cast("string")).as("d"))
      .select($"p_partkey", explode(array((0 until CmDepth).map(j =>
        struct(lit(j).as("j"),
          (chunk($"d", j) % CmWidth).as("bucket"))): _*)).as("cell"))
    val est = probes
      .join(broadcast(sketch), probes("cell.j") === sketch("j") &&
        probes("cell.bucket") === sketch("bucket"), "left")
      .groupBy($"p_partkey")
      .agg(min(coalesce($"cnt", lit(0L))).as("est"))
    val exact = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("exact"))
    est.join(exact, est("p_partkey") === exact("l_partkey"), "left")
      .select($"p_partkey",
        $"est",
        coalesce($"exact", lit(0L)).as("exact"),
        // "over" is a reserved word in DuckDB — overcount
        ($"est" - coalesce($"exact", lit(0L))).as("overcount"))
  }

  private val countMinSql = {
    val buildCells = (0 until CmDepth).map(j =>
      s"SELECT $j AS j, ${chunkSql("CAST(l_partkey AS VARCHAR)", j)} % $CmWidth AS bucket FROM lineitem")
      .mkString("\n  UNION ALL\n  ")
    val probeCells = (0 until CmDepth).map(j =>
      s"SELECT p_partkey, $j AS j, ${chunkSql("CAST(p_partkey AS VARCHAR)", j)} % $CmWidth AS bucket FROM part")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH cells AS (
       |  $buildCells
       |), sketch AS (
       |  SELECT j, bucket, COUNT(*) AS cnt FROM cells GROUP BY j, bucket
       |), pcells AS (
       |  $probeCells
       |), est AS (
       |  SELECT p_partkey, MIN(COALESCE(s.cnt, 0)) AS est
       |  FROM pcells c LEFT JOIN sketch s ON c.j = s.j AND c.bucket = s.bucket
       |  GROUP BY p_partkey
       |), exact AS (
       |  SELECT l_partkey, COUNT(*) AS exact FROM lineitem GROUP BY l_partkey
       |)
       |SELECT p_partkey, est, COALESCE(exact, 0) AS exact,
       |       est - COALESCE(exact, 0) AS overcount
       |FROM est LEFT JOIN exact ON est.p_partkey = exact.l_partkey""".stripMargin
  }

  // ----------------------------------------------------------------- bloom

  private val BloomBits = 8192
  private val BloomK = 4

  /** Bloom filter: m=8192 bits, k=4 hash functions over the set of
    * customers holding an order above 150k; every customer is then probed
    * and the per-segment tally compares claimed membership (all k bits
    * set) against actual membership. A Bloom filter can have false
    * positives but NEVER false negatives — `n_claimed ≥ n_actual` and
    * `n_false_neg = 0` are both in the output, so the oracle hash-checks
    * the guarantee itself.
    *
    * Build: the member-key scan emits k bit positions per key; DISTINCT
    * bounds the exchange at m rows total. The ≤8192-row bit set is
    * broadcast to the probe side. */
  def bloom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val members = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 150000)
      .select($"o_custkey").distinct()
    val bits = members
      .select(digest($"o_custkey".cast("string")).as("d"))
      .select(explode(array((0 until BloomK).map(j =>
        chunk($"d", j) % BloomBits): _*)).as("bit"))
      .distinct()
    val probed = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", digest($"c_custkey".cast("string")).as("d"))
      .select($"c_custkey", $"c_mktsegment", explode(array((0 until BloomK).map(j =>
        chunk($"d", j) % BloomBits): _*)).as("bit"))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("bit"), "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg((count(lit(1)) === sum(coalesce($"hit", lit(0)))).as("claimed"))
    probed
      .join(members.withColumn("actual", lit(1)),
        probed("c_custkey") === members("o_custkey"), "left")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_probed"),
        sum(coalesce($"actual", lit(0))).as("n_actual"),
        sum($"claimed".cast("long")).as("n_claimed"),
        sum(when($"claimed" && $"actual".isNull, 1L).otherwise(0L)).as("n_false_pos"),
        sum(when(!$"claimed" && $"actual" === 1, 1L).otherwise(0L)).as("n_false_neg"))
  }

  private val bloomSql = {
    val memberBits = (0 until BloomK).map(j =>
      s"SELECT ${chunkSql("CAST(o_custkey AS VARCHAR)", j)} % $BloomBits AS bit FROM members")
      .mkString("\n  UNION ALL\n  ")
    val probeBits = (0 until BloomK).map(j =>
      s"SELECT c_custkey, c_mktsegment, ${chunkSql("CAST(c_custkey AS VARCHAR)", j)} % $BloomBits AS bit FROM customer")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH members AS (
       |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000
       |), bits AS (
       |  SELECT DISTINCT bit FROM (
       |  $memberBits
       |  )
       |), pbits AS (
       |  $probeBits
       |), probed AS (
       |  SELECT c_custkey, c_mktsegment,
       |         COUNT(*) = SUM(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS claimed
       |  FROM pbits p LEFT JOIN bits b ON p.bit = b.bit
       |  GROUP BY c_custkey, c_mktsegment
       |)
       |SELECT c_mktsegment,
       |  COUNT(*) AS n_probed,
       |  CAST(SUM(CASE WHEN m.o_custkey IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_actual,
       |  CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT) AS n_claimed,
       |  CAST(SUM(CASE WHEN claimed AND m.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |  CAST(SUM(CASE WHEN NOT claimed AND m.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
       |FROM probed LEFT JOIN members m ON probed.c_custkey = m.o_custkey
       |GROUP BY c_mktsegment""".stripMargin
  }

  // ------------------------------------------------------------------- hll

  private val HllRegisters = 256
  private val HllValueBits = 52 // 60-bit hash minus the 8 register bits
  /** alpha_256 · m² · 2^(HllValueBits+1), folded to ONE double constant so
    * the estimate is a single identical IEEE division in both engines. */
  private val HllEstNumerator: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * math.pow(2.0, HllValueBits + 1)

  /** Deterministic HyperLogLog: 256 registers over the 60-bit md5 hash —
    * register = h mod 256, register value = position of the lowest set
    * bit of v = h div 256 (rho = bit_count((v & −v) − 1) + 1; v = 0 caps
    * at 53). Distinct part-key cardinality per return flag, estimate
    * beside the exact count.
    *
    * Everything except the final division stays in integer math: the
    * harmonic sum Σ 2^(−M_r) is carried as the integer Σ 2^(53−M_r), so
    * the register state hash-checks exactly, and the one double division
    * at the end uses a single folded constant — the same IEEE op in both
    * engines. `n_zero_regs` (registers never hit) is emitted because the
    * standard small-range LinearCounting correction needs it — that
    * estimator uses ln(), which libm implementations need not round
    * identically, so it stays OUT of the hash-compared oracle; the
    * scalatest applies it and bounds the error instead. Raw HLL is known
    * biased-high below ~2.5m distincts (the sf0.001 fixture, n=200,
    * sits there deliberately: the output exposes exactly the state a
    * production estimator switches on).
    *
    * Scale shape: groupBy(flag, register).max(rho) — max is the ideal
    * map-side combine (each mapper emits ≤ groups·256 cells); the grid
    * completion join is O(groups·256). */
  def hllDet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey",
        h60($"l_partkey".cast("string")).as("h"))
    val rhos = keyed
      .withColumn("reg", $"h" % HllRegisters)
      // h div 256 of the non-negative hash == logical right shift 8
      .withColumn("v", shiftrightunsigned($"h", 8))
      .withColumn("rho",
        when($"v" === 0, lit(HllValueBits + 1))
          .otherwise(bit_count($"v".bitwiseAND(-$"v") - 1) + 1))
      .groupBy($"l_returnflag", $"reg")
      .agg(max($"rho").as("m_r"))
    val grid = keyed.select($"l_returnflag").distinct()
      .select($"l_returnflag", explode(sequence(lit(0), lit(HllRegisters - 1))).as("reg"))
    val sums = grid.join(rhos, Seq("l_returnflag", "reg"), "left")
      // scala-side shiftleft only takes a literal shift; the SQL form
      // accepts an expression
      .withColumn("term",
        expr(s"shiftleft(CAST(1 AS BIGINT), ${HllValueBits + 1} - coalesce(m_r, 0))"))
      .groupBy($"l_returnflag")
      .agg(sum($"term").as("reg_sum"),
        sum(when($"m_r".isNull, 1L).otherwise(0L)).as("n_zero_regs"))
    val exact = keyed.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_exact"))
    sums.join(exact, Seq("l_returnflag"))
      .select($"l_returnflag", $"reg_sum", $"n_zero_regs", $"n_exact",
        (lit(HllEstNumerator) / $"reg_sum").as("est_raw"))
  }

  private val hllDetSql = {
    val h = h60Sql("CAST(l_partkey AS VARCHAR)")
    // Double.toString round-trips exactly and DuckDB's string→double parse
    // is correctly rounded, so both engines divide by the same constant
    val numer = HllEstNumerator.toString
    s"""WITH keyed AS (
       |  SELECT l_returnflag, l_partkey, $h AS h FROM lineitem
       |), rhos AS (
       |  SELECT l_returnflag, h % $HllRegisters AS reg,
       |         MAX(CASE WHEN h // $HllRegisters = 0 THEN ${HllValueBits + 1}
       |             ELSE bit_count(((h // $HllRegisters) & -(h // $HllRegisters)) - 1) + 1
       |             END) AS m_r
       |  FROM keyed GROUP BY 1, 2
       |), grid AS (
       |  SELECT l_returnflag, CAST(r.range AS BIGINT) AS reg
       |  FROM (SELECT DISTINCT l_returnflag FROM keyed) f, range($HllRegisters) r
       |), sums AS (
       |  SELECT g.l_returnflag,
       |         CAST(SUM((1::BIGINT) << (${HllValueBits + 1} - COALESCE(m_r, 0))) AS BIGINT) AS reg_sum,
       |         CAST(SUM(CASE WHEN m_r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs
       |  FROM grid g LEFT JOIN rhos USING (l_returnflag, reg)
       |  GROUP BY 1
       |), exact AS (
       |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact FROM keyed GROUP BY 1
       |)
       |SELECT l_returnflag, reg_sum, n_zero_regs, n_exact,
       |       CAST('$numer' AS DOUBLE) / reg_sum AS est_raw
       |FROM sums JOIN exact USING (l_returnflag)""".stripMargin
  }

  /** HLL sketch MERGEABILITY under the oracle — the property that makes
    * sketches the 100 TB answer to COUNT(DISTINCT): per-group register
    * arrays combine into the union's sketch by a plain per-register MAX,
    * so a 1000-executor job aggregates distinct-counts in two levels
    * (partial sketch per partition, tiny merge at the top) without ever
    * re-scanning or re-shuffling raw keys. Here: one deterministic
    * 256-register sketch per event_type over user_id ([[hllDet]]'s
    * engine-portable register math), plus a `__ALL__` row whose registers
    * are the MAX-merge of the per-type sketches — emitted through the
    * identical estimate pipeline, so the DuckDB hash pins the merge rule
    * itself. The exact distinct column is the correctness AUDIT (a
    * production sketch path at scale drops it — recounting is exactly
    * what the sketch avoids). */
  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE corpus pass collapses to the per-(type, register) sketch table —
    // O(groups × 256) rows, the definition of sketch-sized — which then
    // collects for the merge/sum arithmetic (exact integer shifts on the
    // driver; a declarative union/grid formulation evaluated this agg
    // subtree twice and re-scanned events for the type list — 4 corpus
    // scans, caught in the plan audit)
    val rhosLocal = hllRegistersPlan(spark, dir)
      .as[(String, Long, Int)].collect()
    val mergedRegs = rhosLocal.groupBy(_._2).map { case (r, xs) => r -> xs.map(_._3).max }
    val perType = rhosLocal.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(x => x._2 -> x._3).toMap
    } + ("__ALL__" -> mergedRegs)
    val sums = perType.toSeq.map { case (t, regs) =>
      val regSum = (0 until HllRegisters).map(r =>
        1L << (HllValueBits + 1 - regs.getOrElse(r.toLong, 0))).sum
      (t, regSum, (HllRegisters - regs.size).toLong)
    }.toDF("event_type", "reg_sum", "n_zero_regs")
    // per-type AND global exact counts in the SECOND (and last) pass: cube
    // over the single grouping column yields the (type) rows plus the total
    // grouping_id (1 = the cube's total row), NOT coalesce(NULL→'__ALL__'):
    // a NULL event_type data group would collide with the total row under
    // the coalesce encoding and double-join against the sketch sums
    val exact = Tables.events(spark, dir)
      .cube($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"), grouping_id().as("gid"))
      .select(when($"gid" === 1, lit("__ALL__")).otherwise($"event_type").as("event_type"),
        $"n_exact")
    sums.join(exact, Seq("event_type"))
      .select($"event_type", $"reg_sum", $"n_zero_regs", $"n_exact",
        (lit(HllEstNumerator) / $"reg_sum").as("est_raw"))
  }

  /** The distributed half of [[hllMerge]] — the corpus scan collapsing to
    * per-(type, register) partial sketches; exposed un-executed for the
    * plan audit (the registered query's merge math is driver-side by
    * design and its own plan shows only a LocalTableScan join). */
  def hllRegistersPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", h60($"user_id".cast("string")).as("h"))
      .withColumn("reg", $"h" % HllRegisters)
      .withColumn("v", shiftrightunsigned($"h", 8))
      .withColumn("rho",
        when($"v" === 0, lit(HllValueBits + 1))
          .otherwise(bit_count($"v".bitwiseAND(-$"v") - 1) + 1))
      .groupBy($"event_type", $"reg")
      .agg(max($"rho").as("m_r"))
  }

  private val hllMergeSql = {
    val h = h60Sql("CAST(user_id AS VARCHAR)")
    val numer = HllEstNumerator.toString
    s"""WITH keyed AS (
       |  SELECT event_type, user_id, $h AS h FROM events
       |), rhos AS (
       |  SELECT event_type, h % $HllRegisters AS reg,
       |         MAX(CASE WHEN h // $HllRegisters = 0 THEN ${HllValueBits + 1}
       |             ELSE bit_count(((h // $HllRegisters) & -(h // $HllRegisters)) - 1) + 1
       |             END) AS m_r
       |  FROM keyed GROUP BY 1, 2
       |), sketches AS (
       |  SELECT event_type, reg, m_r FROM rhos
       |  UNION ALL
       |  SELECT '__ALL__' AS event_type, reg, MAX(m_r) AS m_r FROM rhos GROUP BY reg
       |), types AS (
       |  SELECT DISTINCT event_type FROM keyed
       |  UNION ALL SELECT '__ALL__'
       |), grid AS (
       |  SELECT event_type, CAST(r.range AS BIGINT) AS reg
       |  FROM types, range($HllRegisters) r
       |), sums AS (
       |  SELECT g.event_type,
       |         CAST(SUM((1::BIGINT) << (${HllValueBits + 1} - COALESCE(m_r, 0))) AS BIGINT) AS reg_sum,
       |         CAST(SUM(CASE WHEN m_r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs
       |  FROM grid g LEFT JOIN sketches USING (event_type, reg)
       |  GROUP BY 1
       |), exact AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
       |  UNION ALL
       |  SELECT '__ALL__', COUNT(DISTINCT user_id) FROM events
       |)
       |SELECT event_type, reg_sum, n_zero_regs, n_exact,
       |       CAST('$numer' AS DOUBLE) / reg_sum AS est_raw
       |FROM sums JOIN exact USING (event_type)""".stripMargin
  }

  /** HLL set-INTERSECTION via inclusion–exclusion — the audience-overlap
    * verb ("customers active in segment A AND segment B") that sketches
    * answer at 100 TB without ever joining raw keys: |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), where the union sketch is the per-register MAX
    * merge ([[hllMerge]]'s rule) of the two segment sketches. Segments
    * here are order priorities over customer keys — genuinely partial
    * overlap (~86% at test SF), unlike the fully-overlapping events
    * corpus. The exact intersection is the correctness AUDIT; a
    * production run drops it — pairwise audience overlap over N segments
    * needs only the N fixed-size sketches, merged pairwise on the driver,
    * while the exact version is N² distinct-joins over the fact table.
    *
    * Error shape (and why the estimate column is honest about it): the
    * inclusion–exclusion difference compounds the ±1.04/√256 ≈ 6.5%
    * error of THREE estimates, amplified by |A|/|A∩B| — fine for the
    * large overlaps here (scalatest bounds it), increasingly noisy for
    * small intersections; the production fix is more registers (error
    * halves per 4× m) — the math and this pipeline are unchanged.
    *
    * Scale shape: ONE fact scan collapsing to O(segments·256) sketch
    * rows (max is map-side combinable), driver-side pairwise merge
    * arithmetic on that bounded state (same documented pattern as
    * [[hllMerge]]); only the audit column touches the data again. */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("seg"), $"o_custkey",
        h60($"o_custkey".cast("string")).as("h"))
    val rhosLocal = keyed
      .withColumn("reg", $"h" % HllRegisters)
      .withColumn("v", shiftrightunsigned($"h", 8))
      .withColumn("rho",
        when($"v" === 0, lit(HllValueBits + 1))
          .otherwise(bit_count($"v".bitwiseAND(-$"v") - 1) + 1))
      .groupBy($"seg", $"reg")
      .agg(max($"rho").as("m_r"))
      .as[(String, Long, Int)].collect()
    val perSeg = rhosLocal.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(x => x._2 -> x._3).toMap
    }
    def regSum(regs: Map[Long, Int]): Long =
      (0 until HllRegisters).map(r =>
        1L << (HllValueBits + 1 - regs.getOrElse(r.toLong, 0))).sum
    val segs = perSeg.keys.toSeq.sorted
    // n_zero_* (registers never hit) ride along for the same reason as in
    // [[hllDet]]: the small-range LinearCounting switch needs them, and its
    // ln() must stay out of the hash-compared oracle
    val pairs = (for {
      a <- segs; b <- segs if a < b
    } yield {
      val (ra, rb) = (perSeg(a), perSeg(b))
      val union = (ra.keySet ++ rb.keySet).map(k =>
        k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
      (a, b, regSum(ra), regSum(rb), regSum(union),
        (HllRegisters - ra.size).toLong, (HllRegisters - rb.size).toLong,
        (HllRegisters - union.size).toLong)
    }).toDF("seg_a", "seg_b", "reg_sum_a", "reg_sum_b", "reg_sum_union",
      "n_zero_a", "n_zero_b", "n_zero_union")
    val est = pairs.select($"seg_a", $"seg_b",
      $"reg_sum_a", $"reg_sum_b", $"reg_sum_union",
      $"n_zero_a", $"n_zero_b", $"n_zero_union",
      (lit(HllEstNumerator) / $"reg_sum_a" + lit(HllEstNumerator) / $"reg_sum_b"
        - lit(HllEstNumerator) / $"reg_sum_union").as("est_intersect"))
    // Exact audit without the self-join (r17): the old form materialized
    // the distinct (seg, custkey) frame and shuffle-joined it against
    // itself on custkey — two key-level exchanges plus a join sort. The
    // pair count per (seg_a, seg_b) is just "customers whose segment SET
    // contains both", so aggregate each customer's segment set in ONE
    // keyed exchange (collect_set partials combine map-side) and explode
    // the sorted set's ordered pairs — per-customer scalar work bounded by
    // |segments|² = 25 cells. Identical rows: each qualifying customer
    // contributes exactly one (a, b) pair either way.
    val segSets = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sort_array(collect_set($"o_orderpriority")).as("segs"))
    val exact = segSets
      .select(explode(flatten(transform($"segs", (a, i) =>
        transform(slice($"segs", i + lit(2), size($"segs")), b =>
          struct(a.as("seg_a"), b.as("seg_b")))))).as("p"))
      .groupBy($"p.seg_a".as("seg_a"), $"p.seg_b".as("seg_b"))
      .agg(count(lit(1)).as("n_exact_intersect"))
    est.join(exact, Seq("seg_a", "seg_b"), "left")
      .select($"seg_a", $"seg_b", $"reg_sum_a", $"reg_sum_b", $"reg_sum_union",
        $"n_zero_a", $"n_zero_b", $"n_zero_union",
        $"est_intersect", coalesce($"n_exact_intersect", lit(0L)).as("n_exact_intersect"))
  }

  private val hllIntersectSql = {
    val h = h60Sql("CAST(o_custkey AS VARCHAR)")
    val numer = HllEstNumerator.toString
    s"""WITH keyed AS (
       |  SELECT o_orderpriority AS seg, o_custkey, $h AS h FROM orders
       |), rhos AS (
       |  SELECT seg, h % $HllRegisters AS reg,
       |         MAX(CASE WHEN h // $HllRegisters = 0 THEN ${HllValueBits + 1}
       |             ELSE bit_count(((h // $HllRegisters) & -(h // $HllRegisters)) - 1) + 1
       |             END) AS m_r
       |  FROM keyed GROUP BY 1, 2
       |), segs AS (
       |  SELECT DISTINCT seg FROM keyed
       |), pairs AS (
       |  SELECT a.seg AS seg_a, b.seg AS seg_b
       |  FROM segs a JOIN segs b ON a.seg < b.seg
       |), tgrid AS (
       |  SELECT seg, CAST(r.range AS BIGINT) AS reg FROM segs, range($HllRegisters) r
       |), tsums AS (
       |  SELECT g.seg,
       |         CAST(SUM((1::BIGINT) << (${HllValueBits + 1} - COALESCE(m_r, 0))) AS BIGINT) AS reg_sum,
       |         CAST(SUM(CASE WHEN m_r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
       |  FROM tgrid g LEFT JOIN rhos USING (seg, reg)
       |  GROUP BY 1
       |), urs AS (
       |  SELECT p.seg_a, p.seg_b, r.reg, MAX(r.m_r) AS m_r
       |  FROM pairs p JOIN rhos r ON r.seg = p.seg_a OR r.seg = p.seg_b
       |  GROUP BY 1, 2, 3
       |), pgrid AS (
       |  SELECT seg_a, seg_b, CAST(r.range AS BIGINT) AS reg
       |  FROM pairs, range($HllRegisters) r
       |), usums AS (
       |  SELECT g.seg_a, g.seg_b,
       |         CAST(SUM((1::BIGINT) << (${HllValueBits + 1} - COALESCE(u.m_r, 0))) AS BIGINT) AS reg_sum_union,
       |         CAST(SUM(CASE WHEN u.m_r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_union
       |  FROM pgrid g LEFT JOIN urs u
       |    ON u.seg_a = g.seg_a AND u.seg_b = g.seg_b AND u.reg = g.reg
       |  GROUP BY 1, 2
       |), segkeys AS (
       |  SELECT DISTINCT seg, o_custkey FROM keyed
       |), exact AS (
       |  SELECT x.seg AS seg_a, y.seg AS seg_b,
       |         COUNT(DISTINCT x.o_custkey) AS n_exact_intersect
       |  FROM segkeys x JOIN segkeys y
       |    ON x.o_custkey = y.o_custkey AND x.seg < y.seg
       |  GROUP BY 1, 2
       |)
       |SELECT p.seg_a, p.seg_b,
       |  sa.reg_sum AS reg_sum_a, sb.reg_sum AS reg_sum_b, u.reg_sum_union,
       |  sa.n_zero AS n_zero_a, sb.n_zero AS n_zero_b, u.n_zero_union,
       |  CAST('$numer' AS DOUBLE) / sa.reg_sum + CAST('$numer' AS DOUBLE) / sb.reg_sum
       |    - CAST('$numer' AS DOUBLE) / u.reg_sum_union AS est_intersect,
       |  COALESCE(e.n_exact_intersect, CAST(0 AS BIGINT)) AS n_exact_intersect
       |FROM pairs p
       |JOIN tsums sa ON sa.seg = p.seg_a
       |JOIN tsums sb ON sb.seg = p.seg_b
       |JOIN usums u ON u.seg_a = p.seg_a AND u.seg_b = p.seg_b
       |LEFT JOIN exact e ON e.seg_a = p.seg_a AND e.seg_b = p.seg_b""".stripMargin
  }

  /** Bloom SEMI-JOIN REDUCTION — the shuffle-pruning technique for joins
    * whose dim side is too big to broadcast but whose BLOOM FILTER is not:
    * build the dim keys' bit set (≤ [[BloomBits]] positions — sketch-sized
    * driver state, ~1 KB here, 16 MB even at m=2^27), ship it into the
    * fact scan as an `InSet` predicate over the k hash chunks, and only
    * the surviving facts enter the exact join. At 100 TB this turns
    * "shuffle every fact row to discover most match nothing" into
    * "shuffle the candidates": false positives are bounded by the filter
    * (audited in the output), false negatives are impossible — the exact
    * join after the filter restores precise semantics. Spark's own
    * runtime-filter feature does this opaquely; here the filter is
    * deterministic md5-chunk math ([[bloom]]'s), so candidate selection
    * AND the pruning audit sit under the DuckDB hash. Emits per order
    * priority: candidates, exact matches, false positives pruned at the
    * join, and the joined revenue in integer cents. */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bloomJoinFrom(
      Tables.customer(spark, dir).filter($"c_nationkey" < 5).select($"c_custkey"),
      Tables.orders(spark, dir)
        .select($"o_custkey", $"o_orderpriority", $"o_totalprice"))
  }

  /** [[bloomJoin]] over explicit (dim keys, fact) frames — seam for
    * tools/JoinScaleProbe's synthesized 10× fact side. */
  private[graft] def bloomJoinFrom(dim: DataFrame, facts0: DataFrame): DataFrame = {
    import dim.sparkSession.implicits._
    val bitSeq = dim
      .select(digest($"c_custkey".cast("string")).as("d"))
      .select(explode(array((0 until BloomK).map(j =>
        chunk($"d", j) % BloomBits): _*)).as("bit"))
      .distinct().as[Long].collect().toSeq // bounded by BloomBits, never data-sized
    val facts = facts0
      .withColumn("d", digest($"o_custkey".cast("string")))
    val candidates = facts.filter(
      (0 until BloomK).map(j => (chunk($"d", j) % BloomBits).isInCollection(bitSeq))
        .reduce(_ && _))
    candidates
      .join(dim.withColumn("matched", lit(1L)),
        candidates("o_custkey") === dim("c_custkey"), "left")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce($"matched", lit(0L))).as("n_joined"),
        sum(when($"matched".isNull, 1L).otherwise(0L)).as("n_pruned_fp"),
        sum(when($"matched" === 1L, round($"o_totalprice" * 100).cast("long"))
          .otherwise(0L)).as("revenue_c"))
  }

  private val bloomJoinSql = {
    val dimBits = (0 until BloomK).map(j =>
      s"SELECT ${chunkSql("CAST(c_custkey AS VARCHAR)", j)} % $BloomBits AS bit FROM dim")
      .mkString("\n  UNION ALL\n  ")
    val factBits = (0 until BloomK).map(j =>
      s"SELECT o_orderkey, ${chunkSql("CAST(o_custkey AS VARCHAR)", j)} % $BloomBits AS bit FROM orders")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH dim AS (
       |  SELECT c_custkey FROM customer WHERE c_nationkey < 5
       |), bits AS (
       |  SELECT DISTINCT bit FROM (
       |  $dimBits
       |  )
       |), fbits AS (
       |  $factBits
       |), cand AS (
       |  SELECT o_orderkey
       |  FROM fbits f LEFT JOIN bits b USING (bit)
       |  GROUP BY o_orderkey
       |  HAVING COUNT(*) = SUM(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END)
       |), j AS (
       |  SELECT o.o_orderpriority, o.o_totalprice, d.c_custkey AS matched
       |  FROM orders o JOIN cand USING (o_orderkey)
       |  LEFT JOIN dim d ON o.o_custkey = d.c_custkey
       |)
       |SELECT o_orderpriority, COUNT(*) AS n_candidates,
       |  CAST(SUM(CASE WHEN matched IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_joined,
       |  CAST(SUM(CASE WHEN matched IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned_fp,
       |  CAST(SUM(CASE WHEN matched IS NOT NULL
       |       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS revenue_c
       |FROM j GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------- heavy hitters

  private val MgBuckets = 16
  private val MgK = 8 // counters per bucket summary
  private val MgFinalK = 20 // counters in the merged global summary

  /** Heavy-hitters summary (Misra–Gries / SpaceSaving family) — the
    * top-k-frequent-items sketch a corpus-curation pipeline reaches for
    * first (hot domains, hot tokens), completing the sketch tier beside
    * count-min (point frequency), Bloom (membership) and HLL
    * (cardinality). Uses the CANONICAL mergeable form (Agarwal et al.,
    * "Mergeable Summaries", PODS'12): a part's summary is its exact
    * counts pruned to k counters by subtracting the (k+1)-th largest
    * count c_{k+1} (every counter decremented, ≤0 dropped — the batch
    * equivalent of MG's decrement step), and merging two summaries is
    * counter-wise addition followed by the same prune. Unlike streaming
    * MG, this is a pure function of the frequency map — deterministic
    * under any partitioning — so the whole sketch sits under the DuckDB
    * hash, like [[countMin]].
    *
    * Shape here: tokens md5-bucket into [[MgBuckets]] disjoint parts
    * (each token lives in exactly ONE bucket, so per-bucket counts are
    * global counts), each bucket prunes to [[MgK]] counters recording
    * its offset `off_b`, and the merged global summary prunes the
    * surviving ≤ B·k counters to [[MgFinalK]] with a second offset
    * `goff`. MG guarantee, visible in the output and hash-checked:
    * `est = exact − (off_b + goff)` for every kept token (the summary
    * NEVER overcounts — the mirror of count-min's never-undercount), and
    * any token absent from the summary has true count ≤ its bucket's
    * `off_b + goff` — the miss certificate the scalatest asserts
    * corpus-wide. `exact` beside the estimate is the audit column, as in
    * every sketch here; production emits only (token, est, err_bound).
    *
    * Scale shape: one explode → map-side-combinable count (the shuffle
    * carries the VOCABULARY, not the corpus), a window per md5 bucket
    * (raise B for bigger vocabularies — parallelism and per-bucket state
    * both scale with it), then O(B·k) rows into the final prune. No
    * all-pairs, no driver state beyond the sketch. */
  def topkFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokensLower($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", chunk(digest($"token"), 0) % MgBuckets)
    // (cnt desc, token) makes rank — and therefore the whole summary —
    // a pure function of the frequency map
    val perBucket = Window.partitionBy($"bucket").orderBy($"cnt".desc, $"token")
    val ranked = counts.withColumn("rn", row_number().over(perBucket))
    val offsets = ranked.groupBy($"bucket")
      .agg(coalesce(max(when($"rn" === MgK + 1, $"cnt")), lit(0L)).as("off_b"))
    val pruned = ranked.filter($"rn" <= MgK)
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("w", $"cnt" - $"off_b")
      .filter($"w" > 0)
    // global merge prune: ≤ B·k = 128 rows — a single-partition window
    // over sketch-sized state is the intended shape (the merge step of a
    // mergeable summary is small by construction)
    val gRank = Window.orderBy($"w".desc, $"token")
    val gAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pruned.withColumn("grn", row_number().over(gRank))
      .withColumn("goff",
        coalesce(max(when($"grn" === MgFinalK + 1, $"w")).over(gAll), lit(0L)))
      .filter($"grn" <= MgFinalK && $"w" - $"goff" > 0)
      .select($"token", $"bucket",
        ($"w" - $"goff").as("est"),
        ($"off_b" + $"goff").as("err_bound"),
        $"cnt".as("exact"))
  }

  private val topkFreqSql =
    s"""WITH counts AS (
       |  SELECT token, COUNT(*) AS cnt
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |        FROM documents)
       |  GROUP BY token
       |), bucketed AS (
       |  SELECT token, cnt, ${chunkSql("token", 0)} % $MgBuckets AS bucket FROM counts
       |), ranked AS (
       |  SELECT token, cnt, bucket,
       |         row_number() OVER (PARTITION BY bucket ORDER BY cnt DESC, token) AS rn
       |  FROM bucketed
       |), offs AS (
       |  SELECT bucket, COALESCE(MAX(CASE WHEN rn = ${MgK + 1} THEN cnt END), 0) AS off_b
       |  FROM ranked GROUP BY bucket
       |), pruned AS (
       |  SELECT r.token, r.cnt, r.bucket, o.off_b, r.cnt - o.off_b AS w
       |  FROM ranked r JOIN offs o USING (bucket)
       |  WHERE r.rn <= $MgK AND r.cnt - o.off_b > 0
       |), granked AS (
       |  SELECT *, row_number() OVER (ORDER BY w DESC, token) AS grn FROM pruned
       |), goffs AS (
       |  SELECT COALESCE(MAX(CASE WHEN grn = ${MgFinalK + 1} THEN w END), 0) AS goff
       |  FROM granked
       |)
       |SELECT token, bucket, w - goff AS est, off_b + goff AS err_bound, cnt AS exact
       |FROM granked, goffs
       |WHERE grn <= $MgFinalK AND w - goff > 0""".stripMargin

  /** Canonical MG prune of an exact frequency map to k counters — the
    * pure-function core [[topkFreq]] expresses relationally; exposed for
    * the merge-dominance property test. Returns (counters, offset). */
  private[graft] def mgSummary(counts: Map[String, Long], k: Int): (Map[String, Long], Long) = {
    val sorted = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val off = if (sorted.size > k) sorted(k)._2 else 0L
    (sorted.take(k).map { case (t, c) => t -> (c - off) }.filter(_._2 > 0).toMap, off)
  }

  /** Mergeable-summaries merge: counter-wise sum, then the same prune;
    * error offsets add. */
  private[graft] def mgMerge(a: (Map[String, Long], Long), b: (Map[String, Long], Long),
                             k: Int): (Map[String, Long], Long) = {
    val combined = (a._1.keySet ++ b._1.keySet)
      .map(t => t -> (a._1.getOrElse(t, 0L) + b._1.getOrElse(t, 0L))).toMap
    val (m, off) = mgSummary(combined, k)
    (m, a._2 + b._2 + off)
  }

  // ------------------------------------------- mergeable quantile sketch

  private val QsBits = 5 // mantissa bits: relative bucket width ≤ 2^-5 ≈ 3.1%

  /** Mergeable quantile sketch over positive integers — log-bucket
    * (HDR-histogram-style) value-space compression: a value keeps its top
    * `QsBits`+1 significant bits, i.e. bucket lower bound = v with the low
    * (bitlen(v)−1−QsBits) bits zeroed. Unlike rank-space summaries
    * (GK, t-digest, KLL), fixed value-space cells make the MERGE EXACT —
    * merging two sketches is bucket-wise counter addition, loses nothing,
    * and is order/partition-independent, which is why the whole sketch
    * (built as per-group partials, then merged) can sit under the DuckDB
    * hash while KLL internals (`q_sketch_agg`) must stay rows-only. The
    * quantile guarantee is structural: the estimated bucket CONTAINS the
    * exact quantile, and bucket width / lower bound ≤ 2^−QsBits, so the
    * relative error of the midpoint is bounded by 2^−(QsBits+1).
    *
    * Integer-portability: bit length = `length(bin(v))` (identical string
    * function both engines), bucket width = `1::BIGINT << ...` /
    * `shiftleft(cast(1 as bigint), ...)`, quantile rank =
    * ceil(p·n) computed as `(p_num·n + p_den − 1) div p_den` on exact
    * longs — no float enters the sketch at any point (the oracle-parity
    * division/rounding rules).
    *
    * Output: one row per (scope, quantile) — scope = each l_returnflag
    * partial sketch plus 'ALL' (the merge of the partials) × p50/p90/p99/
    * p99.9 — with `est_lo`/`est_hi` (the bucket), the `exact` quantile,
    * and the `in_bucket` containment invariant, which must be true on
    * every row and is therefore pinned by the hash.
    *
    * Scale shape: one linear scan → per-row integer ops → groupBy
    * (scope, bucket) with map-side combine; the shuffle carries at most
    * scopes × 64·2^QsBits bucket cells — SKETCH-sized, never data-sized —
    * and the cumulative window runs over those sketch-sized partitions.
    * The exact side (a distinct-value histogram, the winsorize pattern)
    * is the VERIFICATION audit, not the production shape. */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def bucketWidth(col: String) =
      s"shiftleft(cast(1 as bigint), greatest(length(bin($col)) - 1 - $QsBits, 0))"
    val vals = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("scope"),
        round($"l_extendedprice" * 100).cast("long").as("v"))
    // ONE corpus scan (r17; was 2 — the sketch and the exact audit each
    // re-scanned lineitem). This REGISTERED query always carries the exact
    // distinct-value histogram as its verification audit, so the sketch's
    // bucket cells are derivable from it for free: bucket count = sum of
    // the value counts mapping into the bucket. The cached frame is the
    // histogram both sides read; the production sketch path (no audit)
    // remains the direct per-row bucket aggregation documented above — the
    // derivation only short-circuits work the audit already paid for.
    val histF = vals.groupBy($"scope", $"v").agg(count(lit(1)).as("cnt")).cache()
    // per-scope partial sketches, then the exact bucket-wise-sum merge
    val partial = histF
      .withColumn("b", expr(s"v - v % ${bucketWidth("v")}"))
      .groupBy($"scope", $"b").agg(sum($"cnt").as("cnt"))
    val merged = partial.groupBy($"b").agg(sum($"cnt").as("cnt"))
      .select(lit("ALL").as("scope"), $"b", $"cnt")
    val sketch = partial.select($"scope", $"b", $"cnt").unionByName(merged)
    val cumW = Window.partitionBy($"scope").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("cum", sum($"cnt").over(cumW))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"scope")))
    val probes = Seq((1L, 2L), (9L, 10L), (99L, 100L), (999L, 1000L))
      .toDF("p_num", "p_den")
    // rank = ceil(p·n) in exact long math; est_lo = smallest bucket whose
    // cumulative count reaches it (cum is monotone in b per scope)
    val est = cum.join(broadcast(probes))
      .withColumn("rank", expr("(p_num * n + p_den - 1) div p_den"))
      .groupBy($"scope", $"p_num", $"p_den")
      .agg(max($"n").as("n"), max($"rank").as("rank"),
        min(when($"cum" >= $"rank", $"b")).as("est_lo"))
      .withColumn("est_hi", expr(s"est_lo + ${bucketWidth("est_lo")} - 1"))
    // exact audit: the same distinct-value count histogram (values
    // shuffle, not rows), read from the cache
    val histA = histF.groupBy($"v").agg(sum($"cnt").as("cnt"))
      .select(lit("ALL").as("scope"), $"v", $"cnt")
    val hcumW = Window.partitionBy($"scope").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = histF.unionByName(histA)
      .withColumn("cum", sum($"cnt").over(hcumW))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"scope")))
      .join(broadcast(probes))
      .withColumn("rank", expr("(p_num * n + p_den - 1) div p_den"))
      .groupBy($"scope", $"p_num", $"p_den")
      .agg(min(when($"cum" >= $"rank", $"v")).as("exact"))
    est.join(exact, Seq("scope", "p_num", "p_den"))
      .select($"scope", $"p_num", $"p_den", $"n", $"rank",
        $"est_lo", $"est_hi", $"exact",
        ($"exact" >= $"est_lo" && $"exact" <= $"est_hi").as("in_bucket"))
  }

  private val quantileSketchSql =
    s"""WITH vals AS (
       |  SELECT l_returnflag AS scope,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
       |  FROM lineitem
       |), partial AS (
       |  SELECT scope,
       |         v - v % (1::BIGINT << greatest(length(bin(v)) - 1 - $QsBits, 0)) AS b,
       |         COUNT(*) AS cnt
       |  FROM vals GROUP BY 1, 2
       |), sketch AS (
       |  SELECT scope, b, cnt FROM partial
       |  UNION ALL
       |  SELECT 'ALL' AS scope, b, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM partial GROUP BY b
       |), cum AS (
       |  SELECT scope, b, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope) AS BIGINT) AS n
       |  FROM sketch
       |), probes(p_num, p_den) AS (
       |  VALUES (1::BIGINT, 2::BIGINT), (9::BIGINT, 10::BIGINT),
       |         (99::BIGINT, 100::BIGINT), (999::BIGINT, 1000::BIGINT)
       |), est0 AS (
       |  SELECT scope, p_num, p_den, MAX(n) AS n, MAX(rank) AS rank,
       |         MIN(CASE WHEN cum >= rank THEN b END) AS est_lo
       |  FROM (SELECT c.*, p.p_num, p.p_den,
       |          (p.p_num * c.n + p.p_den - 1) // p.p_den AS rank
       |        FROM cum c CROSS JOIN probes p)
       |  GROUP BY 1, 2, 3
       |), est AS (
       |  SELECT *, est_lo + (1::BIGINT << greatest(length(bin(est_lo)) - 1 - $QsBits, 0)) - 1 AS est_hi
       |  FROM est0
       |), histf AS (
       |  SELECT scope, v, COUNT(*) AS cnt FROM vals GROUP BY 1, 2
       |), hist AS (
       |  SELECT scope, v, cnt FROM histf
       |  UNION ALL
       |  SELECT 'ALL' AS scope, v, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM histf GROUP BY v
       |), hcum AS (
       |  SELECT scope, v,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope) AS BIGINT) AS n
       |  FROM hist
       |), ex AS (
       |  SELECT scope, p_num, p_den, MIN(CASE WHEN cum >= rank THEN v END) AS exact
       |  FROM (SELECT h.*, p.p_num, p.p_den,
       |          (p.p_num * h.n + p.p_den - 1) // p.p_den AS rank
       |        FROM hcum h CROSS JOIN probes p)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT e.scope, e.p_num, e.p_den, e.n, e.rank,
       |       e.est_lo, e.est_hi, x.exact,
       |       x.exact >= e.est_lo AND x.exact <= e.est_hi AS in_bucket
       |FROM est e JOIN ex x USING (scope, p_num, p_den)""".stripMargin

  /** Pure-Scala mirror of the relational bucket map — the reference
    * implementation the property test checks invariants on (and checks
    * AGAINST the SQL-expression form on a Spark frame). v ≥ 0. */
  private[graft] def qsBucket(v: Long): Long = {
    val e = 64 - java.lang.Long.numberOfLeadingZeros(v) // bit length; 0 for v=0
    v - (v % (1L << math.max(e - 1 - QsBits, 0)))
  }

  /** Width of the bucket with lower bound `b` (same exponent as members). */
  private[graft] def qsWidth(b: Long): Long = {
    val e = 64 - java.lang.Long.numberOfLeadingZeros(b)
    1L << math.max(e - 1 - QsBits, 0)
  }

  private[graft] def qsBits: Int = QsBits

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_countmin", countMin, Some(countMinSql)),
    VerifiedQuery("q_bloom", bloom, Some(bloomSql)),
    VerifiedQuery("q_bloom_join", bloomJoin, Some(bloomJoinSql)),
    VerifiedQuery("q_hll_merge", hllMerge, Some(hllMergeSql)),
    VerifiedQuery("q_hll_intersect", hllIntersect, Some(hllIntersectSql)),
    VerifiedQuery("q_hll_det", hllDet, Some(hllDetSql)),
    VerifiedQuery("q_topk_freq", topkFreq, Some(topkFreqSql)),
    VerifiedQuery("q_quantile_sketch", quantileSketch, Some(quantileSketchSql)),
  )
}
