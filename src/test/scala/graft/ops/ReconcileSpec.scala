package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wave-5 operator properties: snapshot-diff class membership vs brute
  * force, chi-square contributions recomputed from first principles,
  * bit-shift decay scores vs an in-memory evaluation, and ordered
  * string-agg invariants.
  */
class ReconcileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dataset diff classes match brute-force replanting") {
    val got = Reconcile.datasetDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val keys = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = keys.flatMap { case (k, p) =>
      val inCur = k % 89 != 0
      val inOld = k % 97 != 0
      val changed = inOld && inCur && k % 13 == 0 // old price shifted +1000
      if (inCur && !inOld) Some(("added", k, p))
      else if (!inCur && inOld) Some(("removed", k, if (k % 13 == 0) p + 1000 else p))
      else if (inCur && inOld) Some((if (changed) "changed" else "same", k, p))
      else None
    }.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
    }
    assert(got === want)
    assert(got.keySet === Set("added", "removed", "changed", "same"))
  }

  test("chi-square contributions recompute from each row's own counts") {
    val rows = Reconcile.driftChi2(spark, sf).collect()
    assert(rows.nonEmpty)
    val nRef = rows.head.getAs[Long]("n_ref")
    val nCur = rows.head.getAs[Long]("n_cur")
    assert(rows.map(_.getAs[Long]("ref_n")).sum === nRef)
    assert(rows.map(_.getAs[Long]("cur_n")).sum === nCur)
    rows.foreach { r =>
      val (ref, cur) = (r.getAs[Long]("ref_n"), r.getAs[Long]("cur_n"))
      if (ref == 0) assert(r.isNullAt(r.fieldIndex("contrib")))
      else {
        val exp = ref.toDouble * nCur / nRef
        val want = (cur - exp) * (cur - exp) / exp
        assert(math.abs(r.getAs[Double]("contrib") - want) < 1e-9, s"bin ${r.get(0)}")
      }
    }
  }

  test("decay scores match an in-memory bit-shift evaluation") {
    val got = Analytics.decayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val refDay = ev.map(_._2).max
    def days(a: String, b: String) =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
    val want = ev.groupBy(_._1).map { case (u, es) =>
      u -> (es.size.toLong,
        es.map { case (_, d, c) =>
          (c * 10000L) / (1L << math.min(days(d, refDay), 40L).toInt)
        }.sum,
        es.map(_._2).max)
    }
    assert(got === want)
  }

  test("BPE encoding: merges only shrink, fertility and compression bounded") {
    val rows = Bpe.bpeEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc, nt) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      assert(nt <= nc, "a merge can only shrink the token count")
      assert(nt >= nw, "every word is at least one token")
      assert(r.getAs[Long]("fertility_micro") === nt * 1000000L / nw)
      assert(r.getAs[Long]("compression_micro") === nc * 1000000L / nt)
      assert(r.getAs[Long]("compression_micro") >= 1000000L)
    }
    // the 10 merges genuinely compress this corpus below 1 token/char
    assert(rows.map(_.getAs[Long]("n_tokens")).sum <
      rows.map(_.getAs[Long]("n_chars")).sum)
  }

  test("unpivot profiles every measure over every row") {
    val rows = Relational.unpivotMeasures(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = graft.Tables.lineitem(spark, sf).count()
    assert(rows.keySet === Set("qty_c", "price_c", "disc_c", "tax_c"))
    rows.values.foreach { case (cnt, _) => assert(cnt === n) }
    val direct = graft.Tables.lineitem(spark, sf)
      .agg(sum(round(col("l_quantity") * 100).cast("long"))).head().getLong(0)
    assert(rows("qty_c")._2 === direct)
  }

  test("label propagation separates planted communities and matches the recurrence") {
    import spark.implicits._
    // two 4-cliques bridged by one edge: mode-voting keeps them distinct
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L))
      .toDF("u", "v")
    val got = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: same synchronous mode recurrence
    val sym = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = sym.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nodes.map { n =>
        val votes = sym.collect { case (s, d) if d == n => labels(s) }
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }.toMap
    }
    assert(got === labels)
    val c1 = Set(1L, 2L, 3L, 4L).map(got)
    val c2 = Set(10L, 11L, 12L, 13L).map(got)
    assert(c1.size === 1 && c2.size === 1 && c1 != c2, "cliques form distinct communities")
  }

  test("survivorship picks the longest-then-smallest record per canonical URL") {
    val out = Url.urlSurvivorship(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), length(col("text")),
        Url.canonical(Url.plantedUrl(col("source"), col("doc_id"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .groupBy(_._4)
    assert(out.map(_.getAs[Long]("n_merged")).sum === docs.values.map(_.size).sum)
    out.foreach { r =>
      val cluster = docs(r.getAs[String]("canonical_url"))
      val want = cluster.minBy { case (id, _, len, _) => (-len, id) }
      assert(r.getAs[Long]("survivor_id") === want._1)
      assert(r.getAs[Long]("n_merged") === cluster.size)
      assert(r.getAs[String]("sources").split(",").toSet === cluster.map(_._2).toSet)
    }
  }

  test("token budget keeps a maximal quality-first prefix within 1000 tokens") {
    import graft.functions.Text
    val out = LlmData.tokenBudget(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_tokens"), r.getAs[Long]("total_tokens"))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), LlmData.qualityCol(col("text")).as("q"),
        Text.tokenCount(col("text")).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    docs.foreach { case (src, ds) =>
      val ordered = ds.sortBy { case (_, id, q, _) => (-q, id) }
      val cum = ordered.scanLeft(0L)(_ + _._4).tail
      val kept = ordered.zip(cum).takeWhile(_._2 <= 1000L)
      val (nKept, keptTok, totalTok) = out(src)
      assert(nKept === kept.size, s"source $src")
      assert(keptTok === kept.map(_._1._4).sum)
      assert(totalTok === ds.map(_._4).sum)
      assert(keptTok <= 1000L)
    }
  }

  test("string agg is sorted, complete and consistent with the count") {
    val rows = Funcs.stringAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getAs[String]("names").split(",").toSeq
      assert(names === names.sorted, s"${r.get(0)} unsorted")
      assert(names.size === r.getAs[Long]("n_suppliers"))
      assert(r.getAs[String]("keys").split(",").length === names.size)
    }
  }
}
