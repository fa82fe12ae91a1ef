package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the priority sample, rolling event-time window, and
  * TF-IDF operators beyond their SQL-oracle equality. */
class SamplingWindowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("priority sample returns exactly min(K, group size) rows per group, stably") {
    import spark.implicits._
    val out = Etl.prioritySample(spark, sf).cache()
    val sizes = out.groupBy($"c_mktsegment").agg(count(lit(1)).as("n"),
        max($"rk").as("max_rk")).collect()
    val groupTotals = graft.Tables.customer(spark, sf)
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { r =>
      val expect = math.min(20L, groupTotals(r.getString(0)))
      assert(r.getLong(1) === expect)
      assert(r.getInt(2).toLong === expect) // ranks are 1..n, no gaps
    }
    // determinism: a second evaluation picks the identical members
    val again = Etl.prioritySample(spark, sf)
    assert(out.unionByName(again).distinct().count() === out.count())
    out.unpersist()
  }

  test("rolling window matches a brute-force recomputation per user") {
    import spark.implicits._
    val got = AsOf.rollingWindow(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val evs = graft.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_s"),
        round($"value" * 100).cast("long").as("v_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._2)
    evs.foreach { case (id, user, ts, _) =>
      val frame = byUser(user).filter(e => e._3 >= ts - 3599 && e._3 <= ts)
      val expect = (frame.size.toLong, frame.map(_._4).sum, frame.map(_._4).max)
      assert(got(id) === expect, s"event $id")
    }
  }

  test("tfidf emits at most 5 ranked terms per doc with consistent scores") {
    import spark.implicits._
    val out = LlmData.tfidf(spark, sf).cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.filter($"rk" < 1 || $"rk" > 5).count() === 0)
    assert(out.groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .filter($"c" > 5).count() === 0)
    // score definition holds row by row
    assert(out.filter(
      $"score_micros" =!= $"tf" * expr(s"(${(n + 1) * 1000000L} div (df + 1))"))
      .count() === 0)
    // within a doc, ranks follow non-increasing scores
    val bad = out.as[(Long, String, Long, Long, Long, Int)].collect()
      .groupBy(_._1).values.exists { rows =>
        val sorted = rows.toSeq.sortBy(_._6)
        sorted.sliding(2).exists(w => w.size == 2 && w(1)._5 > w(0)._5)
      }
    assert(!bad)
    out.unpersist()
  }

  test("groupTopK: typed top-k aggregator == row_number window, any partitioning") {
    import spark.implicits._
    val viaAgg = Funcs.groupTopK(spark, sf)
      .select($"o_orderpriority", $"rank", $"o_orderkey", $"price")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // independent recomputation through the window path on the same data
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority")
      .orderBy(round($"o_totalprice" * 100).cast("long").desc, $"o_orderkey")
    val viaWindow = graft.Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"o_orderpriority", $"rank", $"o_orderkey",
        (round($"o_totalprice" * 100).cast("long") / lit(100.0)).as("price"))
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(viaAgg.toSeq == viaWindow.toSeq)
    // partitioning invariance: the merge is associative/commutative, so a
    // different physical layout must produce the identical leaderboard
    val topk = udaf(graft.functions.TopKByPrice)
    val repart = graft.Tables.orders(spark, sf).repartition(13, $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(topk(round($"o_totalprice" * 100).cast("long"), $"o_orderkey").as("top"))
      .select($"o_orderpriority", posexplode($"top"))
      .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rank"),
        $"col.key".as("o_orderkey"), ($"col.cents" / lit(100.0)).as("price"))
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(repart.toSeq == viaAgg.toSeq)
  }

  test("intervalJoin: a session crossing midnight matches bursts in BOTH day buckets") {
    import spark.implicits._
    // user 1's session spans 23:50 → 00:10 across the day-86400 boundary:
    // the banded path must explode it into both day buckets and find the
    // day-0 burst (view) AND the day-1 burst (click) — a single-bucket
    // bug would drop one side.
    val day = 86400L
    val ev = Seq(
      (1L, 1L, "view", day - 600L),      // day 0, 23:50 — also day-0 burst
      (2L, 1L, "click", day + 600L),     // day 1, 00:10 — also day-1 burst
      (3L, 9L, "view", 1000L),           // separate day-0 view widening that burst
      (4L, 9L, "click", day + 7200L))    // separate day-1 click widening that burst
      .toDF("event_id", "user_id", "event_type", "sec")
      .select($"user_id", $"event_id", $"event_type", $"sec")
    val out = AsOf.intervalJoinFrom(ev)
      .select($"event_type", $"n_pairs", $"n_sessions", $"overlap_s")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // user 1's crossing session [day-600, day+600] overlaps the view burst
    // [1000, day-600] (at its right edge) and the click burst
    // [day+600, day+7200] (at its left edge); users 9's point sessions
    // overlap their own bursts too
    assert(out.contains("view") && out.contains("click"))
    assert(out("view")._2 == 2L, "crossing session + day-0 point session both hit the view burst")
    assert(out("click")._2 == 2L, "crossing session must ALSO reach the day-1 burst")
  }

  test("intervalJoin: negative (pre-1970) epochs bucket by floor, not truncation") {
    import spark.implicits._
    // sec -600 belongs to day -1 (floor), but truncating division maps all
    // of (-86400, 0) onto day 0 — merging pre-epoch bursts into day 0 and
    // shrinking the session's day explosion. ADVICE r6: the corpus never
    // goes negative, so this must be pinned structurally by a fixture.
    val ev = Seq(
      (1L, 1L, "view", -600L),   // day -1; session partner of the next row
      (2L, 1L, "view", 600L),    // day 0 — session [-600, 600] crosses the epoch
      (3L, 9L, "view", -7200L))  // point session widening the day -1 burst
      .toDF("event_id", "user_id", "event_type", "sec")
      .select($"user_id", $"event_id", $"event_type", $"sec")
    val out = AsOf.intervalJoinFrom(ev)
      .select($"event_type", $"n_pairs", $"n_sessions", $"overlap_s")
      .as[(String, Long, Long, Long)].head()
    // floor buckets: day -1 burst [-7200, -600], day 0 burst [600, 600];
    // user 1's crossing session reaches BOTH, user 9's reaches day -1 →
    // 3 pairs / 2 sessions. Truncation collapses everything into one day-0
    // burst → 2 pairs, which must fail here.
    assert(out._2 == 3L, s"expected 3 overlap pairs under floor bucketing, got $out")
    assert(out._3 == 2L, s"expected 2 distinct sessions, got $out")
  }

  test("intervalJoin: banded equality join == naive theta-join semantics") {
    import spark.implicits._
    val banded = AsOf.intervalJoin(spark, sf)
      .select($"event_type", $"n_pairs", $"n_sessions", $"overlap_s")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // naive reference: the raw interval-overlap theta join, no banding
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", unix_timestamp($"ts").as("sec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"sec", $"event_id")
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val sess = ev
      .withColumn("gap", $"sec" - lag($"sec", 1).over(w))
      .withColumn("is_new", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"session_seq")
      .agg(min($"sec").as("start_s"), max($"sec").as("end_s"))
    val bursts = ev.withColumn("day", expr("sec div 86400"))
      .groupBy($"event_type", $"day")
      .agg(min($"sec").as("bstart_s"), max($"sec").as("bend_s"))
    val naive = sess.join(bursts,
        $"start_s" <= $"bend_s" && $"bstart_s" <= $"end_s")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"user_id" * 1000000L + $"session_seq").as("n_sessions"),
        sum(least($"end_s", $"bend_s") - greatest($"start_s", $"bstart_s")).as("overlap_s"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(banded.toSeq == naive.toSeq)
  }
}
