package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Tuning}

/** One-off sf1 probe for the two banded/pruned JOIN operators added in the
  * round-6 continuation ([[graft.ops.AsOf.intervalJoin]] and
  * [[graft.ops.Sketches.bloomJoin]]), companion to [[ScaleProbe]]'s
  * iterative-tier measurements: time each at bench SF (sf0.1) and on a
  * synthesized 10× input, so the linear-scaling claims in SCALE.md are
  * measured, not asserted.
  *
  * 10× construction keeps the per-copy structure identical so the ratio
  * isolates data-volume scaling:
  *  - interval join: 10 copies of `events` with user_id/event_id shifted
  *    to disjoint ranges and ts shifted by i×90 days — sessions and burst
  *    windows replicate per copy (disjoint users AND disjoint days, so no
  *    cross-copy pairs; output rows scale ×10, bucket fan-out per
  *    interval is unchanged).
  *  - bloom join: the fact side ×10 (order/cust keys shifted into ranges
  *    the dim does not contain — the extra rows are all prunable), dim
  *    FIXED: measures the InSet pre-filter sweeping 10× the facts while
  *    candidates stay constant — exactly the 100 TB deployment shape
  *    (corpus grows, selective dim does not).
  *
  * Results are pasted into SCALE.md §"sf1 probe". */
object JoinScaleProbe {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tuning.Key, "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(f"[probe] host load at start: ${osBean.getSystemLoadAverage}%.1f")

    // ------------------------------------------------------ interval join
    val ev1 = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_timestamp($"ts").as("sec"))
    def evAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        ev1.select(
          ($"user_id" + lit(i * 1000000000L)).as("user_id"),
          ($"event_id" + lit(i * 1000000000L)).as("event_id"),
          $"event_type",
          ($"sec" + lit(i * 90L * 86400L)).as("sec"))
      }.reduce(_ unionByName _)
    for (copies <- Seq(1, 10)) {
      val ev = evAt(copies).cache()
      ev.count() // materialize input outside the timed window
      val (t, rows) = time(graft.ops.AsOf.intervalJoinFrom(ev).collect())
      val pairs = rows.map(_.getAs[Long]("n_pairs")).sum
      println(f"[probe] interval_join x$copies%2d: $t%6.2f s  ($pairs pairs, load ${osBean.getSystemLoadAverage}%.1f)")
      ev.unpersist()
    }

    // --------------------------------------------------------- bloom join
    val dim = Tables.customer(spark, dir).filter($"c_nationkey" < 5)
      .select($"c_custkey")
    val facts1 = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderpriority", $"o_totalprice")
    def factsAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        facts1.select(
          ($"o_custkey" + lit(i * 1000000000L)).as("o_custkey"),
          $"o_orderpriority", $"o_totalprice")
      }.reduce(_ unionByName _)
    for (copies <- Seq(1, 10)) {
      val facts = factsAt(copies).cache()
      facts.count()
      val (t, rows) = time(graft.ops.Sketches.bloomJoinFrom(dim, facts).collect())
      val cand = rows.map(_.getAs[Long]("n_candidates")).sum
      val joined = rows.map(_.getAs[Long]("n_joined")).sum
      println(f"[probe] bloom_join    x$copies%2d: $t%6.2f s  ($cand candidates, $joined joined, load ${osBean.getSystemLoadAverage}%.1f)")
      facts.unpersist()
    }
    spark.stop()
  }
}
