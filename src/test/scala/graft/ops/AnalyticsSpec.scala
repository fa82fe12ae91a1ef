package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the behavioral-analytics tier that the SQL oracle
  * equality cannot state: funnel ordering, cohort-matrix structure, and
  * histogram conservation.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("funnel steps are strictly ordered and the depth column is consistent") {
    val rows = Analytics.funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t1 = r.getAs[Long]("view_s")
      val t2 = Option(r.getAs[Any]("click_s")).map(_.asInstanceOf[Long])
      val t3 = Option(r.getAs[Any]("purchase_s")).map(_.asInstanceOf[Long])
      val steps = r.getAs[Int]("steps")
      // strict event-time ordering (>= at second granularity after floor)
      t2.foreach(v => assert(v >= t1))
      (t2, t3) match {
        case (Some(a), Some(b)) => assert(b >= a)
        case (None, Some(_)) => fail("purchase without click")
        case _ => ()
      }
      assert(steps === 1 + t2.size + t3.size)
    }
  }

  test("cohort day-0 row counts every cohort member exactly once") {
    import spark.implicits._
    val out = Analytics.cohort(spark, sf).cache()
    assert(out.filter($"day_offset" < 0).count() === 0)
    // day 0: every user is active on their own first day, so n_users at
    // offset 0 per cohort == cohort size
    val day0 = out.filter($"day_offset" === 0)
      .agg(sum($"n_users")).first().getLong(0)
    val nUsers = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(day0 === nUsers)
    out.unpersist()
  }

  test("histogram conserves rows and totals") {
    import spark.implicits._
    val out = Analytics.histogram(spark, sf).cache()
    val orders = graft.Tables.orders(spark, sf)
    assert(out.agg(sum($"n")).first().getLong(0) === orders.count())
    val exactTotal = orders
      .agg((sum(round($"o_totalprice" * 100).cast("long")) / lit(100.0)))
      .first().getDouble(0)
    assert(math.abs(out.agg(sum($"total")).first().getDouble(0) - exactTotal) < 0.01)
    assert(out.filter($"bin" < 0).count() === 0)
    out.unpersist()
  }
}
