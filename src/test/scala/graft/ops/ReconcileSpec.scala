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
