package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact contract (ROUND6.md §1): the driver keeps only
  * the last ~2000 chars of Bench stdout, so the compact summary — the
  * FINAL printed line — must always fit that window whole and must parse
  * as one JSON object. Rounds 3–5 lost their official bench record to a
  * front-truncated 10 KB line; this spec keeps that from regressing.
  */
class BenchSummarySpec extends AnyFunSuite {

  private def line(nFailed: Int) = Bench.compactSummary(
    total = 193.579453952,
    sfDir = "/root/testdata/sf0.1",
    iters = 3,
    nQueries = 500, // far above any realistic registry size
    iterTotals = Seq(287.36283734500006, 185.41413568500002, 182.50865370500003),
    iterLoads = Seq(4.94873046875, 5.06005859375, 5.59765625),
    failedNames = (1 to nFailed).map(i => s"q_some_long_query_name_$i"),
    hostCpus = 32, sparkCpus = "32",
    startLoad = 4.94873046875, loadThreshold = 2.0, loadWaitedSec = 300,
    iterExternalLoads = Seq(3.1, 0.4, 0.2), calibSec = 1.234)

  test("compact summary stays far under the 2000-char stdout tail window") {
    // worst realistic case: every-query-failed still fits because the
    // failed-name list is truncated at 600 chars inside compactSummary
    assert(line(0).length < 1500, s"len=${line(0).length}")
    assert(line(500).length < 1500, s"len=${line(500).length}")
  }

  test("compact summary is one parseable JSON object with the headline fields") {
    val l = line(2)
    assert(!l.contains("\n"))
    // minimal structural checks without a JSON lib on the classpath:
    // balanced braces, the fields the driver and bench_delta.py read
    assert(l.head == '{' && l.last == '}')
    assert(l.count(_ == '{') == 1 && l.count(_ == '}') == 1)
    Seq("\"metric\":\"total_median\"", "\"value\":", "\"iter_totals\":",
      "\"iter_load_avg\":", "\"n_queries\":", "\"n_failed\":2",
      // load-gate verdict (r7 item 1): fixture start load 4.9 > threshold 2
      "\"start_load_avg\":", "\"load_waited_sec\":300", "\"contended\":true",
      // per-iteration external-load attribution (r11 item 5) + the
      // fixed host-speed calibration probe (r12)
      "\"iter_external_load\":[3.1,0.4,0.2]", "\"calib_sec\":1.234").foreach { f =>
      assert(l.contains(f), s"missing $f in: $l")
    }
  }

  test("a clean start with one contended iteration still flags contended") {
    // r11's driver artifact: start gate passed, contention arrived mid-run
    // — the per-iteration external-load residual must set the flag
    val l = Bench.compactSummary(
      total = 190.0, sfDir = "sf", iters = 3, nQueries = 171,
      iterTotals = Seq(210.0, 188.0, 189.0), iterLoads = Seq(9.0, 6.0, 5.5),
      failedNames = Nil, hostCpus = 32, sparkCpus = "32",
      startLoad = 0.5, loadThreshold = 2.0, loadWaitedSec = 0,
      iterExternalLoads = Seq(4.2, 0.3, 0.1))
    assert(l.contains("\"contended\":true"), l)
    val clean = Bench.compactSummary(
      total = 190.0, sfDir = "sf", iters = 3, nQueries = 171,
      iterTotals = Seq(190.0, 188.0, 189.0), iterLoads = Seq(6.0, 6.0, 5.5),
      failedNames = Nil, hostCpus = 32, sparkCpus = "32",
      startLoad = 0.5, loadThreshold = 2.0, loadWaitedSec = 0,
      iterExternalLoads = Seq(0.2, 0.3, 0.1))
    assert(clean.contains("\"contended\":false"), clean)
  }
}
