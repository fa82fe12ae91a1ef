package graft.ops

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Pins the machine-readable oracle SF-validity contracts (r14 verdict
  * item 3) to the FUNCTIONS they describe, so the bounds in the registry
  * can never drift from the adaptive schedules they annotate. The sf1
  * epoch previously printed two unexplained `FAIL` lines for
  * `q_ann_batch`/`q_ann_lsh_adaptive` and relied on COVERAGE.md prose;
  * with the contracts dumped by Verify (`oracle_contracts.json`) and
  * honored by tools/check_oracle.py, epochs self-report
  * "exact + by-contract + fail" with zero unexplained failures. */
class OracleContractSpec extends AnyFunSuite {

  test("AdaptiveGadgetMaxN is exactly where adaptiveSignBits leaves the gadget floor") {
    val floor = Similarity.adaptiveSignBits(1L) // = AnnBits by construction
    assert(Similarity.adaptiveSignBits(Similarity.AdaptiveGadgetMaxN) == floor,
      "bound too high: the schedule already widened at the declared max")
    assert(Similarity.adaptiveSignBits(Similarity.AdaptiveGadgetMaxN + 1) == floor + 1,
      "bound too low: the schedule still coincides past the declared max")
  }

  test("BatchGadgetMaxN is exactly where the batch query count leaves 3, and binds before the bits axis") {
    assert(math.max(3L, Similarity.BatchGadgetMaxN / 1000L) == 3L)
    assert(math.max(3L, (Similarity.BatchGadgetMaxN + 1) / 1000L) > 3L)
    // the query-count axis departs first, so the batch bound is the
    // binding one — if this flips, the contract must move to the bits axis
    assert(Similarity.BatchGadgetMaxN + 1 <= Similarity.AdaptiveGadgetMaxN)
  }

  test("registry carries exactly the two adaptive-family contracts, each over an oracled query") {
    val cs = SparkEntry.oracleContracts
    assert(cs.keySet == Set("q_ann_lsh_adaptive", "q_ann_batch"),
      s"unexpected contract set: ${cs.keySet}")
    for ((name, c) <- cs) {
      assert(SparkEntry.oracleSql.contains(name),
        s"$name has a contract but no oracle — a contract annotates an ORACLED query")
      assert(c.table == "embeddings" && c.maxRows > 0 && c.reason.nonEmpty)
    }
    assert(cs("q_ann_lsh_adaptive").maxRows == Similarity.AdaptiveGadgetMaxN)
    assert(cs("q_ann_batch").maxRows == Similarity.BatchGadgetMaxN)
  }
}
