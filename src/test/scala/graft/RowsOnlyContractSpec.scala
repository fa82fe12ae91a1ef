package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the rows-only contract registry (r16 verdict item 4) to the
  * queries it describes. The 12 no-oracle queries previously carried
  * their invariants as COVERAGE.md prose only; now each registration
  * embeds a [[RowsOnlyContract]] that Verify dumps
  * (`rows_only_contracts.json`) and tools/check_oracle.py audits against
  * the dumped parquet — column set, row-count invariant, and
  * twin-must-be-oracle-exact-in-the-same-run. This spec keeps the
  * registry itself honest: coverage is exactly the no-oracle set, every
  * declared twin is a real oracled query, and the structural fields are
  * well-formed. The VALUE checks (actual columns/rows vs contract) run
  * against real output in every check_oracle pass, per round and per
  * epoch SF.
  */
class RowsOnlyContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet
  private val oracled = SparkEntry.oracleSql.keySet
  private val contracts = SparkEntry.rowsOnlyContracts

  test("contracts cover EXACTLY the no-oracle registrations") {
    val rowsOnly = names -- oracled
    assert(contracts.keySet == rowsOnly,
      s"missing=${(rowsOnly -- contracts.keySet).toSeq.sorted} " +
        s"extra=${(contracts.keySet -- rowsOnly).toSeq.sorted}")
  }

  test("every declared twin is a registered, ORACLED query") {
    contracts.foreach { case (name, c) =>
      c.twin.foreach { t =>
        assert(names.contains(t), s"$name twin $t not registered")
        assert(oracled.contains(t), s"$name twin $t has no oracle")
      }
    }
  }

  test("contracts are well-formed: reason/test/columns non-empty, a row-count invariant present") {
    contracts.foreach { case (name, c) =>
      assert(c.reason.nonEmpty && c.test.nonEmpty, name)
      assert(c.columns.nonEmpty && c.columns.distinct == c.columns, name)
      assert(c.minRows >= 1, name)
      // beyond the bare min-rows floor, each contract must pin EITHER an
      // exact count or a corpus-derived upper bound — the regression the
      // machinery exists to catch is a silently changed output size
      assert(c.exactRowsSql.isDefined || c.maxRowsSql.isDefined, name)
      (c.exactRowsSql.toSeq ++ c.maxRowsSql).foreach { sql =>
        assert(sql.trim.toUpperCase.startsWith("SELECT"), s"$name: $sql")
      }
    }
  }

  test("learned-float ML contracts carry no twin (no SQL can train a model); seeded ones do") {
    val mlNames = Set("q_rf_congestion", "q_rf_delay", "q_gbt_congestion",
      "q_model_select", "q_quality_classifier")
    mlNames.foreach(n => assert(contracts(n).twin.isEmpty, n))
    (contracts.keySet -- mlNames).foreach(n =>
      assert(contracts(n).twin.isDefined, n))
  }
}
