package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift ratchet: README's surface counts must equal the ACTUAL
  * contract surface (`SparkEntry.queries` / `oracleSql`) — they drifted
  * twice (r7: 219→220, r8: 220→221) because nothing enforced them.
  * `sbt test` is part of the round-close loop, so a new query that
  * forgets the README now fails here instead of in the next verdict.
  */
class DocsSyncSpec extends AnyFunSuite {

  // explicit UTF-8: the forked test JVM's default charset is not, and
  // README carries multibyte punctuation
  private lazy val readme = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("README query/oracle counts match the live contract surface") {
    val nq = SparkEntry.queries.size
    val no = SparkEntry.oracleSql.size
    assert(readme.contains(s"$nq queries"),
      s"README must say '$nq queries' (project-layout block) — " +
        "the contract surface moved; update both README sites.")
    assert(readme.contains(s"$nq driver-contract queries"),
      s"README must say '$nq driver-contract queries'.")
    assert(readme.contains(s"($no hash-checked oracles"),
      s"README must say '($no hash-checked oracles'.")
    assert(readme.contains(s"$no carry DuckDB oracle SQL"),
      s"README must say '$no carry DuckDB oracle SQL'.")
  }

  test("every oracle names an existing query; rows-only set is the " +
    "known seeded-hash/fit families") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // each rows-only query must have an oracle-green replayable twin
    // driving the same operator code (COVERAGE.md's twin table)
    val expected = Set("q16_viod", "q27_minhash_lsh", "q28_simhash_pairs",
      "q30_embed_neardup", "q41_neardup_dedup", "q49_lsh_ann",
      "q50_ivf_ann", "q72_ann_recall", "q105_bloom_prod")
    assert(rowsOnly == expected,
      s"rows-only set changed: +${rowsOnly -- expected} " +
        s"-${expected -- rowsOnly} — every rows-only query needs an " +
        "oracle-green twin; update this list AND COVERAGE.md together.")
  }
}
