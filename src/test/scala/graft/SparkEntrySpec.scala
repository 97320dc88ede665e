package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the driver surface: the correctness gate
  * (Verify + DuckDB compare) only checks queries that carry BOTH a
  * `queries` entry and an `oracleSql` entry — a query added without its
  * oracle silently degrades to a rows-only check. Pin the allowlist of
  * intentionally oracle-free rows (the three 3-D LP queries, whose
  * verification is the in-engine cross-check plus the hash-checked
  * q_lp_witness verdict) so any new gap fails here, not at the driver. */
class SparkEntrySpec extends AnyFunSuite {

  private val noOracleAllowlist = Set(
    "q_emd3d_pairs", "q_emd3d_topk", "q_treeexact3d_pairs")

  test("every declared query has an oracle or is on the LP allowlist") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- noOracleAllowlist
    assert(missing.isEmpty,
      s"queries without oracleSql (add the oracle or document the " +
        s"exception here AND in FIXTURES.md): ${missing.toSeq.sorted}")
  }

  test("no orphan oracles, and the allowlist rows really have no oracle") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: ${orphans.toSeq.sorted}")
    val covered = noOracleAllowlist & SparkEntry.oracleSql.keySet
    assert(covered.isEmpty,
      s"allowlisted-as-no-oracle but an oracle exists (drop from the " +
        s"allowlist): ${covered.toSeq.sorted}")
  }

  test("the LP witness verdict row covers exactly the no-oracle queries") {
    // q_lp_witness emits one row per allowlisted LP query; if the
    // allowlist grows, the witness query and its literal oracle must too
    val sql = SparkEntry.oracleSql("q_lp_witness")
    noOracleAllowlist.foreach(q =>
      assert(sql.contains(s"'$q'"), s"q_lp_witness oracle misses $q"))
  }
}
