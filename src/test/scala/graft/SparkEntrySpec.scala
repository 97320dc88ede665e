package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the driver surface: the correctness gate
  * (Verify + DuckDB compare) only checks queries that carry BOTH a
  * `queries` entry and an `oracleSql` entry — a query added without its
  * oracle silently degrades to a rows-only check. As of round 15 the
  * allowlist of intentionally oracle-free rows is EMPTY: the three 3-D
  * LP queries gained the closed-form KR oracle (core.CubeKR) and the
  * two tokenizer trainers the unrolled-merge CTE replays, so every
  * declared query is full-oracle and any new gap fails here, not at
  * the driver. */
class SparkEntrySpec extends AnyFunSuite {

  /** Empty by design — kept (with its checks) so a future SQL-
    * inexpressible operator must be added HERE consciously, with a
    * witness row, instead of silently shipping rows-only. */
  private val noOracleAllowlist = Set.empty[String]

  test("every declared query has a full DuckDB oracle") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- noOracleAllowlist
    assert(missing.isEmpty,
      s"queries without oracleSql (add the oracle or document the " +
        s"exception here AND in FIXTURES.md): ${missing.toSeq.sorted}")
  }

  test("no orphan oracles, and allowlist rows really have no oracle") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: ${orphans.toSeq.sorted}")
    val covered = noOracleAllowlist & SparkEntry.oracleSql.keySet
    assert(covered.isEmpty,
      s"allowlisted-as-no-oracle but an oracle exists (drop from the " +
        s"allowlist): ${covered.toSeq.sorted}")
  }

  test("witness verdict rows still cover the formerly-witness-only queries") {
    // the witnesses stayed as ADDITIONAL evidence when the five rows
    // gained full oracles — the verdict rows must keep naming them so
    // a silently dropped witness shows up here
    val sql = SparkEntry.oracleSql("q_lp_witness") +
      SparkEntry.oracleSql("q_bpe_witness") +
      SparkEntry.oracleSql("q_wordpiece_witness")
    Seq("q_emd3d_pairs", "q_emd3d_topk", "q_treeexact3d_pairs",
      "q_bpe_train", "q_wordpiece_train").foreach(q =>
      assert(sql.contains(s"'$q'"), s"no witness oracle row mentions $q"))
  }
}
