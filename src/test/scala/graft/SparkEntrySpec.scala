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

  /** The three 3-D LP queries (verified by the in-engine cross-check +
    * the hash-checked q_lp_witness verdict) and the BPE merge table
    * (iterative argmax — verified by the independent sequential trainer
    * behind the hash-checked q_bpe_witness verdict; FIXTURES.md
    * "witness-verdict queries"). */
  private val noOracleAllowlist = Set(
    "q_emd3d_pairs", "q_emd3d_topk", "q_treeexact3d_pairs", "q_bpe_train",
    "q_wordpiece_train")

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

  test("witness verdict rows cover exactly the no-oracle queries") {
    // the witness queries emit one verdict row per allowlisted query;
    // if the allowlist grows, a witness query and its literal oracle
    // must grow with it
    val sql = SparkEntry.oracleSql("q_lp_witness") +
      SparkEntry.oracleSql("q_bpe_witness") +
      SparkEntry.oracleSql("q_wordpiece_witness")
    noOracleAllowlist.foreach(q =>
      assert(sql.contains(s"'$q'"), s"no witness oracle row mentions $q"))
  }
}
