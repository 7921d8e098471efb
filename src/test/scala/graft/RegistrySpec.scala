package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the correctness gate compares
  * `SparkEntry.queries` dumps against `SparkEntry.oracleSql` BY NAME, so a
  * misspelled oracle key silently downgrades its query to a rows-only
  * check (and an orphan oracle checks nothing at all). These are pure
  * map-shape assertions — no Spark session.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key has a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted}")
  }

  test("the no-oracle rows are exactly the documented exceptions") {
    // Each name here is a DELIBERATE rows-only row: xxhash64 fast paths
    // twinned by an md5 row, the reference-CSV PlayStore pipelines
    // (DuckDB cannot see the bundled resource), genuinely approximate
    // sketches with exact twins, and the spec-pinned batched BPE.
    // Growing this set is a deliberate act — add the justification here.
    // (round 16: the normalized-float mm_features row retired — its
    // integer twin mm_features_fix is oracled and the float
    // presentation is spec-pinned in Round16OpsSpec — set was 13.)
    // (round 17: mm_fingerprint_fast added — the xxhash64 production
    // fast path of the media fingerprint; DuckDB cannot replay
    // xxhash64, the oracled md5 row mm_fingerprint is its twin, and
    // Round17OpsSpec pins the two faces' near-dup pair sets identical
    // — set is 14.)
    // (round 18: mm_neardup_pairs_fast and mm_dedup_decision_fast added
    // — the fast family's serve surface, pairs + decision over the
    // xxhash64 face; same justification as mm_fingerprint_fast (DuckDB
    // cannot replay xxhash64), Round18OpsSpec pins both frames
    // identical to their oracled md5 twins on the spec corpus — set is
    // 16.)
    val expected = Set(
      "mm_fingerprint_fast",
      "mm_neardup_pairs_fast", "mm_dedup_decision_fast",
      "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_substring_pairs",
      "sketch_merge", "sketch_profile",
      "txt_bpe_merges", "txt_fingerprints",
      "ps_part1_sentiment", "ps_part2_best_apps", "ps_part3_standardize",
      "ps_part4_cleaned", "ps_part5_metrics",
      // HLL inclusion-exclusion overlap is an estimate by nature; its
      // exact twin sketch_intersect_exact is the oracled anchor and
      // RelationalSketchSpec pins the estimate against the exact twin
      "sketch_hll_intersect")
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == expected,
      s"no-oracle set drifted: unexpected=${(actual -- expected).toSeq.sorted}, " +
        s"missing=${(expected -- actual).toSeq.sorted}")
  }
}
