package graft

/** The driver's smoke contract: `SparkEntry.entry` returns >0 rows on
  * sf0.001, and every registered query has either an oracle or a known
  * rows-only justification. */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("rows-only queries are exactly the documented approximate/engine-defined set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Round 4 graduated seg_microbatch_hll / seg_overlap_hll (exact counts
    // plus a deterministic est_ok envelope column) and ann_topk_srp (oracle
    // SQL generated with the hyperplane constants embedded) to
    // oracle-checked; only genuinely engine-defined sketch OUTPUTS remain.
    val expected = Set(
      "seg_idempotent_approx",                                 // approximate sketch output
      "pct_value_sketch")                                      // KLL quantile sketch (approximate)
    assert(rowsOnly == expected,
      s"new queries must ship an oracle or be added here deliberately: ${rowsOnly -- expected}")
  }
}
