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
    // seg_microbatch_hll / seg_overlap_hll graduated to oracle-checked in
    // round 4: they emit exact counts plus a deterministic est_ok envelope
    // column the oracle reproduces as a literal.
    val expected = Set(
      "seg_idempotent_approx",                                 // approximate sketch output
      "ann_topk_srp",                                          // LSH candidate generation
      "pct_value_sketch")                                      // KLL quantile sketch (approximate)
    assert(rowsOnly == expected,
      s"new queries must ship an oracle or be added here deliberately: ${rowsOnly -- expected}")
  }
}
