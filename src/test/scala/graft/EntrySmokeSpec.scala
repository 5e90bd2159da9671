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

  test("every registered query ships an oracle (rows-only set is empty since round 4)") {
    // Round 4 closed the oracle gap completely: the HLL pipelines and
    // seg_idempotent_approx emit exact counts plus deterministic est_ok
    // envelope columns, pct_value_sketch emits an exact-rank gate, and
    // ann_topk_srp's oracle SQL embeds the hyperplane constants. Any new
    // query must ship an oracle or revive this allow-list deliberately.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"new queries must ship an oracle or be allow-listed here deliberately: $rowsOnly")
  }

  test("oracle SQL canonicalizes embedding through FLOAT before arithmetic") {
    // Tables.load pins `embedding` to array<float> whatever width the file
    // ships (a double-list regen is the r06 trap class), so every oracle
    // must view the column through CAST(... AS FLOAT[]) / CAST(... AS FLOAT)
    // before any numeric use — identity on today's float32 file, and the
    // exact round-to-nearest the engine applies on a float64 regen. A raw
    // direct-to-DOUBLE cast or bare unnest would read the file's doubles
    // and diverge at ~1e-9 (caught live by the /tmp regen simulation:
    // embedding_centroids hash-mismatched before this rule).
    val rawTouch = Seq(
      raw"CAST\(\s*(\w+\.)?embedding\s+AS\s+DOUBLE".r,   // whole-array to double
      raw"CAST\(\s*(\w+\.)?embedding\[[^\]]*\]\s+AS\s+DOUBLE".r, // element to double
      raw"unnest\(\s*(\w+\.)?embedding\s*\)".r)          // bare unnest
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if rawTouch.exists(_.findFirstIn(sql).isDefined) => name
    }
    assert(offenders.isEmpty,
      s"oracles reading `embedding` without FLOAT canonicalization: $offenders")
  }
}
