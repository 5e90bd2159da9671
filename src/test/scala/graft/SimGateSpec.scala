package graft

import scala.sys.process._

/** In-suite pin of the regen-sim GATE itself (VERDICT r10 #5): one cheap
  * shape (`widths` at sf0.001) through the REAL end-to-end path — the
  * pyarrow rewriter (`tools/regen_sim.py`), the engine dump
  * ([[Verify.dumpQueries]]), the oracle emit ([[Verify.writeOracleJson]]),
  * and the DuckDB compare (`tools/diff_oracle.py`) — on a width-sensitive
  * representative query subset. Unit specs cannot see oracle-vs-engine
  * width disagreements (both sides can be consistently wrong); only the
  * cross-engine compare can, and without this spec that compare only runs
  * when someone remembers `bash tools/run_sims.sh`. Runtime budget <60 s.
  *
  * The FULL matrix (every codified shape + the composed gauntlet, all
  * contract queries, sf0.01) stays in `tools/run_sims.sh` — this spec is the canary that the
  * gate's plumbing still works, not a replacement for it. */
class SimGateSpec extends SparkSpec {
  // one query per width-sensitive surface the `widths` sim rewrites:
  // int32 ids + DATE-typed dates (lineitem/orders), float64 embeddings,
  // int32 doc ids, int32 event/user ids — plus the ts-consuming seg query
  private val subset = Seq(
    "seg_naive",            // events: int32 event_id/user_id
    "seg_latest_event",     // events ts → unix seconds output
    "q1_pricing",           // lineitem measures + l_shipdate DATE32
    "q3_revenue",           // orders o_orderdate DATE32 + joins on int32 keys
    "ann_topk_brute",       // embeddings float64 → canonical float
    "dedup_exact_stats",    // documents doc_id int32
    "events_daily",         // date_trunc over normalized ts
    "pct_value_by_type")    // events value measure

  private def repoFile(rel: String): String = {
    val f = new java.io.File(rel)
    assert(f.exists(), s"expected $rel under the working dir (sbt runs at repo root)")
    f.getAbsolutePath
  }

  test("widths regen sim end-to-end: rewrite -> engine dump -> DuckDB compare") {
    // the rewriter + comparator are driver-side python; skip (loudly) only
    // if this environment genuinely lacks them rather than failing the suite
    val pyOk = Process(Seq("python3", "-c", "import pyarrow, duckdb, pandas")).! == 0
    assume(pyOk, "python3 with pyarrow/duckdb/pandas not available")

    val simDir = tmpDir("simgate_widths")
    val outDir = tmpDir("simgate_out")
    val regen = Process(Seq("python3", repoFile("tools/regen_sim.py"),
      "widths", "/root/testdata/sf0.001", simDir)).!
    assert(regen == 0, "regen_sim.py widths failed")

    val errors = Verify.dumpQueries(spark, simDir, outDir, subset.toSet)
    assert(errors.isEmpty, s"engine-side failures on the widths sim: $errors")
    Verify.writeOracleJson(outDir)

    val diff = Process(Seq("python3", repoFile("tools/diff_oracle.py"),
      simDir, outDir) ++ subset).!!
    val bad = diff.linesIterator.filter(l =>
      l.contains("MISMATCH") || l.contains("ERROR") || l.contains("NO SPARK DUMP"))
      .toSeq
    assert(bad.isEmpty, s"oracle compare failures:\n${bad.mkString("\n")}")
    for (name <- subset)
      assert(diff.contains(s"== $name: MATCH"), s"$name did not report MATCH:\n$diff")
  }
}
