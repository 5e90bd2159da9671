package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the Spark rendition of ClickHouse's
  * `uniqState` / `uniqMerge` / `uniq` combinators
  * (/root/reference/src/3-microBatch.test.ts:121,140;
  *  /root/reference/src/2-idempotent.test.ts:86).
  *
  * ClickHouse persists `AggregateFunction(uniq, String)` — a serialized,
  * re-mergeable HLL-family sketch — in an AggregatingMergeTree state table.
  * Spark ≥3.5 ships the exact counterpart natively (Apache DataSketches HLL):
  *
  *   - `uniqState`  ≈ [[uniqState]]  = `hll_sketch_agg`   → BinaryType sketch
  *   - `uniqMerge`  ≈ [[uniqMerge]]  = `hll_union_agg` ∘ `hll_sketch_estimate`
  *   - `uniq`       ≈ [[uniq]]       = `approx_count_distinct` (HLL++)
  *
  * These are Catalyst `TypedImperativeAggregate`s (partial/final split handled
  * by the planner, map-side combine included) — no UDAF, no codegen break in
  * the surrounding plan, and the binary sketch is stable across batches, which
  * is what makes the persisted-state micro-batch design (§2.7 T2) work.
  *
  * Sketch size is O(2^lgK) bytes per group regardless of cardinality, so state
  * stays bounded at 100 TB — unlike exact sets, which grow with the data.
  */
object Sketches {
  /** Default log2 of the HLL register count: 2^12 registers ≈ 1.6% rel. error,
    * ~4 KB per sketch. */
  val DefaultLgK = 12

  /** Partial: per-group serialized mergeable HLL sketch (BinaryType). */
  def uniqState(c: Column, lgK: Int = DefaultLgK): Column = hll_sketch_agg(c, lit(lgK))

  /** Final: merge persisted sketches across batches, estimate the count. */
  def uniqMerge(sketch: Column): Column = hll_sketch_estimate(hll_union_agg(sketch, lit(true)))

  /** Merge sketches without estimating (for state-table compaction). */
  def uniqMergeState(sketch: Column): Column = hll_union_agg(sketch, lit(true))

  /** Estimate a single sketch (no regrouping). */
  def uniqEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One-shot approximate distinct (ClickHouse `uniq`). */
  def uniq(c: Column, rsd: Double = 0.016): Column = approx_count_distinct(c, rsd)
}
