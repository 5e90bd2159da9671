package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch point-in-interval (range) join over a numeric/time domain.
  *
  * Spark has no native range-join operator: `points JOIN intervals ON p
  * BETWEEN lo AND hi` plans as a BroadcastNestedLoopJoin (or worse, a
  * CartesianProduct), which is O(|points|·|intervals|) work regardless of
  * selectivity — the classic 100 TB cliff. The scale-right plan is the
  * standard banding decomposition: pick a band width `w`, replicate every
  * interval to each band it overlaps (`⌊lo/w⌋ .. ⌊hi/w⌋`), map each point to
  * its single band, then EQUI-join on the band and keep pairs passing the
  * residual `lo <= p <= hi`. Each matching pair is produced exactly once
  * (the point's band is unique), the join is a plain shuffled/broadcast hash
  * join Catalyst and AQE already know how to size, split and reorder, and
  * the only tuning knob — replication factor = avg(span)/w + 1 — is set
  * from the interval-length distribution itself when `bandWidth <= 0`.
  *
  * Long-interval stragglers (span ≫ median) would explode to thousands of
  * bands under the median-derived `w`, so intervals wider than
  * `maxBandsPerInterval` bands take a separate lane: broadcast + residual
  * filter when the lane is small (they almost always are — "whole-domain"
  * calendar rows, catch-all buckets), else a coarser banding at
  * `w · maxBandsPerInterval` (second shuffle of the points, but still an
  * equi-join — never a nested loop over the full corpus). The hot path
  * (no long intervals) plans exactly one exchange of each side.
  *
  * Counterpart of [[AsOf.joinAsOf]] (match the latest row at-or-before) for
  * the "match every containing interval" semantics: promotional windows,
  * maintenance windows, IP-range and geo-fence lookups, sensor epochs.
  */
object RangeJoin {

  /** Exact floor division for longs (negative-safe: `pmod` is the
    * non-negative remainder, so this rounds toward −∞, unlike `/`). The
    * divide runs in decimal, not double — `(x - pmod) / w` is exactly
    * divisible, and decimal keeps it exact even for nanosecond-scale
    * domains where the numerator exceeds 2^53. */
  private def floorDiv(x: Column, w: Long): Column = {
    val xl = x.cast("long")
    ((xl - pmod(xl, lit(w))).cast("decimal(38,0)") / lit(w).cast("decimal(38,0)"))
      .cast("long")
  }

  /** Median interval span (inclusive, in domain units) — the band width that
    * bounds the expected replication factor at ~2-3 for non-degenerate
    * interval mixes. One metadata-sized aggregate over the interval table. */
  private[graft] def deriveBandWidth(intervals: DataFrame, loCol: String,
                                     hiCol: String): Long = {
    val row = intervals
      .select(percentile_approx(col(hiCol).cast("long") - col(loCol).cast("long") + 1L,
                                lit(0.5), lit(1000)).as("m"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Inner-join `points` to every interval containing them:
    * `lo <= point <= hi`, both ends inclusive. Output carries all columns of
    * both inputs (names must not collide). `bandWidth <= 0` derives the
    * width from the median interval span ([[deriveBandWidth]]).
    *
    * Deterministic output set; row order is not defined (aggregate or sort
    * downstream, as with any join). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bandWidth: Long = 0L,
                      maxBandsPerInterval: Int = 64,
                      maxBroadcastRows: Long = 1L << 22): DataFrame = {
    require(maxBandsPerInterval >= 1, "maxBandsPerInterval must be >= 1")
    val outCols = (points.columns ++ intervals.columns).toSeq.map(col)
    val w = if (bandWidth > 0) bandWidth else deriveBandWidth(intervals, loCol, hiCol)
    val resid = col(pointCol).cast("long").between(col(loCol).cast("long"),
                                                   col(hiCol).cast("long"))

    def bandedLane(iv: DataFrame, width: Long): DataFrame = {
      val exploded = iv.withColumn("__band",
        explode(sequence(floorDiv(col(loCol), width), floorDiv(col(hiCol), width))))
      points.withColumn("__band", floorDiv(col(pointCol), width))
        .join(exploded, Seq("__band"))
        .filter(resid)
        .select(outCols: _*)
    }

    val nBands = floorDiv(col(hiCol), w) - floorDiv(col(loCol), w) + 1L
    val short = intervals.filter(nBands <= maxBandsPerInterval)
    val long_ = intervals.filter(nBands > maxBandsPerInterval)
    val lane1 = bandedLane(short, w)

    // the count is one pass over the (side-relation-sized) interval table;
    // the common case — no degenerate spans — keeps the plan a single
    // banded equi-join with no nested-loop node anywhere in it
    val nLong = long_.count()
    if (nLong == 0L) lane1
    else if (nLong <= maxBroadcastRows)
      lane1.unionByName(
        points.join(broadcast(long_), resid).select(outCols: _*))
    else
      lane1.unionByName(bandedLane(long_, w * maxBandsPerInterval))
  }
}
