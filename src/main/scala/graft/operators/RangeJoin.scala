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

  /** Inner-join two INTERVAL tables on overlap (`lLo <= rHi AND rLo <= lHi`,
    * all ends inclusive), optionally under equality `keys` — the batch twin
    * of [[graft.streaming.StatefulOps.streamStreamAttribution]]'s
    * stream-stream interval join, and the general form of
    * [[pointInInterval]] (a point is a zero-span interval).
    *
    * Same scale argument as above: the naive predicate plans as a nested
    * loop; here BOTH sides band — each interval replicates to the bands it
    * spans, the join is a plain equi-join on (keys, band), and a pair
    * survives only in the FIRST band the two intervals share
    * (`band == max(⌊lLo/w⌋, ⌊rLo/w⌋)`), so every overlapping pair is
    * produced exactly once with no distinct pass. Long-interval stragglers
    * on either side (span > `maxBandsPerInterval` bands — calendar rows,
    * catch-all windows) leave the fine banding: broadcast + residual filter
    * when the lane is metadata-sized, else a coarser banding at
    * `w · maxBandsPerInterval`. The three lanes partition the pair space
    * (short×short, longL×all, shortL×longR) — no pair is double-counted.
    * The hot path (no stragglers) plans exactly one exchange per side. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      keys: Seq[String] = Nil,
                      bandWidth: Long = 0L,
                      maxBandsPerInterval: Int = 64,
                      maxBroadcastRows: Long = 1L << 22): DataFrame = {
    require(maxBandsPerInterval >= 1, "maxBandsPerInterval must be >= 1")
    val rightOnly = right.columns.toSeq.filterNot(keys.contains)
    val outCols = (keys ++ left.columns.toSeq.filterNot(keys.contains) ++ rightOnly).map(col)
    val w = if (bandWidth > 0) bandWidth
            else math.max(deriveBandWidth(left, lLo, lHi),
                          deriveBandWidth(right, rLo, rHi))
    val overlap = col(lLo).cast("long") <= col(rHi).cast("long") &&
                  col(rLo).cast("long") <= col(lHi).cast("long")

    def bandedLane(a: DataFrame, b: DataFrame, width: Long): DataFrame = {
      val ae = a.withColumn("__band",
        explode(sequence(floorDiv(col(lLo), width), floorDiv(col(lHi), width))))
      val be = b.withColumn("__band",
        explode(sequence(floorDiv(col(rLo), width), floorDiv(col(rHi), width))))
      ae.join(be, keys :+ "__band")
        .filter(overlap &&
          col("__band") === greatest(floorDiv(col(lLo), width), floorDiv(col(rLo), width)))
        .select(outCols: _*)
    }

    def spanBands(lo: String, hi: String) =
      floorDiv(col(hi), w) - floorDiv(col(lo), w) + 1L
    val (lShort, lLong) = (left.filter(spanBands(lLo, lHi) <= maxBandsPerInterval),
                           left.filter(spanBands(lLo, lHi) > maxBandsPerInterval))
    val (rShort, rLong) = (right.filter(spanBands(rLo, rHi) <= maxBandsPerInterval),
                           right.filter(spanBands(rLo, rHi) > maxBandsPerInterval))
    val lane1 = bandedLane(lShort, rShort, w)

    // one metadata-sized count per side; zero stragglers (the common case)
    // keeps the plan a single banded equi-join with no nested-loop node
    def bcastLane(a: DataFrame, b: DataFrame, bcastLeft: Boolean): DataFrame = {
      val (aa, bb) = if (bcastLeft) (broadcast(a), b) else (a, broadcast(b))
      val joined = if (keys.nonEmpty) aa.join(bb, keys, "inner").filter(overlap)
                   else aa.join(bb, overlap)
      joined.select(outCols: _*)
    }
    val (nLongL, nLongR) = (lLong.count(), rLong.count())
    val lane2 =
      if (nLongL == 0L) None
      else if (nLongL <= maxBroadcastRows) Some(bcastLane(lLong, right, bcastLeft = true))
      else Some(bandedLane(lLong, right, w * maxBandsPerInterval))
    val lane3 =
      if (nLongR == 0L) None
      else if (nLongR <= maxBroadcastRows) Some(bcastLane(lShort, rLong, bcastLeft = false))
      else Some(bandedLane(lShort, rLong, w * maxBandsPerInterval))
    (Seq(lane1) ++ lane2 ++ lane3).reduce(_ unionByName _)
  }
}
