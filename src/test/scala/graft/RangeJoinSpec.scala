package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Banded point-in-interval join vs an in-process brute force (cross join +
  * filter), across band widths, lane dispatches, and sign regimes.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points straddling zero (floor-division sign trap) plus exact boundary hits
  private lazy val points = {
    val rnd = new scala.util.Random(7)
    ((1 to 300).map(i => (i.toLong, rnd.nextLong() % 500L)) ++
      Seq((900L, -100L), (901L, 100L), (902L, 0L))) // lo/hi boundary probes
      .toDF("pid", "p")
  }

  // overlapping intervals of mixed span, including one whole-domain straggler
  private lazy val intervals = {
    val rnd = new scala.util.Random(11)
    ((1 to 40).map { i =>
      val lo = rnd.nextLong() % 400L
      (i.toLong, lo, lo + rnd.nextInt(120))
    } :+ ((99L, -100L, 100L)) :+ ((100L, -500L, 500L))) // straggler spans all
      .toDF("iid", "lo", "hi")
  }

  private def brute(pts: DataFrame, ivs: DataFrame): Set[(Long, Long)] =
    pts.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select($"pid", $"iid").as[(Long, Long)].collect().toSet

  private lazy val expected = brute(points, intervals)

  test("banded join == brute force (explicit width, negatives, inclusive ends)") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = pairs(RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
                                                bandWidth = w))
      assert(got == expected, s"bandWidth=$w")
    }
    assert(expected.contains((900L, 99L)) && expected.contains((901L, 99L)),
      "boundary points must match inclusively")
  }

  test("auto band width == brute force") {
    val w = RangeJoin.deriveBandWidth(intervals, "lo", "hi")
    assert(w >= 1L)
    val got = pairs(RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi"))
    assert(got == expected)
  }

  test("long-interval broadcast lane == brute force") {
    // width 1 makes every interval a long one except zero-span; the
    // broadcast lane carries them all
    val got = pairs(RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
      bandWidth = 1L, maxBandsPerInterval = 1))
    assert(got == expected)
  }

  test("coarse-band fallback lane == brute force") {
    val got = pairs(RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
      bandWidth = 1L, maxBandsPerInterval = 4, maxBroadcastRows = 0L))
    assert(got == expected)
  }

  test("mixed lanes (short banded + long broadcast together) == brute force") {
    // width 16: the two stragglers exceed 4 bands, the rest mostly don't —
    // both lanes are live in one call and their union must be exact
    val got = pairs(RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
      bandWidth = 16L, maxBandsPerInterval = 4))
    assert(got == expected)
  }

  test("empty interval table joins to nothing") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, "p", empty, "lo", "hi").count() == 0L)
  }

  test("hot path plans a hash equi-join — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        bandWidth = 64L, maxBandsPerInterval = 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // --- interval x interval overlap join -----------------------------------

  // two interval tables of mixed span (incl. zero-span points, negatives, and
  // whole-domain stragglers on BOTH sides) under a low-cardinality key so
  // key-collisions are plentiful
  private lazy val leftIv = {
    val rnd = new scala.util.Random(13)
    ((1 to 60).map { i =>
      val lo = rnd.nextLong() % 400L
      (i.toLong, i.toLong % 3, lo, lo + rnd.nextInt(120))
    } :+ ((98L, 0L, -450L, 450L)) :+ ((99L, 1L, 5L, 5L)))
      .toDF("lid", "k", "a_lo", "a_hi")
  }
  private lazy val rightIv = {
    val rnd = new scala.util.Random(17)
    ((1 to 50).map { i =>
      val lo = rnd.nextLong() % 400L
      (i.toLong, i.toLong % 3, lo, lo + rnd.nextInt(90))
    } :+ ((88L, 1L, -500L, 500L)) :+ ((89L, 2L, -7L, -7L)))
      .toDF("rid", "k", "b_lo", "b_hi")
  }

  private def bruteOverlap(keyed: Boolean): Set[(Long, Long)] =
    leftIv.crossJoin(rightIv.withColumnRenamed("k", "k2"))
      .filter($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi" &&
              (if (keyed) $"k" === $"k2" else lit(true)))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet

  private def overlapPairs(df: DataFrame): Seq[(Long, Long)] =
    df.select($"lid", $"rid").as[(Long, Long)].collect().toSeq

  test("interval overlap == brute force across widths, keyed and unkeyed") {
    for (keyed <- Seq(true, false); w <- Seq(0L, 1L, 16L, 1000L)) {
      val right = if (keyed) rightIv else rightIv.drop("k")
      val left = if (keyed) leftIv else leftIv.drop("k")
      val got = overlapPairs(RangeJoin.intervalOverlap(
        left, "a_lo", "a_hi", right, "b_lo", "b_hi",
        keys = if (keyed) Seq("k") else Nil, bandWidth = w))
      assert(got.toSet == bruteOverlap(keyed), s"keyed=$keyed w=$w")
      assert(got.size == got.toSet.size, s"duplicate pairs at keyed=$keyed w=$w")
    }
  }

  test("interval overlap straggler lanes (broadcast and coarse-band) == brute force") {
    for (maxBcast <- Seq(1L << 22, 0L)) { // broadcast lane, then coarse-band lane
      val got = overlapPairs(RangeJoin.intervalOverlap(
        leftIv, "a_lo", "a_hi", rightIv, "b_lo", "b_hi", keys = Seq("k"),
        bandWidth = 8L, maxBandsPerInterval = 4, maxBroadcastRows = maxBcast))
      assert(got.toSet == bruteOverlap(keyed = true), s"maxBroadcastRows=$maxBcast")
      assert(got.size == got.toSet.size, s"duplicates at maxBroadcastRows=$maxBcast")
    }
  }

  test("interval overlap hot path plans equi-joins only — no nested loop, no cartesian") {
    val plan = RangeJoin.intervalOverlap(
        leftIv, "a_lo", "a_hi", rightIv, "b_lo", "b_hi", keys = Seq("k"),
        bandWidth = 64L, maxBandsPerInterval = 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
