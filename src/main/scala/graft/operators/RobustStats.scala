package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (outlier-resistant) per-group statistics for feature pipelines:
  * winsorization — clip every value into the group's [q_lo, q_hi] exact
  * quantile band before aggregating, so a handful of corrupt rows cannot
  * drag a feature's mean.
  *
  * The quantile bounds are DISCRETE (the value at sorted position
  * `ceil(q·n)`), not interpolated: bounds are then actual data values, every
  * clipped value is an actual data value, and all downstream sums stay on
  * the exact-decimal path — interpolated quantiles would inject
  * full-mantissa doubles whose decimal rescaling rounds differently across
  * engines. The position is computed as `ceil(q·n − 1e-9)`: q·n in doubles
  * can land a hair ABOVE the rational product (e.g. 0.01·300 →
  * 3.0000000000000004), and the under-ceil guard keeps the index exact on
  * both sides of an oracle.
  *
  * Plan shape: one per-group sort for the rank pass (groups partition the
  * shuffle; per-group exact quantiles are inherently sort-bound — the 100 TB
  * approximate path is the mergeable KLL state in
  * [[graft.functions.QuantileSketch]], same contract, rank-gated oracle),
  * then the bounds — one row per group — broadcast back for a map-side
  * clip + partial aggregation. No second sort, no single-partition stage.
  */
object RobustStats {

  def winsorizedStats(df: DataFrame, keyCol: String, valueCol: String,
                      qLo: Double = 0.01, qHi: Double = 0.99): DataFrame = {
    require(qLo >= 0.0 && qHi <= 1.0 && qLo < qHi, "need 0 <= qLo < qHi <= 1")
    // null values are excluded outright: engines disagree on null sort
    // position (Spark NULLS FIRST, others NULLS LAST), and a null clips to
    // nothing meaningful anyway
    val clean = df.select(col(keyCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val ranked = clean
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    // clamp to rank 1: qLo = 0.0 would otherwise target rank 0, match no
    // row, and silently null every clipped value ("no lower clip" must mean
    // lo = group minimum, not lo = NULL)
    def kOf(q: Double) =
      greatest(lit(1L), ceil(lit(q) * col("n") - lit(1e-9)).cast("long"))
    // value at the target rank; ties in `valueCol` make the rank assignment
    // nondeterministic but the VALUE at position k is not (sorted multiset)
    val bounds = ranked
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
           min(when(col("rn") === kOf(qLo), col(valueCol))).as("lo"),
           min(when(col("rn") === kOf(qHi), col(valueCol))).as("hi"))
    val clipped = least(greatest(col(valueCol), col("lo")), col("hi"))
    clean.join(broadcast(bounds), Seq(keyCol))
      .withColumn("cv", clipped)
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
           max(col("lo")).as("lo"),
           max(col("hi")).as("hi"),
           sum((col(valueCol) < col("lo") || col(valueCol) > col("hi"))
                 .cast("long")).as("n_clipped"),
           sum(col("cv").cast("decimal(27,6)")).cast("double").as("wins_sum"))
      .withColumn("wins_mean", col("wins_sum") / col("n"))
  }

  /** Median absolute deviation (the standard robust scale estimator,
    * ClickHouse-family `quantileExact`-composed): per group, the exact
    * discrete lower median of the values and the exact lower median of the
    * absolute deviations from it.
    *
    * Plan shape: values collapse to VALUE-DOMAIN granularity first
    * (`groupBy(key, value)` with map-side partial counts — values carry ≤2
    * decimals, so the grouped frame is bounded far below row count), both
    * medians are cumulative-count picks over that tiny frame (the ccnet
    * tercile-bounds discipline — the rank window never touches a row-sized
    * frame), and the #keys-sized median frame broadcasts back for the
    * deviation pass. All arithmetic decimal-exact; the only doubles are
    * the digit-string casts of the two outputs. */
  def madStats(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val clean = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
              col(valueCol).cast("string").cast("decimal(12,2)").as("v"))
    val g = clean.groupBy(col(keyCol), col("v")).agg(count(lit(1)).as("c"))
    // exact discrete lower median over a (key, value)-grouped frame: the
    // smallest value whose cumulative count reaches ceil(n/2)
    def pick(grp: DataFrame, vCol: String, out: String): DataFrame = {
      val wCum = Window.partitionBy(col(keyCol)).orderBy(col(vCol))
      val wAll = Window.partitionBy(col(keyCol))
      grp.withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy(col(keyCol))
        .agg(max(col("n")).as("n"),
             min(when(col("cum") >= expr("(n + 1) DIV 2"), col(vCol))).as(out))
    }
    val med = pick(g, "v", "med")
    val devs = g.join(broadcast(med.select(col(keyCol), col("med"))), Seq(keyCol))
      .withColumn("dev", abs(col("v") - col("med")))
      .groupBy(col(keyCol), col("dev")).agg(sum(col("c")).as("c"))
    val mad = pick(devs, "dev", "mad")
    med.join(broadcast(mad.select(col(keyCol), col("mad"))), Seq(keyCol))
      .select(col(keyCol), col("n"),
              col("med").cast("string").cast("double").as("median"),
              col("mad").cast("string").cast("double").as("mad"))
  }

  /** ClickHouse `quantileExactWeighted(q)(value, weight)` per group: the
    * smallest value whose cumulative weight reaches `ceil(q·W)` when the
    * group is scanned in value order (weights integral and positive).
    *
    * Determinism under value ties: the cumulative-weight window assigns
    * tie rows order-dependent partial sums, but the RESULT — the minimum
    * value with any row's cumulative weight ≥ the target — depends only on
    * each tie block's END weight, which is order-invariant; both engines
    * agree regardless of intra-tie order (and of ROWS vs RANGE framing).
    * The target uses the same under-ceil guard as the winsorized bounds.
    *
    * Plan shape: one per-group sort (the same inherent cost as
    * [[winsorizedStats]]'s rank pass; the 100 TB approximate path is the
    * weighted KLL variant), then a group-local aggregate — no second sort,
    * no single-partition stage, no join at all. */
  def weightedQuantile(df: DataFrame, keyCol: String, valueCol: String,
                       weightCol: String, q: Double = 0.5): DataFrame =
    weightedQuantiles(df, keyCol, valueCol, weightCol, Seq(q))
      .withColumnRenamed(s"wq_$q", "wq")

  /** ClickHouse `quantilesExactWeighted(q1, q2, …)`: every quantile picked
    * from the SAME cumulative-weight pass — one per-group sort total,
    * regardless of how many quantiles are requested (each is a conditional
    * min over the shared frame). Output columns `wq_<q>`. */
  def weightedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                        weightCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "need non-empty qs, each in (0, 1]")
    val clean = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
              col(weightCol) > 0)
      .select(col(keyCol), col(valueCol), col(weightCol).cast("long").as("wt"))
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picks = qs.map { q =>
      min(when(col("cumw") >= ceil(lit(q) * col("tw") - lit(1e-9)).cast("long"),
               col(valueCol))).as(s"wq_$q")
    }
    clean
      .withColumn("cumw", sum(col("wt")).over(wc))
      .withColumn("tw", sum(col("wt")).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(max(col("tw")).as("total_weight"), picks: _*)
  }
}
