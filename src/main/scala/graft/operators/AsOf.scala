package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of the
  * newest right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native as-of join; the naive formulations explode:
  * a range-condition join degenerates to a per-key cross product, and a
  * correlated max-subquery doubles the join work. This operator uses the
  * merge formulation instead: UNION the two sides (right rows sorted before
  * left rows at equal timestamps), then one windowed
  * `last(payload, ignoreNulls)` pass propagates the most recent right payload
  * onto each left row. Cost: ONE shuffle on the key + per-partition sort —
  * the same plan shape as any windowed analytic, linear in |L| + |R|, no
  * blow-up under key skew beyond the usual window-sort.
  *
  * Matches DuckDB/kdb `ASOF JOIN` semantics (`>=` inequality, latest-wins,
  * left rows with no prior right row get nulls).
  */
object AsOf {

  /** @param payload right-side columns to carry onto left rows (renamed as
    *                given); all other right columns are dropped. */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val leftOther = leftCols.filterNot(c => keys.contains(c) || c == leftTime)
    // common time axis + side tag: right (tag 0) sorts before left (tag 1) at
    // equal timestamps, so an exactly-simultaneous right row IS visible
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag")) ++
        payload.map(col) ++
        leftOther.map(c => lit(null).as(c)): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag")) ++
        payload.map(c => lit(null).as(c)) ++
        leftOther.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(r.unionByName(l)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .withColumnRenamed("__t", leftTime)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
