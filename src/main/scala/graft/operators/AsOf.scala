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
    *                given); all other right columns are dropped.
    * @param toleranceSeconds when set, a match farther in the past than the
    *                tolerance is nulled out (pandas `merge_asof` backward
    *                tolerance) and a `matched` boolean is APPENDED after the
    *                payload columns; when None the output shape is exactly
    *                `leftCols ++ payload` (unchanged legacy contract). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val leftOther = leftCols.filterNot(c => keys.contains(c) || c == leftTime)
    // ASOF semantics: a right row with a NULL timestamp or NULL key can never
    // match (`l.t >= NULL` is never true; equality never matches NULL keys) —
    // drop them up front so window null-grouping can't resurrect them
    val rightClean = right.filter(
      (col(rightTime).isNotNull +: keys.map(col(_).isNotNull)).reduce(_ && _))
    // The payload travels as ONE struct per right row: left-row placeholders
    // are a null STRUCT, while a right row whose payload fields are null is a
    // non-null struct of nulls — so `last(…, ignoreNulls)` skips placeholders
    // but honours genuine nulls, and all carried fields come from the SAME
    // right row (no cross-row mixing). The matched right timestamp rides
    // inside the struct so the tolerance test compares columns of the SAME
    // matched row.
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select((payload.map(col) :+ col(rightTime).as("__rt")): _*).schema.fields)
    val r = rightClean.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag") :+
        struct((payload.map(col) :+ col(rightTime).as("__rt")): _*).as("__p")) ++
        leftOther.map(c => lit(null).as(c)): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag") :+
        lit(null).cast(payloadType).as("__p")) ++
        leftOther.map(col): _*)
    // tertiary xxhash64(__p) tiebreak: equal (key, rightTime) right rows
    // would otherwise make last(__p) partition-order nondeterministic; the
    // hash orders ties by payload content (left placeholders hash to the
    // null-input constant — a single tie class, harmless)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"), xxhash64(col("__p")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val isTs = left.schema(leftTime).dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    def units(c: Column) = if (isTs) unix_micros(c) else c.cast("long")
    val base = filled.filter(col("__tag") === 1)
    toleranceSeconds match {
      case None =>
        base.withColumnRenamed("__t", leftTime)
          .select(leftCols.toIndexedSeq.map(col) ++
                  payload.map(p => col("__p").getField(p).as(p)): _*)
      case Some(tol) =>
        // µs-exact tolerance, mirroring joinAsOfForward; NULL-leftTime rows
        // (nulls-first here means an all-null PRECEDING frame — no match
        // anyway) still land matched=false via the coalesce
        val bound = if (isTs) tol * 1000000L else tol
        val ok = coalesce(
          col("__t").isNotNull && col("__p").isNotNull &&
            (units(col("__t")) - units(col("__p").getField("__rt"))) <= bound,
          lit(false))
        base.withColumn("__ok", ok)
          .withColumnRenamed("__t", leftTime)
          .select(leftCols.toIndexedSeq.map(col) ++
                  payload.map(p => when(col("__ok"), col("__p").getField(p)).as(p)) :+
                  col("__ok").as("matched"): _*)
    }
  }

  /** FORWARD as-of join with an optional tolerance — the `<=` direction of
    * the ClickHouse/kdb ASOF family: for every left row, attach the payload
    * of the EARLIEST right row with the same key and `rightTime >=
    * leftTime`; when `toleranceSeconds` is set, a match farther than the
    * tolerance is nulled out (the row survives, pandas `merge_asof
    * tolerance` semantics). Same merge formulation and cost as
    * [[joinAsOf]] — one shuffle on the key, a `first(…, ignoreNulls)` over
    * the FOLLOWING frame — with the matched right timestamp carried inside
    * the payload struct so the tolerance test compares columns of the SAME
    * matched row. Appends a `matched` boolean after the payload columns. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      payload: Seq[String],
                      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val leftOther = leftCols.filterNot(c => keys.contains(c) || c == leftTime)
    val rightClean = right.filter(
      (col(rightTime).isNotNull +: keys.map(col(_).isNotNull)).reduce(_ && _))
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select((payload.map(col) :+ col(rightTime).as("__rt")): _*).schema.fields)
    // tags: left 0, right 1 — at equal timestamps the left row's FOLLOWING
    // frame (currentRow →) contains the equal-time right row, giving the
    // inclusive `rightTime >= leftTime` semantics
    val r = rightClean.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(1).as("__tag") :+
        struct((payload.map(col) :+ col(rightTime).as("__rt")): _*).as("__p")) ++
        leftOther.map(c => lit(null).as(c)): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(0).as("__tag") :+
        lit(null).cast(payloadType).as("__p")) ++
        leftOther.map(col): _*)
    // same deterministic tiebreak as joinAsOf: among equal (key, rightTime)
    // right rows, first(__p) picks the smallest payload hash, not whichever
    // partition order served up
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"), xxhash64(col("__p")))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = r.unionByName(l)
      .withColumn("__p", first(col("__p"), ignoreNulls = true).over(w))
    // tolerance at MICROSECOND resolution for timestamps — a seconds cast
    // floors sub-second parts and disagrees with any engine comparing exact
    // epochs at the boundary; integral time columns compare raw
    val isTs = left.schema(leftTime).dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    def units(c: Column) = if (isTs) unix_micros(c) else c.cast("long")
    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        val bound = if (isTs) tol * 1000000L else tol
        col("__p").isNotNull &&
          (units(col("__p").getField("__rt")) - units(col("__t"))) <= bound
      case None => col("__p").isNotNull
    }
    // a left row with NULL leftTime sorts NULLS FIRST in the ascending
    // window, so its FOLLOWING frame spans the whole partition and it would
    // "match" the earliest right row — ASOF semantics (and every SQL engine's
    // NULL comparison) say it matches nothing. Null the match instead of
    // dropping the row; coalesce pins `matched` to a real boolean.
    filled.filter(col("__tag") === 0)
      .withColumn("__ok", coalesce(col("__t").isNotNull && withinTol, lit(false)))
      .withColumnRenamed("__t", leftTime)
      .select(leftCols.toIndexedSeq.map(col) ++
              payload.map(p => when(col("__ok"), col("__p").getField(p)).as(p)) :+
              col("__ok").as("matched"): _*)
  }
}
