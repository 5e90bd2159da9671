package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-value-wins reconciliation — the Spark rendition of the reference's
  * ReplacingMergeTree + `argMax(value, assigned_at)` read pattern
  * (/root/reference/src/1-naive.test.ts:21-28,82-89).
  *
  * The reference never overwrites: assignments append, and *every* read
  * reconciles to the newest row per key. We model the same thing over an
  * append-only parquet log, with two physically different plans:
  *
  *   - [[maxBy]]: one hash aggregate (`max_by` per payload column). One
  *     shuffle on the key, partial aggregation map-side — the plan of choice
  *     at scale (100 TB: shuffle carries one row per key per partition after
  *     partial agg, not the whole log).
  *   - [[latestRows]]: window `row_number() == 1` — keeps the *entire* newest
  *     row without enumerating columns; same single shuffle but sorts each
  *     partition. Use when the payload is wide or when the whole row is
  *     needed.
  *
  * ClickHouse `argMax` breaks ties arbitrarily (SURVEY.md §7.4); we pin a
  * deterministic tie-break by ordering on (ord, tieBreak...).
  */
object LatestWins {

  /** Aggregate form: `groupBy(key).agg(max_by(col, ord) …)`.
    * Exact semantic match of ClickHouse `argMax(col, ord)` with a pinned
    * tie-break: the ordering value is `struct(ord, tieBreak*)`.
    */
  def maxBy(df: DataFrame, key: Seq[String], ord: Column, payload: Seq[String],
            tieBreak: Seq[Column] = Nil): DataFrame = {
    val ordering = if (tieBreak.isEmpty) ord else struct((ord +: tieBreak): _*)
    df.groupBy(key.map(col): _*)
      .agg(max_by(col(payload.head), ordering).as(payload.head),
           payload.tail.map(c => max_by(col(c), ordering).as(c)): _*)
  }

  /** Window form: newest full row per key, `row_number() === 1` over
    * (ord desc, tieBreak desc).
    */
  def latestRows(df: DataFrame, key: Seq[String], ord: Column,
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((ord.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
