package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase salted groupBy.
  *
  * A hot key (one user producing 1% of a 100 TB event log) turns a plain
  * `groupBy(key)` into one straggler task. Salting splits every key into
  * `salt` sub-keys for the first (partial) aggregate, so the hot key's rows
  * spread across `salt` tasks; the second aggregate merges the ≤`salt`
  * partial rows per key. Works for any algebraic aggregate (sum/count/min/
  * max/HLL-union); the caller supplies the partial and merge forms.
  *
  * AQE's skew-join handling covers JOINS; aggregation skew still needs this
  * pattern (partial aggregation helps, but a hash-exploding key — e.g.
  * collect_set state — does not map-side-combine away).
  */
object Skew {

  /** `groupBy(keys).agg(partials)` with a salt phase.
    * `partials`: (aliasName → partial agg column); `merges`: final merge per
    * alias (applied over the salted partial rows). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
                      partials: Seq[(String, Column)],
                      merges: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
           partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._2.as(merges.head._1),
           merges.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted exact count per key — the most common case. */
  def saltedCount(df: DataFrame, keys: Seq[String], salt: Int = 16,
                  as: String = "n"): DataFrame =
    saltedAggregate(df, keys, salt,
      partials = Seq(as -> count(lit(1))),
      merges = Seq(as -> sum(col(as)).cast("long")))
}
