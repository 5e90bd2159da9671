package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no `partitionBy`, which funnels every row
  * through ONE task (the classic global-window anti-pattern; at 100 TB that
  * task never finishes).
  *
  * [[globalRowNumber]] is the two-pass pattern `RDD.zipWithIndex` uses,
  * re-expressed over DataFrames: range-repartition on the sort key so
  * partitions hold disjoint key ranges, rank WITHIN each partition in
  * parallel, then shift each partition's ranks by the total count of all
  * partitions before it. The per-partition counts are metadata-sized
  * (one long per partition) — collecting them to the driver is the same
  * footprint as AQE's shuffle statistics, not a data collect.
  */
object Ranks {

  /** Above this partition count the per-partition offsets ride as a
    * BROADCAST-JOINED frame instead of a plan-embedded literal map (see
    * [[globalRowNumber]]). 10k literal entries ≈ ~200 KB of plan — fine;
    * 100k would inflate every task's serialized plan by megabytes. */
  private[graft] val MaxLiteralOffsetEntries = 10000

  /** Global 1-based row number under `order` (which must be a total order —
    * include a unique tie-break column). Returns the ranked frame and the
    * total row count. Two passes over the input (count pass + rank pass),
    * zero single-task stages.
    *
    * `maxLiteralOffsets` picks the offset-application lane and exists as a
    * parameter so specs can force the join lane at a tiny partition count;
    * production callers keep the default. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      out: String = "rank",
                      maxLiteralOffsets: Int = MaxLiteralOffsetEntries): (DataFrame, Long) = {
    // The count pass and the rank pass are SEPARATE queries, and Spark SQL
    // does not reuse shuffle output across queries — each would re-execute
    // the range exchange, whose boundary SAMPLING is seeded by the per-job
    // RDD id. Slightly different boundaries between the two passes shift
    // rows across partitions and corrupt the offsets (observed: overlapping
    // rank ranges). Materializing the ranged frame once freezes the
    // partitioning for both passes — the DataFrame analog of the shuffle
    // reuse RDD.zipWithIndex gets for free within one lineage.
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nPart, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0 -> 0L) { case ((_, acc), (pid, c)) => pid -> (acc + c) }
    val offsetByPid = counts.map(_._1).zip(offsets.map(_._2)).toMap
    val n = counts.map(_._2).sum
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    // The per-partition offsets scale with the PARTITION count, not the
    // data. Up to `maxLiteralOffsets` they embed in the plan as a typedLit
    // map — zero extra operators, codegen-friendly (32 partitions ≈ a few
    // hundred plan bytes). Past it (a 100k-partition cluster job, where a
    // literal map would inflate every task's serialized plan by megabytes)
    // they ride as a BROADCAST hash join on __pid instead: same offsets,
    // one broadcast of nPart (pid, offset) longs — spec-pinned equal to the
    // literal lane.
    val shifted = if (nPart <= maxLiteralOffsets) {
      val offsetMap = typedLit(offsetByPid)
      local.withColumn(out,
        col("__lrn") + coalesce(element_at(offsetMap, col("__pid")), lit(0L)))
    } else {
      val sess = df.sparkSession
      val offFrame = sess.createDataFrame(offsetByPid.toSeq).toDF("__pid", "__off")
      local.join(broadcast(offFrame), Seq("__pid"), "left")
        .withColumn(out, col("__lrn") + coalesce(col("__off"), lit(0L)))
        .drop("__off")
    }
    (shifted.drop("__pid", "__lrn"), n)
  }

  /** Exact `ntile(k)` over a total order, built on [[globalRowNumber]] —
    * same semantics as the SQL window function (first `n % k` buckets get
    * one extra row), no single-partition window. Integer arithmetic is done
    * with DIV so buckets are exact at any n. */
  def ntileExact(df: DataFrame, order: Seq[Column], k: Int,
                 out: String = "ntile"): DataFrame = {
    require(k > 0, "k must be positive")
    val (ranked, n) = globalRowNumber(df, order, "__rank")
    val q = n / k
    val rem = n % k
    val bucket =
      if (q == 0) col("__rank") // fewer rows than buckets: row r → bucket r
      else when(col("__rank") <= rem * (q + 1),
                expr(s"(__rank - 1) DIV ${q + 1} + 1"))
             .otherwise(expr(s"$rem + (__rank - 1 - ${rem * (q + 1)}) DIV $q + 1"))
    ranked.withColumn(out, bucket.cast("int")).drop("__rank")
  }
}
