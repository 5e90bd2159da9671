package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse-mutation analogue (`ALTER TABLE … DELETE WHERE`, the
  * right-to-be-forgotten / data-correction primitive — see
  * /root/reference/README.md's MergeTree family, whose tables are mutable
  * only through asynchronous rewrite mutations): Spark has no in-place
  * delete on parquet either, so a mutation is a COPY-ON-WRITE rewrite —
  * and the whole game at 100 TB is rewriting as little as possible.
  *
  * [[deleteWhere]] on a partitioned table:
  *  1. one pruned scan finds the DISTINCT partitions that contain matching
  *     rows (for a partition-column predicate, Catalyst prunes the scan to
  *     those directories without touching the rest);
  *  2. only those partitions are rewritten, via dynamic partition overwrite
  *     (`partitionOverwriteMode=dynamic` scoped to the write) — untouched
  *     partitions keep their files byte-for-byte, so a user-erasure request
  *     over years of daily partitions rewrites only the days the user
  *     actually appears in.
  *
  * The sorted-layout invariant is preserved: rewritten rows pass through
  * `sortWithinPartitions` on the caller's sort key, so row-group min/max
  * skipping (S1/S6) survives the mutation.
  */
object Mutations {

  /** Partitions rewritten + rows deleted (rowsDeleted == 0 ⇒ no write ran —
    * deletes are idempotent and re-running one is a metadata-only scan). */
  final case class DeleteStats(partitionsRewritten: Long, rowsDeleted: Long)

  /** `ALTER TABLE … UPDATE col = expr WHERE pred` analogue — the same
    * minimal-touch copy-on-write: partitions without a matching row keep
    * their files untouched; touched ones rewrite with
    * `when(pred, expr).otherwise(col)` applied per assignment. Returns
    * (partitionsRewritten, rowsUpdated). The partition column itself must
    * not be assigned (a partition-moving update is a delete + insert). */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  set: Map[String, Column], partitionCol: String,
                  sortCols: Seq[String]): DeleteStats = {
    require(!set.contains(partitionCol),
      "updating the partition column moves rows across partitions — express it as delete + insert")
    val table = spark.read.parquet(path)
    val touchedRow = table.filter(predicate)
      .agg(collect_set(col(partitionCol)).as("parts"), count(lit(1)).as("n"))
      .head()
    val parts = touchedRow.getSeq[Any](0)
    val n = touchedRow.getLong(1)
    if (n == 0L) return DeleteStats(0L, 0L)
    val touched = table.filter(col(partitionCol).isin(parts: _*))
    val updated = set.foldLeft(touched) { case (df, (c, e)) =>
      df.withColumn(c, when(predicate, e).otherwise(col(c)))
    }
    val rewritten = updated.sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint() // see deleteWhere: never lazily self-overwrite
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    DeleteStats(parts.size.toLong, n)
  }

  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
                  partitionCol: String, sortCols: Seq[String]): DeleteStats = {
    val table = spark.read.parquet(path)
    // pass 1: which partitions hold matches, and how many rows go
    val touchedRow = table.filter(predicate)
      .agg(collect_set(col(partitionCol)).as("parts"), count(lit(1)).as("n"))
      .head()
    val parts = touchedRow.getSeq[Any](0)
    val n = touchedRow.getLong(1)
    if (n == 0L) return DeleteStats(0L, 0L)
    // pass 2: rewrite ONLY the touched partitions, keeping layout. The
    // kept rows are eagerly materialized (localCheckpoint) BEFORE the
    // overwrite — the frame reads the very files the write replaces, and
    // Spark (rightly) refuses a lazy self-overwrite. This is the staging
    // cost of any copy-on-write mutation; it is bounded by the touched
    // partitions, never the table.
    val touched = table.filter(col(partitionCol).isin(parts: _*))
    val kept = touched.filter(!predicate)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint()
    val surviving = kept.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // dynamic overwrite replaces exactly the partitions present in `kept`.
      // A partition whose EVERY row matched produces no output rows, so it
      // is not in `kept` at all — its directory is dropped the way the TTL
      // drops expired partitions (a metadata delete, no write).
      kept.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (parts.toSet -- surviving).foreach { p =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"$partitionCol=$p"), true)
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    DeleteStats(parts.size.toLong, n)
  }
}
