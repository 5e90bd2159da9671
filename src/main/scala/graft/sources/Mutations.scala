package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** ClickHouse-mutation analogue (`ALTER TABLE … DELETE/UPDATE WHERE`, the
  * right-to-be-forgotten / data-correction primitive — see
  * /root/reference/README.md's MergeTree family, whose tables are mutable
  * only through asynchronous rewrite mutations): Spark has no in-place
  * delete on parquet either, so a mutation is a COPY-ON-WRITE rewrite —
  * and the whole game at 100 TB is rewriting as little as possible.
  *
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
  * skipping (S1/S6) survives the mutation. Rows whose partition value is
  * NULL live in Spark's default partition directory and are handled like
  * any other partition (tracked under a sentinel, erased/updated the same).
  */
object Mutations {

  /** Partitions rewritten + rows matched (rowsDeleted == 0 ⇒ no write ran —
    * mutations are idempotent and re-running one is a metadata-only scan). */
  final case class DeleteStats(partitionsRewritten: Long, rowsDeleted: Long)

  private case class Touched(parts: Seq[Any], hasNullPart: Boolean, n: Long) {
    def count: Long = parts.size.toLong + (if (hasNullPart) 1L else 0L)
  }

  /** Pass 1: which partitions hold predicate matches (NULL partition values
    * tracked separately — `collect_set` drops them), and how many rows. */
  private def touchedPartitions(table: DataFrame, predicate: Column,
                                partitionCol: String): Touched = {
    val row = table.filter(predicate)
      .agg(collect_set(col(partitionCol)).as("parts"),
           sum(col(partitionCol).isNull.cast("long")).as("n_null"),
           count(lit(1)).as("n"))
      .head()
    Touched(row.getSeq[Any](0), !row.isNullAt(1) && row.getLong(1) > 0L, row.getLong(2))
  }

  /** Rows belonging to any touched partition. */
  private def inTouched(t: Touched, partitionCol: String): Column = {
    val inParts =
      if (t.parts.isEmpty) lit(false) else col(partitionCol).isin(t.parts: _*)
    if (t.hasNullPart) inParts || col(partitionCol).isNull else inParts
  }

  private def withDynamicOverwrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** The on-disk directory name of a partition value, with Spark's own
    * escaping (spaces, ':', '%', … are percent-encoded in paths; NULL maps
    * to the default-partition sentinel). */
  private def partitionDirName(partitionCol: String, value: Any): String = {
    val v = if (value == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
            else ExternalCatalogUtils.escapePathName(value.toString)
    s"${ExternalCatalogUtils.escapePathName(partitionCol)}=$v"
  }

  /** `ALTER TABLE … DELETE WHERE pred` analogue. Partitions whose every row
    * matched produce no output rows, so dynamic overwrite cannot replace
    * them — their directories are dropped the way the TTL drops expired
    * partitions (a metadata delete, no write). */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
                  partitionCol: String, sortCols: Seq[String]): DeleteStats = {
    val table = spark.read.parquet(path)
    val t = touchedPartitions(table, predicate, partitionCol)
    if (t.n == 0L) return DeleteStats(0L, 0L)
    // pass 2: rewrite ONLY the touched partitions, keeping layout. The kept
    // rows are eagerly materialized (localCheckpoint) BEFORE the overwrite —
    // the frame reads the very files the write replaces, and Spark (rightly)
    // refuses a lazy self-overwrite. This staging cost is bounded by the
    // touched partitions, never the table.
    val kept = table.filter(inTouched(t, partitionCol)).filter(!predicate)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint()
    overwriteTouched(spark, path, kept, t, partitionCol)
    DeleteStats(t.count, t.n)
  }

  /** Shared write tail for the copy-on-write mutations: dynamic-overwrite
    * the touched partitions with `kept` (already materialized), then drop
    * the touched directories that produced no surviving rows (dynamic
    * overwrite only replaces partitions PRESENT in the written data). */
  private def overwriteTouched(spark: SparkSession, path: String,
                               kept: DataFrame, t: Touched,
                               partitionCol: String): Unit = {
    val survivingDirs = kept.select(col(partitionCol)).distinct()
      .collect().map(r => partitionDirName(partitionCol, r.get(0))).toSet
    withDynamicOverwrite(spark) {
      kept.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touchedDirs = t.parts.map(p => partitionDirName(partitionCol, p)) ++
      (if (t.hasNullPart) Seq(partitionDirName(partitionCol, null)) else Nil)
    (touchedDirs.toSet -- survivingDirs).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
    }
  }

  /** ReplacingMergeTree's PHYSICAL collapse — the `OPTIMIZE TABLE … FINAL`
    * analogue (the reference declares `Engine = ReplacingMergeTree()` at
    * /root/reference/src/1-naive.test.ts:27 and relies on background merges
    * collapsing the assignment log; `LatestWins` models the READ path, this
    * models the merge): rewrite the table so each key keeps only its
    * newest row by `ordCol`, bounding log growth.
    *
    * Same minimal-touch discipline as [[deleteWhere]]: only partitions that
    * hold a SUPERSEDED row are rewritten; a partition whose every row is
    * already its key's winner keeps its files byte-for-byte. Partitions
    * left empty (all rows superseded) are dropped like TTL'd ones.
    *
    * Winner pinning: rows are ranked per key by (`ordCol`, full-row
    * xxhash64, partition value) descending-ord — ties on `ordCol` between
    * DIFFERENT rows order by the content hash (deterministic, engine-local),
    * and byte-identical duplicate rows (same ord, same hash) collapse to the
    * copy in the lowest partition. One shuffle on the key; idempotent — a
    * second run finds zero superseded rows and is a metadata-only scan. */
  def collapseLatest(spark: SparkSession, path: String, keyCols: Seq[String],
                     ordCol: String, partitionCol: String,
                     sortCols: Seq[String]): DeleteStats = {
    import org.apache.spark.sql.expressions.Window
    val table = spark.read.parquet(path)
    // hash excludes the partition column: duplicate copies of one logical
    // row in two partitions tie on (ord, hash) and fall to the partition
    // pin; rows with different payloads order by the hash
    val rowHash = xxhash64(struct(
      table.columns.toIndexedSeq.filter(_ != partitionCol).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).desc, rowHash.desc, col(partitionCol).asc)
    val ranked = table.withColumn("__rn", row_number().over(w))
    val t = touchedPartitions(ranked, col("__rn") > 1, partitionCol)
    if (t.n == 0L) return DeleteStats(0L, 0L)
    val kept = ranked.filter(inTouched(t, partitionCol))
      .filter(col("__rn") === 1).drop("__rn")
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint() // see deleteWhere: never lazily self-overwrite
    overwriteTouched(spark, path, kept, t, partitionCol)
    DeleteStats(t.count, t.n)
  }

  /** CDC keyed merge-apply: land one compacted change batch — rows tagged
    * `'I'` (insert), `'U'` (update/upsert), `'D'` (delete) in `opCol`, one
    * row per key — on a partitioned table in a single pass, touching only
    * affected partitions. The batch is the SMALL side (probe-shape
    * discipline): its distinct keys broadcast into the table scan to find
    * affected partitions and filter survivors; the table is never shuffled.
    * Affected partitions = those holding an existing row of a changed key
    * (rewritten without it) ∪ those targeted by an I/U row (rewritten with
    * it); everything else stays byte-identical. Content-idempotent:
    * re-applying the same batch reproduces the same table. I and U are
    * deliberately the same operation (upsert) — a CDC 'I' whose key already
    * exists replaces it, so replayed batches cannot duplicate keys. */
  def mergeApply(spark: SparkSession, path: String, changes: DataFrame,
                 keyCols: Seq[String], opCol: String,
                 partitionCol: String, sortCols: Seq[String]): DeleteStats = {
    val table = spark.read.parquet(path)
    val dataCols = table.columns.toIndexedSeq
    require(changes.columns.contains(opCol), s"changes must carry '$opCol'")
    require((dataCols.toSet -- changes.columns).isEmpty,
      s"changes must carry every table column; missing: ${dataCols.toSet -- changes.columns}")
    // one op per key per batch (a compacted CDC batch): ambiguity is a bug
    val batch = changes.localCheckpoint() // small side; read 4×, compute once
    require(batch.groupBy(keyCols.map(col): _*).count()
              .filter(col("count") > 1).isEmpty,
      "changes must have one row per key — compact the batch first")
    val keys = broadcast(batch.select(keyCols.map(col): _*).distinct())
    // affected partitions: existing homes of changed keys + targets of I/U
    val fromTable = table.join(keys, keyCols, "left_semi")
      .select(col(partitionCol))
    val fromChanges = batch.filter(col(opCol) =!= "D").select(col(partitionCol))
    val t = touchedPartitions(fromTable.union(fromChanges).toDF(partitionCol),
                              lit(true), partitionCol)
    val nApplied = batch.count()
    if (t.count == 0L) return DeleteStats(0L, 0L)
    val kept = table.filter(inTouched(t, partitionCol))
      .join(keys, keyCols, "left_anti") // survivors: unchanged keys only
      .unionByName(batch.filter(col(opCol).isin("I", "U"))
                     .select(dataCols.map(col): _*))
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint() // see deleteWhere: never lazily self-overwrite
    overwriteTouched(spark, path, kept, t, partitionCol)
    DeleteStats(t.count, nApplied)
  }

  /** `ALTER TABLE … UPDATE col = expr WHERE pred` analogue — the same
    * minimal-touch copy-on-write. ALL assignments are applied in ONE
    * projection, so every `when(pred, expr)` — and every assignment
    * expression — sees the PRE-update row even when assignments read or
    * write the predicate's own columns. Returns (partitionsRewritten,
    * rowsUpdated). The partition column itself must not be assigned (a
    * partition-moving update is a delete + insert). */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  set: Map[String, Column], partitionCol: String,
                  sortCols: Seq[String]): DeleteStats = {
    require(!set.contains(partitionCol),
      "updating the partition column moves rows across partitions — express it as delete + insert")
    val table = spark.read.parquet(path)
    require(set.keySet.subsetOf(table.columns.toSet),
      s"unknown columns in SET: ${set.keySet -- table.columns}")
    val t = touchedPartitions(table, predicate, partitionCol)
    if (t.n == 0L) return DeleteStats(0L, 0L)
    val projected = table.columns.map { c =>
      set.get(c).map(e => when(predicate, e).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }
    val rewritten = table.filter(inTouched(t, partitionCol))
      .select(projected.toIndexedSeq: _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint() // see deleteWhere: never lazily self-overwrite
    withDynamicOverwrite(spark) {
      rewritten.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    }
    DeleteStats(t.count, t.n)
  }
}
