package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables under a scale-factor dir
  * (see TESTDATA.md). Schemas are fixed by the generator; we read them as-is
  * and rely on Catalyst column pruning + filter pushdown, so a query that
  * touches 2 columns scans 2 columns.
  *
  * Reference mapping (SURVEY.md §1): the `events` table plays the role of the
  * reference's `user_events_*` MergeTree tables
  * (/root/reference/src/1-naive.test.ts:13-19) — `event_type='click'` ≈
  * `event_name='BUTTON_CLICK'`, `event_id` ≈ `message_id`, `ts` ≈ `timestamp`.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types._

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else normalizeWidths(spark.read.parquet(s"$sfDir/$name.parquet"), name)

  /** Defensive integral/float-width normalization for the generator-owned
    * tables, same risk class as the events `ts` unit flip that broke r06:
    * a regenerated file shipping `doc_id` as int32 (or `label` as int64,
    * or `embedding` as array<double>) would otherwise fail every consumer
    * that encodes/joins on the today-observed type. Identity casts are
    * erased by SimplifyCasts, so the normalization is free while the
    * schema matches — and when it doesn't, correctness survives at the
    * cost of pushdown on the (expression-filtered anyway) key columns. */
  private val canonicalWidths: Map[String, Map[String, DataType]] = Map(
    "documents"  -> Map("doc_id" -> LongType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType,
                        "embedding" -> ArrayType(FloatType)),
    "events"     -> Map("event_id" -> LongType, "user_id" -> LongType,
                        "value" -> DoubleType),
    // TPC-H join keys + measures: a width flip on either join side would
    // break joins/encoders; measures pin the decimal-sum oracle contracts
    "lineitem"   -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                        // a DATE-typed regen casts to midnight instants —
                        // exactly how DuckDB promotes dates in timestamp
                        // comparisons, so both engines shift identically
                        "l_shipdate" -> TimestampType),
    "orders"     -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                        "o_totalprice" -> DoubleType,
                        "o_orderdate" -> TimestampType),
    "customer"   -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
                        "c_acctbal" -> DoubleType),
    "supplier"   -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
                        "s_acctbal" -> DoubleType),
    "part"       -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
                        "p_retailprice" -> DoubleType),
    "nation"     -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
    "region"     -> Map("r_regionkey" -> IntegerType))

  private def normalizeWidths(df: DataFrame, name: String): DataFrame =
    canonicalWidths.get(name).fold(df) { want =>
      want.foldLeft(df) { case (d, (c, t)) =>
        if (d.columns.contains(c) && d.schema(c).dataType != t)
          d.withColumn(c, col(c).cast(t))
        else d
      }
    }

  private val eventsSchemas =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** Parquet-footer schema of `events.parquet` under the nanos-as-long
    * conf, probed once per directory (footer-only, no data scan). `ts` comes
    * back `LongType` ⇔ the file stores TIMESTAMP(NANOS) (which Spark's
    * vectorized reader otherwise rejects); `TimestampNTZType`/
    * `TimestampType` ⇔ TIMESTAMP(MICROS). The generator has shipped BOTH
    * units across rounds, so every events read path — batch and stream —
    * derives from this probe instead of assuming any column's stored type.
    *
    * The conf is deliberately session-global (not set/restored): the frames
    * built from it are LAZY, so the flag must still be true whenever the
    * scan executes. It only changes how TIMESTAMP(NANOS) parquet is read —
    * no other query's semantics depend on it.
    */
  private def eventsFileSchema(spark: SparkSession, sfDir: String): StructType = {
    // conf set BEFORE the cache lookup: the schema cache is keyed by dir, but
    // the conf is per-SparkSession — a second session in the same JVM hitting
    // a cached dir must still be configured, or a TIMESTAMP(NANOS) file would
    // fail at ITS scan time even though the probe succeeded elsewhere
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSchemas.getOrElseUpdate(sfDir,
      spark.read.parquet(s"$sfDir/events.parquet").schema)
  }

  /** Stored type of `events.ts` (see [[eventsFileSchema]]). */
  def eventsTsType(spark: SparkSession, sfDir: String): DataType =
    eventsFileSchema(spark, sfDir)("ts").dataType

  /** Normalize a raw events frame's `ts` (typed as [[eventsTsType]] reports)
    * to session-zone `TimestampType` at micros precision, whatever unit the
    * file stored:
    *   - nanos-as-long: truncate with INTEGER division — `ts / 1000` in
    *     double would lose precision above 2^53 ns (~1970+104 days); `DIV`
    *     keeps it exact. Oracle comparisons are at ≥second granularity or
    *     tie-broken by `event_id`, so the µs truncation is observation-free.
    *   - micros NTZ: cast to TimestampType — wall-clock preserving under the
    *     UTC session zone, i.e. the exact epoch DuckDB computes.
    *   - micros instant: already the target type.
    */
  def normalizeEventsTs(df: DataFrame, raw: DataType): DataFrame = raw match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other =>
      throw new IllegalStateException(s"unsupported events.ts parquet type: $other")
  }

  /** Schema for a file-STREAM read of `events.parquet` — the batch-probed
    * footer schema verbatim, so EVERY column (not just `ts`) is typed as the
    * file actually stores it and a regenerated file can never be silently
    * misread through a stale hardcoded stream schema. Pair with
    * [[normalizeEventsTs]]. */
  def eventsRawSchema(spark: SparkSession, sfDir: String): StructType =
    eventsFileSchema(spark, sfDir)

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsTsType(spark, sfDir) // also sets nanosAsLong for the lazy scan
    normalizeWidths(
      normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"), raw), "events")
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
