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
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy conf) and truncate to micros with
    * INTEGER division — `ts / 1000` in double would lose precision above
    * 2^53 ns (~1970+104 days); `DIV` keeps it exact. DuckDB keeps full ns
    * precision; every oracle comparison is at ≥second granularity or
    * tie-broken by `event_id`, so the µs truncation is observation-free.
    *
    * The conf is deliberately session-global (not set/restored): the
    * returned frame is LAZY, so the flag must still be true whenever the
    * scan executes. It only changes how TIMESTAMP(NANOS) parquet is read —
    * no other query's semantics depend on it.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
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
