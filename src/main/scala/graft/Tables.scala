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
    else normalizeWidths(spark.read.parquet(s"$sfDir/$name.parquet"), name, sfDir)

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
                        "value" -> DoubleType,
                        // a regen that MATERIALIZES the JSON payload as a
                        // parquet struct (generators often do) must read
                        // back at the engine's canonical string width;
                        // complex→string goes through to_json below
                        "props" -> StringType),
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

  /** Epoch-unit inference for a LONG-typed instant column: a value's
    * magnitude identifies its unit with three decades of slack per band
    * (any instant between 1971 and ~2940 lands in exactly one band —
    * seconds ~1e9, millis ~1e12, micros ~1e15, nanos ~1e18). Needed because
    * a plain INT64 epoch column is schema-indistinguishable from
    * TIMESTAMP(NANOS) read under `nanosAsLong`: the footer probe alone
    * cannot pick the divisor, and assuming nanos over a micros-long file
    * silently compresses time 1000× (the r06 trap class). Returns one of
    * "ns" | "us" | "ms" | "s"; an all-null/empty column defaults to "us"
    * (no row exists for the choice to misread). */
  private[graft] def inferLongEpochUnit(maxValue: Option[Long]): String =
    maxValue match {
      case Some(v) if v >= 30000000000000000L => "ns" // ≥ ~1970+11mo in ns
      case Some(v) if v >= 30000000000000L    => "us"
      case Some(v) if v >= 30000000000L       => "ms"
      case Some(_)                            => "s"
      case None                               => "us"
    }

  /** `timestamp_micros` conversion for a long epoch column in `unit`.
    * Nanos truncate with integer DIV (exact above 2^53); coarser units
    * multiply exactly. */
  private[graft] def longEpochToTs(c: String, unit: String) = unit match {
    case "ns" => expr(s"timestamp_micros($c DIV 1000)")
    case "us" => expr(s"timestamp_micros($c)")
    case "ms" => expr(s"timestamp_micros($c * 1000)")
    case "s"  => expr(s"timestamp_micros($c * 1000000)")
    case other => throw new IllegalStateException(s"unknown epoch unit: $other")
  }

  /** Cheap file-identity fingerprint of a table path, folded into every
    * probe-cache key below: a path REWRITTEN within one JVM's lifetime (e.g.
    * iterating regen sims into the same /tmp dst, which `tools/regen_sim.py`
    * encourages) re-probes instead of silently applying a stale schema or
    * epoch unit. For a single file, (mtime, length). For a DIRECTORY table
    * (part-file and hive-partitioned layouts) the top directory's own
    * (mtime, length) is NOT enough — an in-place rewrite of partition
    * contents leaves both untouched — so the fingerprint also folds the
    * (relative path, mtime, size) of every file in the tree, order-
    * independently (directory iteration order is not contractual). Spark
    * and pyarrow name part files uniquely per write, so ANY rewrite changes
    * the fold regardless of mtime granularity. The walk is capped at 4096
    * entries (a local-testdata guard, not an object-store path — at that
    * size the cap keeps the per-lookup cost bounded while still seeing
    * every realistic regen layout, and entries past the cap still
    * contribute via the count). */
  // Optional memoization of the walk below, keyed by path: normalizeWidths
  // runs at every frame construction, so a 147-query Verify pass over a
  // DIRECTORY table would otherwise re-stat the tree hundreds of times.
  // OFF by default (TTL 0) — the rewrite-reprobe invariant pinned in
  // EventsTsUnitSpec must hold with no sleep — and turned on by the batch
  // mains (Verify/Bench), which never rewrite their inputs mid-run.
  private val fpMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  private def fpTtlMs: Long = java.lang.Long.getLong("graft.fp.ttlMs", 0L)

  private def pathFingerprint(path: String): Long = {
    val ttl = fpTtlMs
    if (ttl > 0) {
      val now = System.currentTimeMillis()
      fpMemo.get(path) match {
        case Some((fp, at)) if now - at < ttl => return fp
        case _ =>
          val fp = computeFingerprint(path)
          fpMemo.put(path, (fp, now))
          return fp
      }
    }
    computeFingerprint(path)
  }

  /** File-identity fingerprint of a table under `sfDir`, for folding into
    * probe-cache keys OUTSIDE this object (SparkEntry's corpus-constant
    * caches — collapse bounds, rebalance/domain caps, contamination bloom):
    * a same-JVM rewrite of the source parquet re-probes instead of serving
    * stale constants, the same rewrite-reprobe invariant the schema/unit
    * probes here already honor (and EventsTsUnitSpec pins). Batch mains
    * memoize the underlying tree walk via -Dgraft.fp.ttlMs. */
  private[graft] def tableFingerprint(sfDir: String, name: String): Long =
    pathFingerprint(s"$sfDir/$name.parquet")

  private def computeFingerprint(path: String): Long = {
    val root = new java.io.File(path)
    var h = root.lastModified ^ java.lang.Long.rotateLeft(root.length, 32)
    if (root.isDirectory) {
      val stream = java.nio.file.Files.walk(root.toPath)
      try {
        val it = stream.iterator()
        var n = 0L
        while (it.hasNext) {
          val p = it.next()
          n += 1
          if (n <= 4096) {
            val f = p.toFile
            // commutative SUM of well-mixed per-file terms: order-free, and
            // (unlike XOR) two identical entries don't cancel out
            var term = root.toPath.relativize(p).toString.hashCode.toLong
            term = term * 0x9E3779B97F4A7C15L + f.lastModified
            term = term * 0x9E3779B97F4A7C15L + f.length
            h += term * 0x9E3779B97F4A7C15L
          }
        }
        h += n * 0xC2B2AE3D27D4EB4FL
      } finally stream.close()
    }
    h
  }

  // Inferred epoch unit per (sfDir, table, column, file fingerprint): the
  // probe is one full-column max() ACTION, and normalizeWidths runs at every
  // frame construction — on a long-epoch date regen an uncached probe would
  // re-scan lineitem/orders once per query built, not once per run. Mirrors
  // eventsLongUnits.
  private val longDateUnits =
    scala.collection.concurrent.TrieMap.empty[((String, String, String), Long), String]

  /** getOrElseUpdate that also EVICTS entries superseded by a new
    * fingerprint of the same logical key: a long-lived sim-iterating JVM
    * rewrites the same path many times, and without eviction the
    * fingerprint-keyed caches grow one dead entry per rewrite. */
  private def cachedForFp[P, V](cache: scala.collection.concurrent.TrieMap[(P, Long), V],
                                prefix: P, fp: Long)(compute: => V): V =
    cache.get((prefix, fp)) match {
      case Some(v) => v
      case None =>
        cache.keysIterator
          .filter(k => k._1 == prefix && k._2 != fp).foreach(cache.remove)
        cache.getOrElseUpdate((prefix, fp), compute)
    }

  private def normalizeWidths(df: DataFrame, name: String, sfDir: String): DataFrame =
    canonicalWidths.get(name).fold(df) { want =>
      want.foldLeft(df) { case (d, (c, t)) =>
        if (!d.columns.contains(c) || d.schema(c).dataType == t) d
        else if (t == TimestampType && d.schema(c).dataType == LongType) {
          // a TIMESTAMP(NANOS)-or-plain-long regen of a date column: a bare
          // cast would read the long as SECONDS; infer the unit from the
          // data instead (one max() scan, paid once per (dir, table, column))
          val unit = cachedForFp(longDateUnits,
            (sfDir, name, c), pathFingerprint(s"$sfDir/$name.parquet"))(
            inferLongEpochUnit(
              Option(d.agg(org.apache.spark.sql.functions.max(col(c))).head().get(0))
                .map(_.asInstanceOf[Long])))
          d.withColumn(c, longEpochToTs(c, unit))
        } else if (t == StringType && (d.schema(c).dataType match {
          case _: StructType | _: MapType | _: ArrayType => true
          case _ => false
        })) {
          // a materialized-JSON regen (props as struct<...>): a bare CAST
          // renders Spark's struct syntax (`{87}`), not JSON — to_json is
          // the string the original file carried. DuckDB's oracle twin is
          // CAST(col AS JSON), identity on varchar JSON, struct→JSON else.
          d.withColumn(c, org.apache.spark.sql.functions.to_json(col(c)))
        } else d.withColumn(c, col(c).cast(t))
      }
    }

  // keyed by (sfDir, file fingerprint) — see pathFingerprint
  private val eventsSchemas =
    scala.collection.concurrent.TrieMap.empty[(String, Long), StructType]

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
    cachedForFp(eventsSchemas,
      sfDir, pathFingerprint(s"$sfDir/events.parquet"))(
      spark.read.parquet(s"$sfDir/events.parquet").schema)
  }

  /** Stored type of `events.ts` (see [[eventsFileSchema]]). */
  def eventsTsType(spark: SparkSession, sfDir: String): DataType =
    eventsFileSchema(spark, sfDir)("ts").dataType

  // keyed by (sfDir, file fingerprint) — see pathFingerprint
  private val eventsLongUnits =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  /** Epoch unit of a LONG-typed `events.ts`, inferred once per directory by
    * magnitude ([[inferLongEpochUnit]]) from one `max(ts)` scan of the ts
    * column. A TIMESTAMP(NANOS) file and a plain INT64-micros file present
    * the IDENTICAL footer schema under `nanosAsLong`, so the unit must come
    * from the data; the probe is batch-side and cached, which is what lets
    * the STREAMING read path (which cannot aggregate its own frame) share
    * the same inference. Only consulted when [[eventsTsType]] is LongType. */
  def eventsTsLongUnit(spark: SparkSession, sfDir: String): String =
    cachedForFp(eventsLongUnits,
        sfDir, pathFingerprint(s"$sfDir/events.parquet")) {
      eventsFileSchema(spark, sfDir) // ensures nanosAsLong is set for the scan
      inferLongEpochUnit(
        Option(spark.read.parquet(s"$sfDir/events.parquet")
          .agg(org.apache.spark.sql.functions.max(col("ts"))).head().get(0))
          .map(_.asInstanceOf[Long]))
    }

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
  // NOTE: there is deliberately NO (df, raw) overload defaulting the long
  // unit — a caller that skipped the probe would silently reintroduce the
  // 1000× time-compression trap on a micros-long file. All entry points go
  // through the probe-backed (spark, sfDir, df) form below.
  private[graft] def normalizeEventsTs(df: DataFrame, raw: DataType,
                                       longUnit: String): DataFrame =
    raw match {
      case LongType         => df.withColumn("ts", longEpochToTs("ts", longUnit))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(s"unsupported events.ts parquet type: $other")
    }

  /** One-call normalization for a frame read with [[eventsRawSchema]]:
    * resolves the stored `ts` type AND (for long columns) the inferred
    * epoch unit from the batch-side probes, both cached per directory.
    * Safe for streaming frames — the probes never touch `df` itself. */
  def normalizeEventsTs(spark: SparkSession, sfDir: String,
                        df: DataFrame): DataFrame = {
    val raw = eventsTsType(spark, sfDir)
    val unit = if (raw == LongType) eventsTsLongUnit(spark, sfDir) else "us"
    normalizeEventsTs(df, raw, unit)
  }

  /** Schema for a file-STREAM read of `events.parquet` — the batch-probed
    * footer schema verbatim, so EVERY column (not just `ts`) is typed as the
    * file actually stores it and a regenerated file can never be silently
    * misread through a stale hardcoded stream schema. Pair with
    * [[normalizeEventsTs]]. */
  def eventsRawSchema(spark: SparkSession, sfDir: String): StructType =
    eventsFileSchema(spark, sfDir)

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    eventsTsType(spark, sfDir) // sets nanosAsLong for the lazy scan
    normalizeWidths(
      normalizeEventsTs(spark, sfDir,
        spark.read.parquet(s"$sfDir/events.parquet")), "events", sfDir)
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
