package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Regression guard for the events `ts` parquet unit (round-6 breakage): the
  * driver's generator has shipped `ts` both as TIMESTAMP(NANOS) and as
  * TIMESTAMP(MICROS) across rounds, and the read path must decode IDENTICAL
  * epochs from either — batch AND streaming. The streaming half is the exact
  * blind spot that let a 1000× time compression through r06's fixture-only
  * specs: a LongType stream schema silently read a micros file as raw int64.
  */
class EventsTsUnitSpec extends SparkSpec {
  import spark.implicits._

  // one event at a pinned epoch (2023-06-15 12:34:56.789012 UTC) plus one a
  // day later: micros value 1686832496789012 — past 2^53 ns in nanos form,
  // so a double division would already corrupt it (DIV must not)
  private val epochsUs = Seq(1686832496789012L, 1686918896789012L)

  private def writeFixture(unit: String): String = {
    val dir = tmpDir(s"events_$unit")
    val base = epochsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = unit match {
      // raw int64 nanos — what the NANOS file reads as under nanosAsLong
      case "ns" => base.withColumn("ts", col("us") * 1000L)
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) — the r07 generator's unit
      case "us" => base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private def streamedEvents(dir: String): DataFrame = {
    val raw = spark.readStream.schema(Tables.eventsRawSchema(spark, dir))
      .parquet(s"$dir/events.parquet")
    val norm = Tables.normalizeEventsTs(spark, dir, raw)
    val name = s"events_ts_unit_${System.nanoTime()}"
    val q = norm.writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def epochs(df: DataFrame): Seq[Long] =
    df.select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect().toSeq.sorted

  test("batch read decodes identical epochs from a nanos and a micros file") {
    val (nsDir, usDir) = (writeFixture("ns"), writeFixture("us"))
    assert(epochs(Tables.events(spark, nsDir)) === epochsUs)
    assert(epochs(Tables.events(spark, usDir)) === epochsUs)
  }

  test("plain-int64 ts in any epoch unit is magnitude-inferred, batch and stream") {
    // A plain INT64 epoch column presents the SAME footer schema as
    // TIMESTAMP(NANOS) under nanosAsLong — the unit is only recoverable
    // from value magnitude (Tables.inferLongEpochUnit). A micros-long regen
    // read as nanos would compress time 1000×; every unit band must decode
    // the same instants. Whole-second epochs so the seconds fixture is exact.
    val us = Seq(1686832496000000L, 1686918896000000L)
    def writeLong(unit: String, f: Long => Long): String = {
      val dir = tmpDir(s"events_long_$unit")
      us.zipWithIndex
        .map { case (u, i) => (i.toLong, f(u), i.toLong, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    val dirs = Seq(
      writeLong("ns", _ * 1000L), writeLong("us", identity),
      writeLong("ms", _ / 1000L), writeLong("s", _ / 1000000L))
    for (d <- dirs) {
      assert(epochs(Tables.events(spark, d)) === us, s"batch $d")
      assert(epochs(streamedEvents(d)) === us, s"stream $d")
    }
  }

  test("a rewritten path re-probes: unit/schema caches key on the file fingerprint") {
    // the probe caches (footer schema, inferred epoch unit) once keyed on
    // the PATH alone for the JVM lifetime — rewriting the same path with a
    // different unit in one JVM (regen sims iterating into one /tmp dst,
    // exactly what tools/regen_sim.py encourages) silently applied the
    // stale unit (ADVICE r09). The fingerprint in the cache key makes the
    // rewrite re-probe; a stale "us" reading of the nanos rewrite below
    // would shift both instants 1000× into the future.
    val us = Seq(1686832496000000L, 1686918896000000L)
    val dir = tmpDir("events_rewrite")
    def writeLong(f: Long => Long): Unit =
      us.zipWithIndex
        .map { case (u, i) => (i.toLong, f(u), i.toLong, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    writeLong(identity) // plain int64 MICROS
    assert(epochs(Tables.events(spark, dir)) === us) // primes both caches
    // no sleep needed: the fingerprint folds per-file names/sizes, and
    // Spark names part files uniquely per write — a rewrite always changes
    // it, whatever the filesystem's mtime granularity
    writeLong(_ * 1000L) // SAME path rewritten as plain int64 NANOS
    assert(epochs(Tables.events(spark, dir)) === us,
      "stale cached unit applied to a rewritten file")
  }

  test("a second session reading a schema-cached nanos dir is still configured") {
    // the schema cache is keyed by dir but the nanosAsLong conf is
    // per-session: after session A probes (and caches) a nanos dir, a fresh
    // session B hitting the cache must STILL get the conf set, or its scan
    // fails at execution time (the ADVICE r07 second-session trap)
    val nsDir = writeFixture("ns")
    assert(epochs(Tables.events(spark, nsDir)) === epochsUs) // primes the cache
    val s2 = spark.newSession()
    assert(epochs(Tables.events(s2, nsDir)) === epochsUs)
  }

  test("streaming read decodes identical epochs from a nanos and a micros file") {
    val (nsDir, usDir) = (writeFixture("ns"), writeFixture("us"))
    assert(epochs(streamedEvents(nsDir)) === epochsUs)
    assert(epochs(streamedEvents(usDir)) === epochsUs)
  }

  test("streaming sessionization closes identical sessions from a nanos and a micros file") {
    // one user, four events: +0s, +600s (same session), +7200s (new session),
    // +14400s (new session, stays OPEN) — the inline-close emission set must
    // be identical from either stored unit, pinning the sessions_stream_closed
    // contract's read path the same way the epoch tests pin the scans
    val t0 = 1686832496789012L
    def writeSessFixture(unit: String): String = {
      val dir = tmpDir(s"events_sess_$unit")
      val base = Seq(0L, 600L, 7200L, 14400L).zipWithIndex
        .map { case (s, i) => (i.toLong, t0 + s * 1000000L, 1L, "click", 1.0, "{}") }
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      val withTs = unit match {
        case "ns" => base.withColumn("ts", col("us") * 1000L)
        case "us" => base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      }
      withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    def closedSessions(dir: String): Seq[(String, Long, Long, Long)] = {
      val raw = spark.readStream.schema(Tables.eventsRawSchema(spark, dir))
        .parquet(s"$dir/events.parquet")
      val norm = Tables.normalizeEventsTs(spark, dir, raw)
      val name = s"events_sess_${System.nanoTime()}"
      val q = graft.streaming.StatefulOps.statefulSessionize(norm, gapSeconds = 3600)
        .toDF().writeStream.format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    }
    val t0s = t0 / 1000000L
    val expected = Seq(("1", t0s, t0s + 600L, 2L), ("1", t0s + 7200L, t0s + 7200L, 1L))
    assert(closedSessions(writeSessFixture("ns")) === expected)
    assert(closedSessions(writeSessFixture("us")) === expected)
  }

  test("directory-layout events.parquet streams through a contract query") {
    // testdata ships events.parquet as a single FILE today; df.write.parquet
    // produces a DIRECTORY of part files. The contract stream source must
    // read both layouts (a name-glob over $dir silently matched nothing for
    // the directory layout — zero rows, no error)
    val dir = writeFixture("us") // writeFixture writes a directory layout
    val out = SparkEntry.queries("seg_stream_native")(spark, dir)
    assert(out.count() > 0, "directory-layout stream read zero rows")
  }

  test("real testdata: streamed ts range and count equal the batch read") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
      .agg(count(lit(1)), min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    // the production stream shape: schema probed from the footer, glob on the
    // single events file, same normalization as batch
    val raw = spark.readStream.schema(Tables.eventsRawSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val norm = Tables.normalizeEventsTs(spark, dir, raw)
    val name = s"events_real_${System.nanoTime()}"
    val q = norm.writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .agg(count(lit(1)), min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    assert(streamed === batch)
    assert(batch.getLong(0) > 0)
  }
}
