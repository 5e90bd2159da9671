package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSv2 JSONEachRow connector: correctness vs the built-in json reader,
  * real column pruning, and real filter pushdown (both that pushed rows are
  * skipped in the reader and that the plan advertises them). */
class JsonEachRowSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_name", StringType),
    StructField("value", DoubleType), StructField("flag", BooleanType)))

  private def writeFixture(): String = {
    val dir = tmpDir("jer")
    val lines = (1 to 300).map { i =>
      s"""{"user_id": $i, "event_name": "e${i % 7}", "value": ${i / 4.0}, "flag": ${i % 2 == 0}}"""
    } :+ """{"user_id": 9999, "event_name": null, "value": 1.5, "flag": true}""" :+
      """not json at all""" // corrupt line: skipped, never crashes the scan
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      lines.take(150).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.jsonl"),
      lines.drop(150).mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("reads by short name and matches the built-in json reader") {
    val dir = writeFixture()
    val v2 = spark.read.format("jsoneachrow").schema(schema).load(dir)
    val builtin = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(dir)
    assert(v2.collect().map(_.toSeq).toSet === builtin.collect().map(_.toSeq).toSet)
    assert(v2.count() === 301L) // corrupt line dropped
  }

  test("explicit schema is required") {
    intercept[IllegalArgumentException] {
      spark.read.format("jsoneachrow").load("/tmp/nope").collect()
    }
  }

  test("filters are pushed into the scan and advertised in the plan") {
    val dir = writeFixture()
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir)
      .filter(col("user_id") > 250 && col("event_name") === "e3")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("user_id"),
      s"pushdown not visible in plan:\n$plan")
    val got = df.select("user_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.forall(_ > 250))
    val expect = (251 to 300).filter(_ % 7 == 3).map(_.toLong).toArray
    assert(got === expect)
  }

  test("column pruning reaches the scan") {
    val dir = writeFixture()
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir)
      .select("event_name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<event_name:string>"),
      s"pruned schema not visible:\n$plan")
    assert(df.count() === 301L)
  }

  test("non-integral numbers in integral fields null out, never truncate") {
    val dir = tmpDir("jer_frac")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.jsonl"),
      """{"user_id": 3.7, "event_name": "x", "value": 1.0, "flag": true}
        |{"user_id": 3, "event_name": "y", "value": 2.0, "flag": false}"""
        .stripMargin.getBytes("UTF-8"))
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir)
    assert(df.filter(col("user_id").isNull).select("event_name").as[String].collect()
      === Array("x"), "3.7 must become null in a LongType field")
    // a pushed equality can never match the truncated ghost value
    assert(df.filter(col("user_id") === 3L).select("event_name").as[String].collect()
      === Array("y"))
  }

  test("null fields, range + null-test pushdown, boolean equality") {
    val dir = writeFixture()
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir)
    assert(df.filter(col("event_name").isNull).select("user_id").as[Long].collect()
      === Array(9999L))
    assert(df.filter(col("value") <= 2.0 && col("flag") === true)
      .count() === 5L) // even user_id 2,4,6,8 (values .5..2.0) + the 9999 sentinel
  }

  test("statistics make a small connector table broadcast") {
    val dir = writeFixture()
    val small = spark.read.format("jsoneachrow").schema(schema).load(dir)
    val big = spark.range(0, 100000).select(col("id").as("user_id"),
      (col("id") % 100).as("k"))
    val joined = big.join(small, Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small connector side (a few KB on disk) must broadcast:\n$plan")
    assert(joined.count() === 301L)
  }

  test("limit is pushed into the scan and stops the reader early") {
    val dir = writeFixture()
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"), s"limit not pushed:\n$plan")
    assert(df.count() === 7L) // global Limit still exact across 2 partitions
  }

  test("a malformed UTF-8 byte degrades to one skipped record, not a task failure") {
    val dir = tmpDir("jer_bad_utf8")
    val good = """{"user_id": 1, "event_name": "ok", "value": 1.0, "flag": true}"""
    val bad = // 0xC3 dangling continuation start inside the string value
      "{\"user_id\": 2, \"event_name\": \"x".getBytes("UTF-8") ++
        Array(0xC3.toByte) ++ "\"}\n".getBytes("UTF-8")
    val bytes = (good + "\n").getBytes("UTF-8") ++ bad ++
      ("""{"user_id": 3, "event_name": "also ok", "value": 3.0, "flag": false}""" + "\n")
        .getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "m.jsonl"), bytes)
    val df = spark.read.format("jsoneachrow").schema(schema).load(dir)
    // rows 1 and 3 survive; row 2 either parses with U+FFFD or is skipped —
    // but the partition NEVER fails
    val ids = df.select("user_id").as[Long].collect().sorted
    assert(ids.contains(1L) && ids.contains(3L))
  }

  test("offset-less ISO-8601 timestamps parse in the session timezone") {
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType)))
    val dir = tmpDir("jer_ts")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.jsonl"),
      """{"id": 1, "at": "2024-03-01T12:30:00"}
        |{"id": 2, "at": "2024-03-01T12:30:00+02:00"}
        |{"id": 3, "at": "not a time"}"""
        .stripMargin.getBytes("UTF-8"))
    val v2 = spark.read.format("jsoneachrow").schema(tsSchema).load(dir)
    val builtin = spark.read.schema(tsSchema).json(dir)
    assert(v2.collect().map(_.toSeq).toSet === builtin.collect().map(_.toSeq).toSet,
      "offset-less and offset-ful timestamps must match the built-in reader")
    assert(v2.filter(col("at").isNotNull).count() === 2L)
  }

  test("fractional literal against an integral field never reader-drops a row") {
    import org.apache.spark.sql.sources.{Filter, GreaterThan, LessThan}
    val dir = tmpDir("jer_fraclit")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.jsonl"),
      (-5 to 5).map(i => s"""{"user_id": $i, "event_name": "r$i", "value": 0.0, "flag": true}""")
        .mkString("\n").getBytes("UTF-8"))
    // drive the reader directly: Spark unwraps casts before pushdown, so a
    // fractional literal can't be produced through SQL — but the never-drop
    // invariant must hold for ANY filter handed to pushFilters
    def readerIds(f: Filter): Seq[Long] = {
      val b = new graft.sources.JsonEachRowScanBuilder(schema, dir)
      b.pushFilters(Array(f))
      val scan = b.build()
      val batch = scan.toBatch
      val fac = batch.createReaderFactory()
      batch.planInputPartitions().toSeq.flatMap { p =>
        val r = fac.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        while (r.next()) buf += r.get().getLong(0)
        r.close(); buf
      }
    }
    // x > -3.5 keeps -3 (longValue truncation to -3 would drop it)
    assert(readerIds(GreaterThan("user_id", java.lang.Double.valueOf(-3.5)))
      === (-3 to 5).map(_.toLong))
    // x < 2.5 keeps 2
    assert(readerIds(LessThan("user_id", java.lang.Double.valueOf(2.5)))
      === (-5 to 2).map(_.toLong))
  }
}
