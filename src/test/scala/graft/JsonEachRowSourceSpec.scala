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
}
