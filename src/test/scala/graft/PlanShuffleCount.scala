package graft

import org.apache.spark.sql.SparkSession

/** Prints the shuffle-exchange count of each non-streaming contract query's
  * physical plan (AQE off, sf0.001) — the measurement behind PlanLintSpec's
  * pinned exchange-count test. Run: `Test/runMain graft.PlanShuffleCount`. */
object PlanShuffleCount {
  // shuffle exchanges only: hash/range/single-partition repartitions; a
  // BroadcastExchange is a different (cheap, build-side) animal
  private val ShuffleRe = "Exchange (hash|range|Single)".r

  def count(plan: String): Int = ShuffleRe.findAllIn(plan).length

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = Set("seg_stream_equiv", "seg_stream_native",
      "seg_stream_stateful", "seg_retention_stream", "seg_stream_enrich",
      "seg_stream_attribution", "sessions_stream_closed")
    for ((name, fn) <- SparkEntry.queries.toSeq if !streaming(name)) {
      val n = try count(fn(spark, "/root/testdata/sf0.001")
                          .queryExecution.executedPlan.toString)
              catch { case e: Throwable => -1 }
      println(s"""[shufflecount] "$name" -> $n,""")
    }
    spark.stop()
  }
}
