package graft

import org.apache.spark.sql.SparkSession

/** Prints the executed physical plan of named contract queries at sf0.001
  * (AQE initial plan, 4 shuffle partitions — the PlanShuffleCount
  * environment), for eyeballing a plan before re-pinning its golden count:
  * `Test/runMain graft.PlanPeek <query> [query...]`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
