package graft
import org.apache.spark.sql.SparkSession
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // cold then warm
    time("minhash pipeline COLD") {
      graft.operators.Dedup.minhashNearDuplicates(docs, 0.5).count()
    }
    time("minhash pipeline WARM") {
      graft.operators.Dedup.minhashNearDuplicates(docs, 0.5).count()
    }
    time("clusters WARM") {
      graft.operators.Dedup.clusterNearDuplicates(
        graft.operators.Dedup.minhashNearDuplicates(docs, 0.5)).count()
    }
    spark.stop()
  }
}
