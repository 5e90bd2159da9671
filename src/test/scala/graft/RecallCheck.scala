package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Opt-in scale spot-check (not part of `sbt test`): verifies the LSH-based
  * pair pipelines against Spark-side brute force at a scale the DuckDB
  * oracle can't reach (the sf0.1 brute-force pair SQL runs for hours in
  * DuckDB; Spark's native Jaccard over 12.5M pairs takes ~a minute at
  * local[32]). Run: `sbt "Test/runMain graft.RecallCheck [sfDir]"`. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).localCheckpoint(true)

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet

    val brute = pairSet(graft.operators.Dedup.bruteForceJaccardPairs(docs, threshold = 0.5))
    println(s"[recall] brute-force 5-gram J>=0.5 pairs: ${brute.size}")

    val lsh = pairSet(graft.operators.Dedup.minhashNearDuplicates(docs, threshold = 0.5))
    println(s"[recall] minhash LSH pairs: ${lsh.size}; " +
      s"missed=${(brute -- lsh).size} extra=${(lsh -- brute).size}")

    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = pairSet(graft.operators.Dedup.incrementalNearDuplicates(
      newDocs, corpus, graft.operators.Dedup.lshIndex(corpus), threshold = 0.5))
    val bruteInc = brute.filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    println(s"[recall] incremental pairs: ${inc.size} vs restricted brute ${bruteInc.size}; " +
      s"missed=${(bruteInc -- inc).size} extra=${(inc -- bruteInc).size}")

    val okLsh = lsh == brute
    val okInc = inc == bruteInc
    println(s"[recall] RESULT: minhash=${if (okLsh) "EXACT" else "MISMATCH"} " +
      s"incremental=${if (okInc) "EXACT" else "MISMATCH"}")
    spark.stop()
    if (!okLsh || !okInc) sys.exit(1)
  }
}
