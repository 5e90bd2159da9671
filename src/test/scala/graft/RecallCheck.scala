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

    // edit-distance fuzzy join: its DuckDB oracle is a full O(n²·len²) pair
    // scan — intractable at this scale — so brute-force the length-banded
    // thresholded levenshtein in Spark instead (banded O(k·len) built-in)
    val keys = docs.select(col("doc_id"), substring(col("text"), 1, 64).as("key"))
      .localCheckpoint(true)
    val edBrute = keys.select(col("doc_id").as("id_a"), col("key").as("ka"))
      .join(keys.select(col("doc_id").as("id_b"), col("key").as("kb")),
        col("id_a") < col("id_b") &&
          abs(length(col("ka")) - length(col("kb"))) <= 8)
      .filter(levenshtein(col("ka"), col("kb"), 8) >= 0)
    val edBruteSet = pairSet(edBrute)
    val ed = pairSet(graft.operators.Dedup.editDistancePairs(keys, maxDist = 8, keyCol = "key"))
    println(s"[recall] editdist pairs: ${ed.size} vs brute ${edBruteSet.size}; " +
      s"missed=${(edBruteSet -- ed).size} extra=${(ed -- edBruteSet).size}")

    // exact word-bigram Jaccard: the adaptive operator (direct branch at
    // this corpus's density) vs a plain cross-join brute force on the same
    // gram definition
    val ng = pairSet(graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.8, n = 2))
    val gramsDf = docs.repartition(32).select(col("doc_id").as("id"),
        split(graft.functions.TextAnalysis.normalized(col("text")), " ").as("w"))
      .select(col("id"), when(size(col("w")) >= 2, array_distinct(expr(
          "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))")))
        .otherwise(expr("cast(array() as array<string>)")).as("g"))
      .filter(size(col("g")) > 0).localCheckpoint(true)
    val ngBrute = pairSet(gramsDf.select(col("id").as("id_a"), col("g").as("ga"))
      .crossJoin(broadcast(gramsDf.select(col("id").as("id_b"), col("g").as("gb"))))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("double"))
      .filter(col("inter") / (size(col("ga")) + size(col("gb")) - col("inter")) >= 0.8))
    println(s"[recall] ngram-jaccard pairs: ${ng.size} vs brute ${ngBrute.size}; " +
      s"missed=${(ngBrute -- ng).size} extra=${(ng -- ngBrute).size}")

    val okLsh = lsh == brute
    val okInc = inc == bruteInc
    val okEd = ed == edBruteSet
    val okNg = ng == ngBrute
    println(s"[recall] RESULT: minhash=${if (okLsh) "EXACT" else "MISMATCH"} " +
      s"incremental=${if (okInc) "EXACT" else "MISMATCH"} " +
      s"editdist=${if (okEd) "EXACT" else "MISMATCH"} " +
      s"ngram=${if (okNg) "EXACT" else "MISMATCH"}")
    spark.stop()
    if (!okLsh || !okInc || !okEd || !okNg) sys.exit(1)
  }
}
