package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the incremental near-dup PROBE at sf0.1 —
  * which of its internal passes (new-batch signatures, bucket join,
  * candidate dedup, estimate prune, shingle verify) actually costs time.
  * Run: `Test/runMain graft.ProfileIncremental`. */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    docs.count()
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val index = time("ingest: corpus lshIndex (amortized)") {
      Dedup.lshIndex(corpus).localCheckpoint(true)
    }
    val corpusSigs = time("ingest: corpus lshSignatures (amortized)") {
      Dedup.lshSignatures(corpus).localCheckpoint(true)
    }
    // ---- the probe, decomposed (mirrors incrementalNearDuplicates) ----
    val newIndex = time("probe: new-batch index (sig+banding)") {
      Dedup.lshIndex(newDocs).localCheckpoint(true)
    }
    val a = newIndex.select(col("band"), col("bucket"), col("doc_id").as("id_new"))
    val candidates = time("probe: bucket joins + candidate dedup") {
      val vsCorpus = a.join(index
          .select(col("band"), col("bucket"), col("doc_id").as("id_old")),
          Seq("band", "bucket"))
        .filter(col("id_new") =!= col("id_old"))
        .select(least(col("id_new"), col("id_old")).as("id_a"),
                greatest(col("id_new"), col("id_old")).as("id_b"))
      val b = newIndex.select(col("band"), col("bucket"), col("doc_id").as("id_b2"))
      val vsSelf = a.join(b, Seq("band", "bucket"))
        .filter(col("id_new") < col("id_b2"))
        .select(col("id_new").as("id_a"), col("id_b2").as("id_b"))
      val c = vsCorpus.unionByName(vsSelf).dropDuplicates("id_a", "id_b")
        .localCheckpoint(true)
      println(s"[profile]   candidates: ${c.count()}")
      c
    }
    val candIds = candidates.select(col("id_a").as("doc_id"))
      .union(candidates.select(col("id_b").as("doc_id"))).distinct()
    println(s"[profile]   candidate docs: ${candIds.count()}")
    val pruned = time("probe: sig fetch + estimate prune") {
      val sigs = Dedup.lshSignatures(newDocs)
        .unionByName(corpusSigs)
        .join(candIds, Seq("doc_id"), "left_semi")
      val p = candidates
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .filter(graft.functions.NativeExprs.sigMatchFraction(col("sig_a"), col("sig_b")) >= 0.3)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      println(s"[profile]   pruned survivors: ${p.count()}")
      p
    }
    time("probe: shingle verify of survivors") {
      val survivorIds = pruned.select(col("id_a").as("doc_id"))
        .union(pruned.select(col("id_b").as("doc_id"))).distinct()
      val sh = docs.join(survivorIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.functions.NativeExprs.shingleSet(col("text"), 5).as("sh"))
      val n = pruned
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard",
          graft.functions.NativeExprs.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5).count()
      println(s"[profile]   verified pairs: $n")
    }
    time("probe: end-to-end operator (warm artifacts)") {
      Dedup.incrementalNearDuplicates(newDocs, corpus, index, threshold = 0.5,
        corpusSigs = Some(corpusSigs)).count()
    }
    spark.stop()
  }
}
