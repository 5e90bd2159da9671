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

    // perceptual phash pairs: the 4×15-bit pigeonhole guarantees full
    // recall to Hamming 3, so the chunk join must equal brute force exactly
    val media = graft.operators.Multimodal.syntheticMediaTable(docs)
      .localCheckpoint(true)
    val ph = pairSet(graft.operators.Multimodal.phashNearDuplicates(media))
    val hashed = media.select(col("media_id"),
        coalesce(graft.functions.NativeExprs.phash60(col("content")), lit(0L)).as("p"))
      .localCheckpoint(true)
    val phBrute = pairSet(hashed.select(col("media_id").as("id_a"), col("p").as("pa"))
      .crossJoin(broadcast(hashed.select(col("media_id").as("id_b"), col("p").as("pb"))))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= 3))
    println(s"[recall] phash pairs: ${ph.size} vs brute ${phBrute.size}; " +
      s"missed=${(phBrute -- ph).size} extra=${(ph -- phBrute).size}")

    // the contract queries' planted embedding corpus (base + perturbed
    // copies of every 25th vector, copies keeping their source's cluster)
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
              col("embedding").cast("array<double>").as("embedding"))
    val embPlanted = embBase.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("label"),
              transform(col("embedding"),
                        (x, i) => when(i === 0, x * lit(1.25)).otherwise(x)).as("embedding"))
    val embCorpus = embBase.unionByName(embPlanted).localCheckpoint(true)
    val cosine = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.NativeExprs.cosineSim(a, b)

    // semanticDedup kept-set vs brute (cluster-bounded pairs are exact):
    // a vector is dropped iff a LOWER-id same-cluster mate sits at >= t
    val semKept = graft.operators.Similarity.semanticDedup(embCorpus, threshold = 0.95)
      .filter(col("kept")).select(col("vec_id").cast("long"))
      .as[Long].collect().toSet
    val allIds = embCorpus.select(col("vec_id").cast("long")).as[Long].collect().toSet
    val semDropBrute = embCorpus
      .select(col("label").as("l"), col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(embCorpus.select(col("label").as("l"), col("vec_id").as("id_b"),
                             col("embedding").as("vb")), Seq("l"))
      .filter(col("id_b") < col("id_a"))
      .filter(cosine(col("va"), col("vb")) >= 0.95)
      .select(col("id_a").cast("long")).distinct().as[Long].collect().toSet
    val semKeptBrute = allIds -- semDropBrute
    println(s"[recall] semantic kept: ${semKept.size} vs brute ${semKeptBrute.size}; " +
      s"missed=${(semKeptBrute -- semKept).size} extra=${(semKept -- semKeptBrute).size}")

    // embeddingNearDuplicates vs all-pairs brute force. The SRP bucketing
    // is probabilistic-recall by design; the exact cosine verify means
    // extras are impossible — report both, gate on extras == 0 and recall.
    val en = pairSet(graft.operators.Similarity.embeddingNearDuplicates(
      embCorpus, threshold = 0.95, dim = 64))
    val enBrute = pairSet(embCorpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(broadcast(embCorpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= 0.95))
    val enRecall = if (enBrute.isEmpty) 1.0
                   else enBrute.intersect(en).size.toDouble / enBrute.size
    println(f"[recall] embedding pairs: ${en.size} vs brute ${enBrute.size}; " +
      s"missed=${(enBrute -- en).size} extra=${(en -- enBrute).size} " +
      f"recall=$enRecall%.4f")

    // ---- directed containment join vs all-pairs brute force (its DuckDB
    // oracle times out at this scale like the other pair joins) ----
    val grams3 = docs.repartition(32).select(col("doc_id").as("id"),
        split(graft.functions.TextAnalysis.normalized(col("text")), " ").as("w"))
      .select(col("id"), when(size(col("w")) >= 3, array_distinct(expr(
          "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3)))")))
        .otherwise(expr("cast(array() as array<string>)")).as("g"))
      .filter(size(col("g")) > 0).localCheckpoint(true)
    val ctBrute = pairSet(grams3.select(col("id").as("id_a"), col("g").as("ga"))
      .crossJoin(broadcast(grams3.select(col("id").as("id_b"), col("g").as("gb"))))
      .filter(col("id_a") =!= col("id_b"))
      .filter(size(array_intersect(col("ga"), col("gb"))).cast("double")
                / size(col("ga")) >= 0.8))
    val ct = pairSet(graft.operators.Dedup.containmentPairs(docs, threshold = 0.8, n = 3))
    println(s"[recall] containment pairs: ${ct.size} vs brute ${ctBrute.size}; " +
      s"missed=${(ctBrute -- ct).size} extra=${(ct -- ctBrute).size}")

    // ---- cluster-consumer family: clustering / incremental fold / keep-best
    // / leakage split must all agree with a DRIVER-SIDE union-find over the
    // brute-verified pair set (independent implementation) ----
    val parent = new java.util.HashMap[Long, Long]()
    def findRoot(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (parent.getOrDefault(c, c) != c) {
        val n = parent.getOrDefault(c, c); parent.put(c, r); c = n
      }
      r
    }
    brute.foreach { case (a, b) =>
      val (ra, rb) = (findRoot(a), findRoot(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val pairIds = brute.flatMap(p => Seq(p._1, p._2))
    val expComp: Map[Long, Long] = pairIds.map(id => id -> findRoot(id)).toMap
    val lshPairsDf = graft.operators.Dedup.minhashNearDuplicates(docs, threshold = 0.5)
      .localCheckpoint(true)
    val clustersDf = graft.operators.Dedup.clusterNearDuplicates(lshPairsDf)
      .localCheckpoint(true)
    val gotComp = clustersDf.select(col("id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val okClu = gotComp == expComp
    println(s"[recall] clusters: ${gotComp.size} assignments vs union-find ${expComp.size}; " +
      s"equal=$okClu")

    // incremental fold: persisted hist assignments + probe pairs == scratch
    // clustering of the full graph (hist-internal ∪ pairs-touching-new = all)
    val histPairs = lshPairsDf.filter(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0)
    val histAssign = graft.operators.Dedup.clusterNearDuplicates(histPairs)
    val incPairsDf = lshPairsDf.filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    val foldComp = graft.operators.Dedup.updateClusters(histAssign, incPairsDf)
      .select(col("id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val okFold = foldComp == expComp
    println(s"[recall] incremental fold: ${foldComp.size} assignments; equal=$okFold")

    // keep-best representative: per cluster (singletons = own cluster), the
    // member with max n_chars, ties to the lowest id
    val nchars = docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)].collect().toMap
    val expRep = nchars.keys.groupBy(id => expComp.getOrElse(id, id)).map {
      case (cid, members) =>
        val rep = members.minBy(id => (-nchars(id), id))
        cid -> (members.size.toLong, rep, nchars(rep))
    }
    val docsNc = docs.select(col("doc_id"), col("n_chars"))
    val gotRep = docsNc.join(clustersDf, docsNc("doc_id") === clustersDf("id"), "left")
      .select(col("doc_id"), col("n_chars"),
              coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
           max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id"))).as("rep"),
           max(col("n_chars")).as("rep_nc"))
      .select(col("cluster_id").cast("long"), col("n_members").cast("long"),
              col("rep").cast("long"), col("rep_nc").cast("long"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val okRep = gotRep == expRep
    println(s"[recall] keep-best: ${gotRep.size} clusters; equal=$okRep")

    // leakage split: every doc's split must be the Knuth hash of its
    // CLUSTER id (members move together)
    val expSplit = nchars.keys.map { id =>
      val cid = expComp.getOrElse(id, id)
      val m = ((cid * graft.operators.Sampling.Knuth) % 100L + 100L) % 100L
      id -> (if (m < 10L) "test" else "train")
    }.toMap
    val gotSplit = graft.operators.Dedup.leakageFreeSplit(docs, lshPairsDf, testPct = 10)
      .select(col("doc_id").cast("long"), col("split"))
      .as[(Long, String)].collect().toMap
    val okSplit = gotSplit == expSplit
    println(s"[recall] leakage split: ${gotSplit.size} docs; equal=$okSplit")

    // ---- exact substring spans (char-granular, L=30, the contract query's
    // parameters): brute-force the FULL corpus definition on the driver
    // (~1.35M windows at sf0.1 — trivial in one HashMap) and compare every
    // doc's span digest exactly. Corpus is ASCII (checked at lane build), so
    // UTF-16 substring == codepoint substring. ----
    val esL = 30
    val docTexts = docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("t"))
      .as[(Long, String)].collect()
    require(docTexts.forall(_._2.forall(_ < 128)),
      "exactSubstr brute force assumes an ASCII corpus (codepoint == UTF-16)")
    val winFreq = new java.util.HashMap[String, Integer]()
    for ((_, s) <- docTexts; i <- 0 to s.length - esL)
      winFreq.merge(s.substring(i, i + esL), 1, (a, b) => a + b)
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val esExp = docTexts.map { case (id, s) =>
      val ps = (0 to s.length - esL)
        .filter(i => winFreq.get(s.substring(i, i + esL)) >= 2).map(_ + 1)
      // coverage islands: new span where consecutive starts are > L apart
      val sp = ps.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
        if (acc.nonEmpty && p - acc.last._2 <= esL) acc.init :+ (acc.last._1, p)
        else acc :+ (p, p)
      }.map { case (a, b) => (a, b + esL - 1) }
      id -> ((sp.size.toLong, sp.map(x => x._2 - x._1 + 1L).sum,
              md5Hex(sp.map(x => s"${x._1}:${x._2}").mkString(","))))
    }.toMap
    val esGot = graft.operators.Dedup.exactSubstringSpans(docs, esL)
      .select(col("doc_id").cast("long"), col("n_dup_spans"), col("dup_chars"),
              col("span_digest"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val okEs = esGot == esExp
    val esDup = esExp.count(_._2._1 > 0)
    println(s"[recall] exactsubstr: ${esGot.size} docs, $esDup with dup spans; " +
      s"equal=$okEs")

    // ---- cross-snapshot incremental ANN at scale (contract parameters:
    // k=5, nprobe=3, queries vec_id<8, batch vec_id%5==0): (a) the in-frame
    // incremental probe must equal a probe over the REAL partitionBy-appended
    // layout — the maintenance-write equivalence the sf0.001 spec pins,
    // re-proved on the full corpus; (b) at nprobe = #cells the updated index
    // must answer exactly the brute-force top-k over the union corpus. ----
    val annEmb = Tables.embeddings(spark, sfDir)
    val annHist = annEmb.filter(col("vec_id") % 5 =!= 0)
    val annBatch = annEmb.filter(col("vec_id") % 5 === 0)
    val annQ = annEmb.filter(col("vec_id") < 8)
    val annDir = java.nio.file.Files.createTempDirectory("recall_ivf_hist").toString
    graft.operators.Similarity.writeIvfLayout(annHist, annDir)
    val annCent = graft.operators.Similarity.ivfCentroidTable(annHist)
      .localCheckpoint(true) // FROZEN quantizer, shared by every lane below
    def annRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.select(col("query_id").cast("long"), col("rank").cast("int"),
                col("neighbor_id").cast("long"))
        .orderBy("query_id", "rank").as[(Long, Int, Long)].collect().toSeq
    val annInc = annRows(graft.operators.Similarity.ivfIncrementalTopK(
      spark, annDir, annBatch, annQ, k = 5, nprobe = 3, centroids = Some(annCent)))
    graft.operators.Similarity.ivfAssign(annBatch, annCent)
      .write.mode("append").partitionBy("label").parquet(annDir)
    val annApp = annRows(graft.operators.Similarity.ivfTopKFromLayout(
      spark, annDir, annQ, k = 5, nprobe = 3, centroids = Some(annCent)))
    val okAnnApp = annInc == annApp
    val annCells = annHist.select(col("label")).distinct().count().toInt
    val annDir2 = java.nio.file.Files.createTempDirectory("recall_ivf_hist2").toString
    graft.operators.Similarity.writeIvfLayout(annHist, annDir2)
    val annFull = annRows(graft.operators.Similarity.ivfIncrementalTopK(
      spark, annDir2, annBatch, annQ, k = 5, nprobe = annCells,
      centroids = Some(annCent))).toSet
    val annBrute = annRows(graft.operators.Similarity.bruteForceTopK(
      annEmb, annQ, 5)).toSet
    val okAnnExact = annFull == annBrute
    println(s"[recall] incremental ANN: append-equiv=$okAnnApp " +
      s"(${annInc.size} rows), full-probe==brute=$okAnnExact " +
      s"($annCells cells)")
    Seq(annDir, annDir2).foreach { d =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- PCA reduced-dim ANN (contract parameters r=32, candK=160,
    // k=5, queries vec_id<8): result determinism is oracle-gated; THIS
    // lane gates prescreen recall vs full-width brute force. The synthetic
    // spectrum is flat (PCA's worst case) — measured 0.925 at sf0.1;
    // gate at 0.8 so a broken projection fails loudly while the known
    // isotropic-corpus ceiling doesn't flap the gate. ----
    val pcaModel = graft.operators.Pca.train(annEmb, dim = 64, r = 32)
    val pcaGot = annRows(graft.operators.Pca.pcaTopK(
        annEmb, annQ, k = 5, candK = 160, pcaModel))
      .map(t => (t._1, t._3)).toSet
    val pcaBrute = annBrute.map(t => (t._1, t._3))
    val pcaRecall = pcaGot.intersect(pcaBrute).size.toDouble / pcaBrute.size
    val okPca = pcaRecall >= 0.8
    println(f"[recall] pca ann: ${pcaGot.size} pairs, recall@5=$pcaRecall%.4f")

    val okCt = ct == ctBrute
    val okLsh = lsh == brute
    val okInc = inc == bruteInc
    val okEd = ed == edBruteSet
    val okNg = ng == ngBrute
    val okPh = ph == phBrute
    val okSem = semKept == semKeptBrute
    val okEn = (en -- enBrute).isEmpty && enRecall >= 0.98
    println(s"[recall] RESULT: minhash=${if (okLsh) "EXACT" else "MISMATCH"} " +
      s"incremental=${if (okInc) "EXACT" else "MISMATCH"} " +
      s"editdist=${if (okEd) "EXACT" else "MISMATCH"} " +
      s"ngram=${if (okNg) "EXACT" else "MISMATCH"} " +
      s"phash=${if (okPh) "EXACT" else "MISMATCH"} " +
      s"semantic=${if (okSem) "EXACT" else "MISMATCH"} " +
      s"containment=${if (okCt) "EXACT" else "MISMATCH"} " +
      s"clusters=${if (okClu) "EXACT" else "MISMATCH"} " +
      s"fold=${if (okFold) "EXACT" else "MISMATCH"} " +
      s"keepbest=${if (okRep) "EXACT" else "MISMATCH"} " +
      s"split=${if (okSplit) "EXACT" else "MISMATCH"} " +
      s"exactsubstr=${if (okEs) "EXACT" else "MISMATCH"} " +
      s"incann=${if (okAnnApp && okAnnExact) "EXACT" else "MISMATCH"} " +
      s"pcaann=${if (okPca) f"OK(recall=$pcaRecall%.3f)" else "MISMATCH"} " +
      s"embedding=${if (en == enBrute) "EXACT"
                    else if (okEn) f"OK(recall=$enRecall%.4f, 0 extras)"
                    else "MISMATCH"}")
    spark.stop()
    if (!okLsh || !okInc || !okEd || !okNg || !okPh || !okSem || !okEn ||
        !okCt || !okClu || !okFold || !okRep || !okSplit || !okEs ||
        !okAnnApp || !okAnnExact || !okPca) sys.exit(1)
  }
}
