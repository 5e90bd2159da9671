package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM tokenizer: deterministic Viterbi-EM training, exact integer
  * combined-key DP (brute-force verified), and three exactly-matching
  * application forms (scalar, HOF column chain, native expression). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def costMapOf(ps: Seq[(String, Long)]) = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    ps.foreach { case (p, c) => m.put(p, c) }
    m
  }

  test("viterbiKey equals brute-force lexicographic (cost, nPieces) minimum") {
    val vocab = Seq(("a", 100L), ("b", 150L), ("ab", 180L), ("ba", 260L),
                    ("aba", 270L), ("bb", 90L), ("abab", 400L))
    val cm = costMapOf(vocab)
    val lookup = vocab.toMap
    def brute(word: String): Long = {
      // enumerate every segmentation into pieces of length 1..MaxPieceLen
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(UnigramLm.MaxPieceLen, s.length)).flatMap { l =>
          val (h, t) = s.splitAt(l)
          val hc = lookup.get(h)
          if (hc.isEmpty && l > 1) Seq.empty
          else segs(t).map(h +: _)
        }
      segs(word).map { pieces =>
        val cost = pieces.map(p => lookup.getOrElse(p, UnigramLm.UnkCost)).sum
        cost * UnigramLm.KeyMul + pieces.size
      }.min
    }
    for (w <- Seq("a", "b", "ab", "ba", "abab", "ababab", "bbbb", "aababba",
                  "abababab", "aaaa", "babab")) {
      assert(UnigramLm.viterbiKey(w, cm) == brute(w), s"DP vs brute on '$w'")
    }
    // unknown single char takes UnkCost; unknown multi-char pieces are skipped
    assert(UnigramLm.viterbiKey("z", cm) ==
      UnigramLm.UnkCost * UnigramLm.KeyMul + 1)
    assert(UnigramLm.viterbiKey("az", cm) ==
      (100L + UnigramLm.UnkCost) * UnigramLm.KeyMul + 2)
  }

  test("nPieces tiebreak: among equal-cost segmentations the DP picks fewer pieces") {
    // "ab" as one piece costs 250, as two pieces 250 — same cost, the
    // combined key must prefer the single piece
    val cm = costMapOf(Seq(("a", 100L), ("b", 150L), ("ab", 250L)))
    val key = UnigramLm.viterbiKey("ab", cm)
    assert(key % UnigramLm.KeyMul == 1, "tie must resolve to 1 piece")
    assert(key / UnigramLm.KeyMul == 250L)
  }

  test("training is deterministic, covers every seen char, and compresses") {
    val dict = Seq(("the", 50L), ("there", 20L), ("then", 15L), ("other", 10L),
                   ("in", 40L), ("inner", 8L), ("zoo", 3L), ("ox", 2L))
    val m1 = UnigramLm.train(dict, vocabSize = 30, emRounds = 3)
    val m2 = UnigramLm.train(dict, vocabSize = 30, emRounds = 3)
    assert(m1 == m2, "same dictionary must train the same model")
    // every char seen in training is a retained piece (oracle coverage)
    val pieceSet = m1.pieces.map(_._1).toSet
    dict.flatMap(_._1.toSeq).distinct.foreach { c =>
      assert(pieceSet.contains(c.toString), s"single '$c' must survive pruning")
    }
    // the dominant word must segment into fewer pieces than its char count
    val cm = m1.costOf
    val theKey = UnigramLm.viterbiKey("the", cm)
    assert(theKey % UnigramLm.KeyMul < 3, "'the' should compress below chars")
    assert(m1.maxWordLen == 5)
  }

  test("EM does not increase total corpus cost") {
    val dict = Seq(("abcabc", 30L), ("abc", 20L), ("cab", 10L), ("bca", 5L),
                   ("xyz", 4L), ("zyx", 2L))
    def corpusCost(m: UnigramLm.Model): Long = {
      val cm = m.costOf
      dict.map { case (w, n) => (UnigramLm.viterbiKey(w, cm) / UnigramLm.KeyMul) * n }.sum
    }
    val costs = (0 to 3).map(r => corpusCost(UnigramLm.train(dict, 20, r)))
    // hard-EM re-estimation concentrates mass on used pieces; with the
    // deterministic floor the corpus cost is non-increasing round over round
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"$costs") }
  }

  test("scalar, HOF chain, and native forms agree on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(120).cache()
    val model = UnigramLm.learn(docs)
    // HOF chain over the distinct-word join vs native per-row projection
    val viaJoin = UnigramLm.docTokenStats(docs, model)
      .select($"doc_id", $"n_pieces", $"unigram_cost")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    val st = graft.functions.NativeExprs.unigramStats($"text", model)
    val viaNative = docs.select($"doc_id",
        st.getField("n_pieces").as("p"), st.getField("unigram_cost").as("c"))
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    // join drops zero-word docs; native emits (0,0) there
    viaJoin.foreach { case (id, pair) =>
      assert(viaNative(id) == pair, s"native vs join diverge on doc $id")
    }
    (viaNative.keySet -- viaJoin.keySet).foreach { id =>
      assert(viaNative(id) == (0L, 0L), s"wordless doc $id must be (0,0)")
    }
    // scalar viterbi spot-check against the HOF column form on raw words
    val cm = model.costOf
    val words = docs.select(explode(graft.functions.TextAnalysis.words($"text")))
      .distinct().limit(200)
      .withColumn("key", UnigramLm.viterbiKeyChain(col("col"), model))
      .as[(String, Long)].collect()
    words.foreach { case (w, key) =>
      assert(UnigramLm.viterbiKey(w, cm) == key, s"scalar vs HOF on '$w'")
    }
    docs.unpersist()
  }

  test("words at/over KeyMul chars are skipped by every scorer; n_words still counts them") {
    val model = UnigramLm.train(Seq(("ab", 10L), ("a", 6L), ("b", 5L)),
                                vocabSize = 8, emRounds = 1)
    val longWord = "a" * UnigramLm.KeyMul.toInt // 64 chars — outside the contract
    val docs = Seq((1L, s"ab $longWord ab"), (2L, "ab ab")).toDF("doc_id", "text")
    // native expression: the long word contributes nothing
    val st = functions.NativeExprs.unigramStats(col("text"), model)
    val native = docs.select($"doc_id",
        st.getField("n_pieces").as("np"), st.getField("unigram_cost").as("uc"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(native(0)._2 == native(1)._2 && native(0)._3 == native(1)._3,
      "64-char word changed n_pieces/cost — scorer is not skipping it")
    // docTokenStats reference form: identical skip, n_words counts ALL words
    val ref = UnigramLm.docTokenStats(docs, model)
      .select($"doc_id", $"n_words", $"n_pieces", $"unigram_cost")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ref(0)._2 == 3 && ref(1)._2 == 2, "n_words must count skipped words")
    assert((ref(0)._3, ref(0)._4) == (native(0)._2, native(0)._3))
    assert((ref(1)._3, ref(1)._4) == (native(1)._2, native(1)._3))
  }

  test("full-table maxWordLen: tail word types longer than any dictionary word " +
       "still get complete oracle DP coverage") {
    // 'zzzzzzzz' (8 chars, unseen char) appears once — outside any top-K
    // dictionary cut by frequency, but the model's maxWordLen must still
    // reach it and the oracle's UNK branch must cost it
    val docs = (1 to 30).map(i => (i.toLong, "ab ab ab")).toDF("doc_id", "text")
      .union(Seq((31L, "ab zzzzzzzz")).toDF("doc_id", "text"))
    val model = UnigramLm.learn(docs, vocabSize = 8, emRounds = 1, maxVocab = 2)
    assert(model.maxWordLen >= 8,
      s"maxWordLen ${model.maxWordLen} derived from the truncated dictionary")
    val sql = UnigramLm.oracleTokenSql(model)
    assert(sql.contains("d8 "), "DP unroll must reach length-8 words")
    assert(sql.contains(s"coalesce(v.cost, ${UnigramLm.UnkCost})"),
      "oracle DP needs the UNK single-char branch for unseen characters")
  }

  test("oracle SQL embeds every piece and unrolls the DP to maxWordLen") {
    val model = UnigramLm.Model(
      Seq(("a", 100L), ("ab", 180L), ("b", 150L)), maxWordLen = 4)
    val sql = UnigramLm.oracleTokenSql(model)
    assert(sql.contains("('ab',CAST(180 AS BIGINT))"))
    assert(sql.contains("d4 AS") && !sql.contains("d5 AS"))
    assert(sql.contains(s"% ${UnigramLm.KeyMul}") &&
           sql.contains(s"// ${UnigramLm.KeyMul}"))
    // non-[a-z] pieces must be rejected (SQL injection guard)
    intercept[IllegalArgumentException] {
      UnigramLm.oracleTokenSql(UnigramLm.Model(Seq(("a'b", 1L)), 3))
    }
  }
}
