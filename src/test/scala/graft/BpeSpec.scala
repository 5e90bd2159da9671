package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeModel

/** Learned-vocab BPE: deterministic training on the word-type dictionary,
  * and three exactly-matching application forms (native expression, column
  * replace-chain, distinct-word join). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training merges the highest-weighted pair first, ties lexicographic") {
    // {ab×3, abc×2}: (a,b) weight 5 beats (b,c) weight 2; after merging,
    // (ab,c) weight 2 is the only pair left; then nothing occurs twice
    assert(BpeModel.train(Seq(("ab", 3L), ("abc", 2L)), 10) ==
      Seq(("a", "b"), ("ab", "c")))
    // tie on weight 2 → lexicographically smaller pair wins
    assert(BpeModel.train(Seq(("ba", 2L), ("cd", 2L)), 1) == Seq(("b", "a")))
    // hapax pairs never earn a merge
    assert(BpeModel.train(Seq(("xy", 1L)), 5) == Seq.empty)
  }

  test("merge application is left-to-right non-overlapping (replace semantics)") {
    // "aaaa" under (a,a): [aa, aa]; "aaa": [aa, a]
    assert(BpeModel.tokenizeCount("aaaa", Seq(("a", "a"))) == 2)
    assert(BpeModel.tokenizeCount("aaa", Seq(("a", "a"))) == 2)
    // chained merges: (a,a) then (aa,aa) → "aaaa" collapses to one token
    assert(BpeModel.tokenizeCount("aaaa", Seq(("a", "a"), ("aa", "aa"))) == 1)
    // merged symbol is not re-paired as LEFT within the same pass
    assert(BpeModel.tokenizeCount("aaa", Seq(("a", "a"), ("aa", "a"))) == 1)
  }

  test("scalar, column replace-chain, and native forms agree word by word") {
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("i", "n"))
    val words = Seq("the", "there", "thin", "inert", "a", "", "ththth",
      "eeee", "interthe").toDF("word")
    val viaChain = words
      .select($"word", BpeModel.tokenCountChain($"word", merges).as("tok"))
      .as[(String, Long)].collect().toMap
    for ((w, tok) <- viaChain if w.nonEmpty)
      assert(BpeModel.tokenizeCount(w, merges).toLong == tok,
        s"scalar vs chain diverge on '$w'")
    // native per-doc expression over a one-word doc equals the word count
    for ((w, tok) <- viaChain if w.nonEmpty) {
      val native = Seq(w).toDF("text")
        .select(graft.functions.NativeExprs.bpeTokenCount($"text", merges))
        .as[Long].collect()(0)
      assert(native == tok, s"native vs chain diverge on '$w'")
    }
  }

  test("native doc-level count equals the distinct-word join form on messy input") {
    val docs = Seq(
      (1L, "The quick brown fox JUMPS over the lazy dog the fox"),
      (2L, "punctuation, splits; words--and... digits 123 do not count"),
      (3L, ""), (4L, "!!! 999"),
      (5L, "aaa aaaa aaaaa the the the"),
      (6L, "café résumé naïve unicode boundary")
    ).toDF("doc_id", "text")
    val merges = BpeModel.learnMerges(docs, numMerges = 12)
    val native = docs.select($"doc_id",
        graft.functions.NativeExprs.bpeTokenCount($"text", merges).as("n"))
      .as[(Long, Long)].collect().toMap
    val joined = BpeModel.docTokenCounts(docs, merges)
      .as[(Long, Long)].collect().toMap
    // join form drops wordless docs; native reports 0 for them
    for ((id, n) <- native)
      assert(n == joined.getOrElse(id, 0L), s"doc $id: native $n vs join ${joined.get(id)}")
    assert(native(3L) == 0L && native(4L) == 0L)
  }

  test("learned merges compress the corpus (fewer tokens than characters)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = BpeModel.learnMerges(docs, numMerges = 40)
    assert(merges.size == 40, s"corpus must support 40 merges, got ${merges.size}")
    val stats = docs.select(
        sum(graft.functions.NativeExprs.bpeTokenCount(col("text"), merges)).as("tok"),
        sum(graft.functions.NativeExprs.bpeTokenCount(col("text"), Seq.empty)).as("chars"))
      .as[(Long, Long)].collect()(0)
    assert(stats._1 < stats._2,
      s"40 merges must compress: ${stats._1} tokens vs ${stats._2} word chars")
    // training is deterministic: same corpus → same merges
    assert(BpeModel.learnMerges(docs, numMerges = 40) == merges)
  }
}
