package graft

import org.apache.spark.sql.functions._
import graft.operators.WordPiece

/** WordPiece tokenizer: deterministic likelihood-merged training, greedy
  * longest-match-first encoding (hand-verified fixtures), and three
  * exactly-matching application forms (scalar, HOF column chain, native
  * expression). */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def setOf(ps: String*) = {
    val s = new java.util.HashSet[String]()
    ps.foreach(s.add)
    s
  }

  test("encodeWord replays greedy longest-match-first with ## continuation") {
    val pieces = setOf("un", "##able", "u", "##n", "a", "##b", "##l", "##e")
    val maxMatch = 4 // "##able" consumes 4 chars
    // "unable": pos 0 tries 4→"unab"✗ 3→"una"✗ 2→"un"✓; pos 2 tries
    // 4→"##able"✓ — two pieces, sig = (0·31+2)·31 + 4 = 66
    assert(WordPiece.encodeWord("unable", pieces, maxMatch) == (2L, 66L, false))
    // single known char at word start
    assert(WordPiece.encodeWord("u", pieces, maxMatch) == (1L, 1L, false))
    // "nun": no piece matches at position 0 ("n" is only a continuation) →
    // the whole word is one [UNK]
    assert(WordPiece.encodeWord("nun", pieces, maxMatch) == (1L, 0L, true))
    // continuation dead-end mid-word: "ua" — "u"✓ then "##a" missing → UNK
    assert(WordPiece.encodeWord("ua", pieces, maxMatch) == (1L, 0L, true))
    // over-long word: [UNK] without scanning
    val long = "u" * (WordPiece.MaxWordChars + 1)
    assert(WordPiece.encodeWord(long, pieces, maxMatch) == (1L, 0L, true))
    // exactly MaxWordChars is INSIDE the contract ("u" then 62 UNK-free?
    // no — "##u" missing → UNK; use a segmentable word instead)
    val pieces2 = setOf("a", "##a")
    val atMax = "a" * WordPiece.MaxWordChars
    val (np, _, unk) = WordPiece.encodeWord(atMax, pieces2, 1)
    assert(np == WordPiece.MaxWordChars.toLong && !unk)
  }

  test("greedy is longest-match-FIRST, not cost-optimal") {
    // vocab holds "abc" and also "ab"+"##cd": on "abcd" greedy takes "abc"
    // then strands at "##d" (missing) → UNK, even though "ab"+"##cd" exists.
    // This pins the WordPiece (max-munch) semantics against any accidental
    // DP/Viterbi implementation drift toward UnigramLm.
    val pieces = setOf("abc", "ab", "##cd", "a", "##b", "##c")
    assert(WordPiece.encodeWord("abcd", pieces, 3) == (1L, 0L, true))
    // and where max-munch succeeds it still beats the shorter path:
    // "abc" → 1 piece, never "a"+"##b"+"##c"
    assert(WordPiece.encodeWord("abc", pieces, 3) == (1L, 3L, false))
  }

  test("training is deterministic; likelihood ties break lexicographically") {
    val dict = Seq(("the", 50L), ("there", 20L), ("then", 15L), ("other", 10L),
                   ("in", 40L), ("inner", 8L), ("zoo", 3L), ("ox", 2L))
    val m1 = WordPiece.train(dict, vocabSize = 40)
    val m2 = WordPiece.train(dict, vocabSize = 40)
    assert(m1 == m2, "same dictionary must train the same model")
    // alphabet coverage: every word-start char bare, every inner char ##'d
    val vs = m1.vocab.toSet
    dict.foreach { case (w, _) =>
      assert(vs.contains(w.substring(0, 1)), s"start char of '$w' missing")
      w.substring(1).foreach(c => assert(vs.contains("##" + c), s"##$c missing"))
    }
    // exact-tie determinism: score(a,##a) = 10/(11·10) vs score(a,##b) =
    // 1/(11·1) — equal by cross-multiplication; the lexicographically
    // smaller pair (a,##a) must merge first
    val tied = WordPiece.train(Seq(("aa", 10L), ("ab", 1L)), vocabSize = 5)
    assert(tied.vocab.contains("aa") && !tied.vocab.contains("ab"),
      s"tie must merge (a,##a) first: ${tied.vocab}")
  }

  test("likelihood scoring: rarer-parts pair beats higher-raw-count pair") {
    // pairs: (x,##y) count 5, (x,##z) count 100, (q,##z) count 40.
    // freq: x=105, ##y=5, ##z=140, q=40.
    // score(x,##y) = 5/(105·5) = 1/105  — the likelihood winner
    // score(x,##z) = 100/(105·140) ≈ 1/147
    // score(q,##z) = 40/(40·140)  = 1/140
    val dict = Seq(("xy", 5L), ("xz", 100L), ("qz", 40L))
    val m = WordPiece.train(dict, vocabSize = 5) // alphabet {x,q,##y,##z} + 1 merge
    assert(m.vocab.contains("xy") && !m.vocab.contains("xz"),
      s"first merge must be the likelihood winner: ${m.vocab}")
  }

  test("scalar, HOF chain, and native forms agree on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(120).cache()
    val model = WordPiece.learn(docs)
    val viaJoin = WordPiece.docTokenStats(docs, model)
      .select($"doc_id", $"n_pieces", $"n_unk", $"wp_sig")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    val st = graft.functions.NativeExprs.wordpieceStats($"text", model)
    val viaNative = docs.select($"doc_id",
        st.getField("n_pieces"), st.getField("n_unk"), st.getField("wp_sig"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    viaJoin.foreach { case (id, v) =>
      assert(viaNative(id) == v, s"native vs join diverge on doc $id")
    }
    (viaNative.keySet -- viaJoin.keySet).foreach { id =>
      assert(viaNative(id) == ((0L, 0L, 0L)), s"wordless doc $id must be zeros")
    }
    // scalar greedy spot-check against the HOF column form on raw words
    val words = docs.select(explode(graft.functions.TextAnalysis.words($"text")))
      .distinct().limit(200)
      .withColumn("e", WordPiece.wordpieceChain(col("col"), model))
      .select($"col", $"e.np", $"e.sig", $"e.unk")
      .as[(String, Long, Long, Boolean)].collect()
    words.foreach { case (w, np, sig, unk) =>
      assert(WordPiece.encodeWord(w, model.pieceSet, model.maxMatchLen) ==
        ((np, sig, unk)), s"scalar vs HOF on '$w'")
    }
    docs.unpersist()
  }

  test("oracle SQL embeds the vocabulary and unrolls the greedy walk") {
    val model = WordPiece.Model(Seq("##b", "a", "ab"), maxWordLen = 4)
    val sql = WordPiece.oracleTokenSql(model)
    assert(sql.contains("('##b')") && sql.contains("('ab')"))
    assert(sql.contains("s4 AS") && !sql.contains("s5 AS"))
    assert(sql.contains(s"% ${WordPiece.SigMod}"))
    // injection guard
    intercept[IllegalArgumentException] {
      WordPiece.oracleTokenSql(WordPiece.Model(Seq("a'b"), 3))
    }
  }
}
