package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashRef

/** ScalaCheck property tests over the pure (driver-side) kernels — SURVEY §5
  * strategy point 2. These run without a SparkSession: the same byte-exact
  * code the Catalyst expressions execute (parity-asserted in
  * NativeExprParitySpec) is probed here across generated inputs.
  */
class ScalaCheckPropertiesSpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
      1 -> Gen.oneOf('.', ',', '!', '\t', '\n'))).map(_.mkString)

  test("minhash signature: identical texts ⇒ identical signatures") {
    check("identity")(Prop.forAll(asciiText) { t =>
      MinHashRef.signature(t, 5, 64, 42L).toSeq ==
        MinHashRef.signature(t, 5, 64, 42L).toSeq
    })
  }

  test("minhash signature: extending a document can only lower slot minima") {
    // grams(a) ⊆ grams(a ++ x) whenever a.length ≥ k, so every signature slot
    // of the extended document is ≤ the original's (min over a superset)
    check("union-min")(Prop.forAll(asciiText, asciiText) { (a, b) =>
      a.length < 5 || {
        val sa = MinHashRef.signature(a, 5, 64, 42L)
        val su = MinHashRef.signature(a + b, 5, 64, 42L)
        su.zip(sa).forall { case (u, x) => u <= x }
      }
    })
  }

  test("jaccard estimate from signatures tracks exact jaccard") {
    val wordGen = Gen.listOfN(30, Gen.oneOf(
      "spark", "scala", "query", "table", "join", "filter", "group", "sort",
      "merge", "batch", "stream", "window")).map(_.mkString(" "))
    check("estimate")(Prop.forAll(wordGen, wordGen) { (a, b) =>
      val sa = MinHashRef.signature(a, 5, 128, 42L)
      val sb = MinHashRef.signature(b, 5, 128, 42L)
      val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
      val ga = a.sliding(5).toSet; val gb = b.sliding(5).toSet
      val exact = ga.intersect(gb).size.toDouble / math.max(ga.union(gb).size, 1)
      math.abs(est - exact) < 0.35 // 128 hashes ⇒ σ≈0.044; 0.35 ≈ 8σ hard bound
    })
  }

  test("densification-free slots: signature values are strictly below MaxValue") {
    check("filled")(Prop.forAll(asciiText.suchThat(_.nonEmpty)) { t =>
      MinHashRef.signature(t, 5, 32, 42L).forall(_ != Long.MaxValue)
    })
  }

  // pure mirror of Ranks.ntileExact's integer bucket formula
  private def ntileBucket(r: Long, n: Long, k: Long): Long = {
    val q = n / k; val rem = n % k
    if (q == 0) r
    else if (r <= rem * (q + 1)) (r - 1) / (q + 1) + 1
    else rem + (r - 1 - rem * (q + 1)) / q + 1
  }

  test("ntile formula: SQL bucket-size law for any (n, k)") {
    val nk = for (n <- Gen.choose(1L, 5000L); k <- Gen.choose(1L, 64L)) yield (n, k)
    check("ntile")(Prop.forAll(nk) { case (n, k) =>
      val buckets = (1L to n).map(ntileBucket(_, n, k))
      val sizes = buckets.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val kEff = math.min(n, k)
      // non-decreasing assignment, exactly min(n,k) buckets, sizes differ ≤ 1,
      // and the first n%k buckets carry the extra row — the SQL ntile law
      buckets.zip(buckets.tail).forall { case (a, b) => a <= b } &&
        sizes.keySet == (1L to kEff).toSet &&
        (sizes.values.max - sizes.values.min) <= 1 &&
        (n % k == 0 || (1L to n % k).forall(b => sizes(b) == n / k + 1))
    })
  }

  // pure mirror of Layout.zvalue for two dimensions
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("z-order: bijective within range and box-prefix locality") {
    val xy = for (x <- Gen.choose(0L, 1023L); y <- Gen.choose(0L, 1023L)) yield (x, y)
    check("bijective")(Prop.forAll(xy, xy) { case ((x1, y1), (x2, y2)) =>
      (morton(x1, y1, 10) == morton(x2, y2, 10)) == (x1 == x2 && y1 == y2)
    })
    // points inside the same 2^k-aligned box share the z-value high bits —
    // the property row-group min/max skipping exploits
    check("locality")(Prop.forAll(xy, Gen.choose(1, 8)) { case ((x, y), k) =>
      val (bx, by) = (x >> k, y >> k)
      val zLo = morton(bx << k, by << k, 10)
      val z = morton(x, y, 10)
      (z >> (2 * k)) == (zLo >> (2 * k))
    })
  }

  test("unigram viterbi: brute-force optimality and structural bounds on random vocabs") {
    import graft.operators.UnigramLm
    val word = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.listOf(Gen.zip(
        Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
        Gen.choose(1L, 500000L)))
      .map(ps => ps.toMap.toSeq) // dedup pieces
    def cm(ps: Seq[(String, Long)]) = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      ps.foreach { case (p, c) => m.put(p, c) }
      // singles always present (the trained-model invariant)
      Seq("a", "b", "c").foreach(s => if (!m.containsKey(s)) m.put(s, 600000L))
      m
    }
    def brute(w: String, m: java.util.HashMap[String, java.lang.Long]): Long = {
      def go(s: String): Seq[(Long, Int)] =
        if (s.isEmpty) Seq((0L, 0))
        else (1 to math.min(UnigramLm.MaxPieceLen, s.length)).flatMap { l =>
          val c = m.get(s.take(l))
          if (c == null && l > 1) Seq.empty
          else {
            val pc = if (c != null) c.longValue() else UnigramLm.UnkCost
            go(s.drop(l)).map { case (cc, nn) => (cc + pc, nn + 1) }
          }
        }
      go(w).map { case (c, n) => c * UnigramLm.KeyMul + n }.min
    }
    check("optimal")(Prop.forAll(word, vocabGen) { (w, ps) =>
      val m = cm(ps)
      UnigramLm.viterbiKey(w, m) == brute(w, m)
    })
    check("bounds")(Prop.forAll(word, vocabGen) { (w, ps) =>
      val m = cm(ps)
      val key = UnigramLm.viterbiKey(w, m)
      val n = key % UnigramLm.KeyMul
      n >= 1 && n <= w.length // between one piece and per-char
    })
    // enriching the vocabulary can never worsen the optimum
    check("monotone")(Prop.forAll(word, vocabGen, word) { (w, ps, extra) =>
      val base = cm(ps)
      val richer = new java.util.HashMap[String, java.lang.Long](base)
      if (extra.length <= UnigramLm.MaxPieceLen) {
        val prev = richer.get(extra)
        if (prev == null || prev.longValue() > 1L) richer.put(extra, 1L) // cost 1 ≈ free
      }
      UnigramLm.viterbiKey(w, richer) <= UnigramLm.viterbiKey(w, base)
    })
  }

  test("wordpiece greedy: independent-walk replay on random vocabs") {
    import graft.operators.WordPiece
    val word = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.listOf(Gen.zip(
        Gen.oneOf(true, false),
        Gen.choose(1, 4).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))))
      .map(_.map { case (cont, p) => if (cont) "##" + p else p }.distinct)
    def setOf(v: Seq[String]) = {
      val s = new java.util.HashSet[String]()
      v.foreach(s.add)
      s
    }
    def maxMatch(v: Seq[String]) =
      if (v.isEmpty) 1
      else v.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    // independent recursive max-munch (no shared code with encodeWord)
    def brute(w: String, v: Set[String]): (Long, Long, Boolean) = {
      def go(pos: Int, np: Long, sig: Long): (Long, Long, Boolean) =
        if (pos >= w.length) (np, sig, false)
        else {
          val ls = (1 to (w.length - pos)).filter { l =>
            v.contains((if (pos == 0) "" else "##") + w.substring(pos, pos + l))
          }
          if (ls.isEmpty) (1L, 0L, true)
          else {
            val l = ls.max
            go(pos + l, np + 1, (sig * 31 + l) % WordPiece.SigMod)
          }
        }
      go(0, 0L, 0L)
    }
    check("replay")(Prop.forAll(word, vocabGen) { (w, v) =>
      WordPiece.encodeWord(w, setOf(v), maxMatch(v)) == brute(w, v.toSet)
    })
    check("bounds")(Prop.forAll(word, vocabGen) { (w, v) =>
      val (np, sig, unk) = WordPiece.encodeWord(w, setOf(v), maxMatch(v))
      if (unk) np == 1L && sig == 0L else np >= 1L && np <= w.length.toLong
    })
  }

  test("stub codec: deterministic, typed, and bounded metadata") {
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check("codec")(Prop.forAll(bytesGen) { bytes =>
      val m1 = graft.operators.Multimodal.StubCodec.decode(bytes)
      val m2 = graft.operators.Multimodal.StubCodec.decode(bytes)
      m1 == m2 &&
        graft.operators.Multimodal.StubCodec.Formats.contains(m1.format) &&
        m1.width >= 64 && m1.width < 64 + 1024 &&
        m1.height >= 64 && m1.height < 64 + 1024 &&
        m1.n_frames >= 1 && m1.n_frames <= 256
    })
  }
}
