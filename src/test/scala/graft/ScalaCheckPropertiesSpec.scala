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
}
