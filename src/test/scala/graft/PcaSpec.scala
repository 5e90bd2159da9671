package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pca, Similarity}

/** Embedding PCA: exact integer moments vs a driver brute force, Jacobi
  * eigensolver sanity (orthonormal V, analytic 2×2 eigenvalues), bit-level
  * retrain determinism, pinned projection chain, and the reduced-dim ANN
  * lane's recall against full-width brute force. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("moment pass equals a driver-side exact accumulation") {
    val (n, s1, g) = Pca.moments(emb, 64)
    val vecs = emb.select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect()
    assert(n == vecs.length)
    val scale = (1L << Pca.ScaleBits).toDouble
    val z = vecs.map(_.map(x => math.floor(x * scale + 0.5).toLong).toArray)
    (0 until 64).foreach { p =>
      assert(s1(p) == z.map(v => BigInt(v(p))).sum, s"S($p)")
    }
    // spot-check a band of second moments (full 2080 would be slow-ish)
    for (p <- 0 until 8; q <- p until 8) {
      assert(g(p)(q) == z.map(v => BigInt(v(p)) * BigInt(v(q))).sum, s"G($p,$q)")
    }
  }

  test("jacobi: analytic 2x2 eigenvalues, orthonormal eigenvectors") {
    val (vals, v) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // V columns orthonormal
    val dot01 = v(0)(0) * v(0)(1) + v(1)(0) * v(1)(1)
    val n0 = v(0)(0) * v(0)(0) + v(1)(0) * v(1)(0)
    assert(math.abs(dot01) < 1e-12 && math.abs(n0 - 1.0) < 1e-12)
    // larger random symmetric: V^T V = I and A V ≈ V diag
    val rnd = new scala.util.Random(7)
    val m = 16
    val a = Array.tabulate(m, m)((_, _) => 0.0)
    for (i <- 0 until m; j <- i until m) {
      val x = rnd.nextGaussian(); a(i)(j) = x; a(j)(i) = x
    }
    val (ev, vv) = Pca.jacobiEigen(a)
    for (c1 <- 0 until m; c2 <- c1 until m) {
      val d = (0 until m).map(i => vv(i)(c1) * vv(i)(c2)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-10, s"V not orthonormal at ($c1,$c2)")
    }
    for (c <- 0 until m; i <- 0 until m) {
      val av = (0 until m).map(j => a(i)(j) * vv(j)(c)).sum
      assert(math.abs(av - ev(c) * vv(i)(c)) < 1e-8, s"A v != λ v at ($i,$c)")
    }
  }

  test("retraining is bit-deterministic") {
    val m1 = Pca.train(emb.repartition(7), 64, 8)
    val m2 = Pca.train(emb.repartition(3), 64, 8)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.comps.map(_.toSeq).toSeq == m2.comps.map(_.toSeq).toSeq)
    assert(m1.eigvals.toSeq == m2.eigvals.toSeq)
    // components are descending-variance and unit-norm
    assert(m1.eigvals.toSeq == m1.eigvals.sortBy(-_).toSeq)
    m1.comps.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-10)
    }
  }

  test("projection column equals the driver-side pinned fold") {
    val model = Pca.train(emb, 64, 8)
    val got = Pca.projectAll(emb.filter($"vec_id" < 5), model)
      .orderBy("vec_id", "comp")
      .as[(Long, Long, Double)].collect()
    val vecs = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    got.foreach { case (id, c, p) =>
      val v = vecs(id)
      var acc = model.comps(c.toInt)(0) * (v(0) - model.mean(0))
      var j = 1
      while (j < 64) {
        acc = acc + model.comps(c.toInt)(j) * (v(j) - model.mean(j))
        j += 1
      }
      assert(acc == p, s"proj($id,$c): $acc vs $p")
    }
  }

  test("reduced-dim ANN lane: deterministic contract, high recall vs brute") {
    // contract parameters (r=32, candK=160): the synthetic spectrum is
    // flat, so r=dim/2 is what holds recall — see the PcaR note in
    // SparkEntry; measured 1.000 here, 0.925 at sf0.1 (RecallCheck lane)
    val model = Pca.train(emb, 64, 32)
    val q = emb.filter($"vec_id" < 8)
    val got = Pca.pcaTopK(emb, q, k = 5, candK = 160, model)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got.size == brute.size)
    val recall = got.map(t => (t._1, t._3)).intersect(brute.map(t => (t._1, t._3)))
      .size.toDouble / brute.size
    info(f"pca ann recall@5 = $recall%.3f")
    assert(recall >= 0.95, f"recall $recall%.3f below gate")
    // candK = corpus ⇒ the prescreen is a no-op and the lane IS brute force
    val full = Pca.pcaTopK(emb, q, k = 5, candK = 1000000, model)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(full == brute)
  }
}
