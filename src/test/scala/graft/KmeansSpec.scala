package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Distributed fixed-round Lloyd's k-means ([[Similarity.kmeansTrain]]):
  * the contract is DETERMINISM (same corpus → bit-identical centroids,
  * every round) and assignment == brute argmax-cosine — the properties the
  * embedded-literal oracle of `kmeans_assign` relies on. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir).cache()

  test("retrain is bit-identical (fixed rounds, exact means, pinned init)") {
    val a = Similarity.kmeansTrain(emb, k = 4, iters = 3)
    val b = Similarity.kmeansTrain(emb, k = 4, iters = 3)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ca, cb) =>
      assert(java.util.Arrays.equals(ca, cb), "centroid drift across retrains")
    }
  }

  test("round count changes the model (EM actually moves the centroids)") {
    val a = Similarity.kmeansTrain(emb, k = 4, iters = 1)
    val b = Similarity.kmeansTrain(emb, k = 4, iters = 3)
    assert(a.zip(b).exists { case (ca, cb) => !java.util.Arrays.equals(ca, cb) },
           "3 Lloyd rounds produced the round-1 centroids — update inert")
  }

  test("assignment == brute argmax-cosine with lowest-index ties") {
    val cents = Similarity.kmeansTrain(emb, k = 4, iters = 2)
    val best = Similarity.kmeansArgmax(col("embedding"), cents)
    val got = emb.select($"vec_id", best.getField("i").cast("int").as("l"),
                         $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    assert(got.map(_._2).distinct.length > 1, "degenerate single-cluster fit")
    got.foreach { case (id, label, v) =>
      // brute reference: same left-assoc dot/norm loops as CosineSimExpr
      def cos(c: Array[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < c.length) {
          val x = v(i).toDouble
          dot += x * c(i); nx += x * x; ny += c(i) * c(i); i += 1
        }
        val den = math.sqrt(nx) * math.sqrt(ny)
        if (den == 0.0) 0.0 else dot / den
      }
      var bi = 0; var bc = cos(cents(0)); var k = 1
      while (k < cents.length) {
        val c = cos(cents(k)); if (c > bc) { bc = c; bi = k }; k += 1
      }
      assert(label == bi, s"vec $id: engine label $label, brute argmax $bi")
    }
  }
}
