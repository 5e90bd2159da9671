package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Specs for the logistic-regression quality filter. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("training separates a linearly separable fixture perfectly") {
    // long stopword-rich docs labeled 1, short stopword-free docs labeled 0
    val good = (1 to 40).map(i =>
      (i.toLong, Seq.fill(60)("the quick fox is in a den").mkString(" "), 1))
    val bad = (41 to 80).map(i =>
      (i.toLong, Seq.fill(4)("zxq wvu ponm").mkString(" "), 0))
    val df = (good ++ bad).toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(df, col("y") === 1, iters = 50, lr = 1.0)
    val out = QualityClassifier.score(df, w)
      .select(col("doc_id"), col("pass")).as[(Long, Boolean)].collect().toMap
    good.foreach { case (id, _, _) => assert(out(id), s"doc $id should pass") }
    bad.foreach { case (id, _, _) => assert(!out(id), s"doc $id should fail") }
  }

  test("learned weights are invariant to input partitioning") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w1 = QualityClassifier.train(docs.repartition(13), col("n_chars") >= 300,
                                     iters = 10)
    val w2 = QualityClassifier.train(docs.repartition(2).sortWithinPartitions(col("doc_id").desc),
                                     col("n_chars") >= 300, iters = 10)
    assert(w1.toSeq === w2.toSeq,
      "decimal gradient sums must make training partitioning-independent")
  }

  test("training follows the reference driver-side gradient descent") {
    // tiny fixture replayed in plain Scala with the same feature definitions
    val docs = Seq(
      (1L, "the cat is in a hat and it is flat", 1),
      (2L, "zz yy xx ww", 0),
      (3L, "it is a thing that you see in the door and the floor", 1),
      (4L, "qqq rrr sss ttt uuu", 0)
    ).toDF("doc_id", "text", "y")
    val stop = graft.functions.TextAnalysis.Stopwords("en").toSet
    def feats(text: String): Array[Double] = {
      val ws = "[a-z]+".r.findAllIn(text.toLowerCase).toArray
      val nw = ws.length.toDouble
      val swl = ws.map(_.length).sum.toDouble
      val nstop = ws.count(stop).toDouble
      val np = text.count(c => (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
                               (c >= '[' && c <= '`') || (c >= '{' && c <= '~')).toDouble
      Array(1.0, nw / 100.0, if (nw == 0) 0.0 else nstop / nw,
            (if (nw == 0) 0.0 else swl / nw) / 10.0,
            if (text.isEmpty) 0.0 else np / text.length)
    }
    val rows = docs.select("text", "y").as[(String, Int)].collect()
      .map { case (t, y) => (feats(t), y.toDouble) }
    val iters = 25; val lr = 1.0; val k = 5
    val w = Array.fill(k)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(k)(BigDecimal(0))
      rows.foreach { case (x, y) =>
        val z = x.zip(w).map { case (xi, wi) => xi * wi }
          .foldLeft(0.0)(_ + _)
        val err = sigmoid(z) - y
        (0 until k).foreach(i =>
          g(i) += BigDecimal(err * x(i)).setScale(18, BigDecimal.RoundingMode.HALF_EVEN))
      }
      (0 until k).foreach(i => w(i) -= lr * g(i).toDouble / rows.length)
    }
    val got = QualityClassifier.train(docs, col("y") === 1, iters, lr)
    got.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-12, s"weight $i: engine $a vs reference $b")
    }
  }
}
