package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, score every row, per-query top-k via window.
  *    O(|corpus|·|queries|·d) work but ZERO shuffle of the corpus (queries are
  *    broadcast; the only exchange is the final per-query top-k, which is
  *    k·|queries| rows). The correct baseline, and the verifier for the
  *    approximate path.
  *  - [[srpBucketedTopK]]: signed-random-projection (hyperplane) LSH — each
  *    vector gets a `nBits`-bit signature; candidates = same-bucket pairs
  *    (multi-probe: exact bucket plus all 1-bit flips), then exact cosine on
  *    candidates only. Sub-linear candidate sets at 100 TB; recall tunable by
  *    nBits / probes.
  *
  * Distance math is `zip_with` + `aggregate` over the array columns in double
  * precision — per-row projection, no UDF.
  */
object Similarity {

  /** Dot product of two array<float|double> columns, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 where either vector is all-zero). */
  def cosine(a: Column, b: Column): Column =
    coalesce(dot(a, b) / nullif(norm(a) * norm(b), lit(0.0)), lit(0.0))

  /** Exact top-k nearest neighbours by cosine for each query vector.
    * `queries` must be small (it is broadcast). Self-matches (same id) are
    * excluded. Ties broken by neighbour id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: `nBits` unit-free direction
    * vectors of dimension `dim`, from a fixed-seed PRNG (gaussian). */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** SRP-LSH signature: bit j = (v · h_j) >= 0. Integer bucket id. */
  def srpSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    val bits = planes.zipWithIndex.map { case (h, j) =>
      val proj = dot(vec, array(h.map(lit): _*))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: SRP bucket join with 1-bit multi-probe, exact cosine
    * re-rank on candidates. May return fewer than k when a bucket is sparse —
    * that is the approximate contract; raise probes/lower nBits for recall.
    */
  def srpBucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                      nBits: Int = 8, idCol: String = "vec_id",
                      vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val sig = srpSignature(col(vecCol), nBits, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
                          sig.as("bucket"))
    // multi-probe: query probes its own bucket and every 1-bit neighbour
    val probes = array((lit(0L) +: (0 until nBits).map(j => lit(1L << j))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
                           sig.as("q_sig"))
      .withColumn("bucket", explode(transform(probes, m => col("q_sig").bitwiseXOR(m))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine >= threshold,
    * found via SRP buckets (no O(n²) scan), verified exactly. */
  def embeddingNearDuplicates(corpus: DataFrame, threshold: Double, dim: Int,
                              nBits: Int = 8, idCol: String = "vec_id",
                              vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val sig = srpSignature(col(vecCol), nBits, dim, seed)
    val withSig = corpus.select(col(idCol), col(vecCol), sig.as("bucket"))
    val a = withSig.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = withSig.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
