package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search") — the memory-bound ANN lane:
  * a D-dim vector is split into M sub-vectors and each is replaced by the
  * index of its nearest sub-codebook centroid, so the corpus resides as
  * M bytes/vector instead of 4·D (32× at D=64, M=8). Scoring is ADC
  * (asymmetric distance computation): per query, an M×K lookup table of
  * query-subvector · centroid dot products; a vector's approximate score is
  * the sum of its M table entries.
  *
  * Determinism discipline (the `quantizedTopK` argument, extended): the
  * codebooks are a learned ingest-time artifact embedded into the DuckDB
  * oracle as literals; encoding is argmin over a FIXED-ORDER left-assoc
  * double chain (ties → lowest index), and the ADC table entries are
  * fixed-point (`floor(dot·2^scaleBits + 0.5)` as long, FAISS's int-LUT
  * trick) so the per-vector score is a SUM OF LONGS — exact under any
  * addition order, immune to the float-reassociation divergence a plain
  * double sum would have across engines.
  *
  * All loops ascend (sub-dimension, then centroid, then subspace) so the
  * IEEE operation sequence matches the generated oracle SQL's left-assoc
  * chains term for term.
  */
object PqExprs {
  /** Read an array<double> vector, optionally L2-NORMALIZED: PQ targets
    * COSINE here, so vectors are projected to the unit sphere before
    * encoding/ADC (dot on the sphere == cosine) — otherwise norm variance
    * pollutes the candidate cut. Pinned IEEE order: ascending squared sum,
    * one sqrt, element-wise divide (zero vector passes through), matching
    * the oracle's 64-term chain + list_transform. */
  def readVec(arr: ArrayData, n: Int, normalize: Boolean): Array[Double] = {
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    if (normalize) {
      var n2 = 0.0; i = 0
      while (i < n) { n2 = n2 + x(i) * x(i); i += 1 }
      if (n2 > 0.0) {
        val nrm = math.sqrt(n2); i = 0
        while (i < n) { x(i) = x(i) / nrm; i += 1 }
      }
    }
    x
  }

  /** Flatten codebooks [m][k][subDim] for serialization into expressions. */
  def flatten(cb: Array[Array[Array[Double]]]): (Array[Double], Int, Int, Int) = {
    val m = cb.length; val k = cb(0).length; val sd = cb(0)(0).length
    val flat = new Array[Double](m * k * sd)
    var i = 0
    for (mi <- 0 until m; ki <- 0 until k; d <- 0 until sd) {
      flat(i) = cb(mi)(ki)(d); i += 1
    }
    (flat, m, k, sd)
  }
}

/** vec (array<float|double>, length m·subDim) → array<int> of M codes:
  * code[m] = argmin_k Σ_d (x[m·sd+d] − c[m][k][d])², ties → lowest k. */
case class PqEncodeExpr(child: Expression, flat: Array[Double],
                        m: Int, k: Int, subDim: Int, normalize: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val x = PqExprs.readVec(arr, m * subDim, normalize)
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val off = (mi * k + ki) * subDim
        var d = 0.0; var j = 0
        while (j < subDim) { // left-assoc: matches the oracle's + chain
          val t = x(mi * subDim + j) - flat(off + j)
          d = d + t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = ki } // strict <: ties → lowest k
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** query vec → array<long> of M·K fixed-point ADC entries:
  * lut[m·K + k] = floor((Σ_d x[m·sd+d]·c[m][k][d]) · 2^scaleBits + 0.5). */
case class PqLutExpr(child: Expression, flat: Array[Double],
                     m: Int, k: Int, subDim: Int, scaleBits: Int,
                     normalize: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val scale = math.pow(2.0, scaleBits)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val x = PqExprs.readVec(arr, m * subDim, normalize)
    val lut = new Array[Any](m * k)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        val off = (mi * k + ki) * subDim
        var dot = 0.0; var j = 0
        while (j < subDim) { // left-assoc, as in the oracle chain
          dot = dot + x(mi * subDim + j) * flat(off + j)
          j += 1
        }
        lut(mi * k + ki) = math.floor(dot * scale + 0.5).toLong
        ki += 1
      }
      mi += 1
    }
    new GenericArrayData(lut)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** (codes array<int>, lut array<long>) → Σ_m lut[m·K + codes[m]] — the ADC
  * score; longs, so addition order is irrelevant. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0L; var mi = 0
    val m = codes.numElements()
    while (mi < m) {
      s += lut.getLong(mi * k + codes.getInt(mi))
      mi += 1
    }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
