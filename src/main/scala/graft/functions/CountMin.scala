package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan '05) — point
  * frequency estimates over unbounded key domains, completing the
  * persisted-state algebra next to distinct-count (HLL), quantiles (KLL),
  * heavy hitters (FI), set algebra (theta, bitmaps) and keyed maps:
  * the FI leg returns the top-k SET; this one answers "how often did THIS
  * key occur" for any key, from a fixed-size state.
  *
  * State is a depth×width counter matrix. Row j hashes with xxhash64 under
  * seed `j·φ⁻¹` — fully deterministic, so states are byte-stable across
  * batches, partitions and re-merges (counters are ADDITIVE: merge is
  * elementwise sum, and split-merge equals one-shot exactly, not just
  * approximately). Guarantees: estimates NEVER undercount; a point query
  * overcounts by more than e·N/width with probability ≤ e^−depth.
  *
  * Serialized layout: big-endian longs `[depth, width, row0…, row(d−1)…]`
  * — self-describing, so the estimate expression needs no config echo.
  */
object CountMin {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** Partial: per-group serialized CMS over an integral or string key. */
  def cmsState(c: Column, depth: Int = DefaultDepth,
               width: Int = DefaultWidth): Column =
    col(CmsStateAgg(expr(c), depth, width).toAggregateExpression())

  /** Merge persisted CMS states (elementwise counter sum) into one. */
  def cmsMergeState(state: Column): Column =
    col(CmsMergeAgg(expr(state)).toAggregateExpression())

  /** Point frequency estimate of `item` under `state` (min over rows). */
  def cmsEstimate(state: Column, item: Column): Column =
    col(CmsEstimateExpr(expr(state), expr(item)))

  /** Total insertions N recorded by the state (row sums are all N; row 0
    * is read) — the quantity the e·N/width error envelope scales with. */
  def cmsTotal(state: Column): Column = col(CmsTotalExpr(expr(state)))

  private[graft] def hashOf(v: Any, row: Int): Long = {
    val seed = row.toLong * 0x9E3779B97F4A7C15L
    v match {
      case l: java.lang.Long    => XXH64.hashLong(l.longValue, seed)
      case i: java.lang.Integer => XXH64.hashLong(i.longValue, seed)
      case s: java.lang.Short   => XXH64.hashLong(s.longValue, seed)
      case b: java.lang.Byte    => XXH64.hashLong(b.longValue, seed)
      case u: UTF8String =>
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
      case other => throw new IllegalArgumentException(
        s"cmsState needs an integral or string key, got ${other.getClass.getSimpleName}")
    }
  }

  private[graft] def slotOf(v: Any, row: Int, width: Int): Int = {
    val h = hashOf(v, row) % width
    (if (h < 0) h + width else h).toInt
  }

  private[graft] def serialize(m: CmsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (2 + m.counts.length))
    bb.putLong(m.depth.toLong).putLong(m.width.toLong)
    m.counts.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def deserialize(bytes: Array[Byte]): CmsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getLong.toInt
    val w = bb.getLong.toInt
    val counts = new Array[Long](d * w)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    CmsBuf(d, w, counts)
  }
}

/** Mutable CMS buffer: depth×width counters, row-major. */
case class CmsBuf(depth: Int, width: Int, counts: Array[Long]) {
  def add(v: Any): Unit = {
    var j = 0
    while (j < depth) {
      counts(j * width + CountMin.slotOf(v, j, width)) += 1L
      j += 1
    }
  }
  def mergeIn(o: CmsBuf): CmsBuf = {
    require(o.depth == depth && o.width == width,
      s"CMS layout mismatch: ${depth}x$width vs ${o.depth}x${o.width}")
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    this
  }
  def estimate(v: Any): Long = {
    // an EMPTY state (depth 0 — CmsMergeAgg over zero/all-null input) has
    // seen nothing: every frequency estimate is 0, not the fold seed
    // Long.MaxValue the public SQL surface would otherwise leak
    if (depth == 0) return 0L
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = counts(j * width + CountMin.slotOf(v, j, width))
      if (c < best) best = c
      j += 1
    }
    best
  }
  def total: Long = {
    var n = 0L
    var i = 0
    while (i < width) { n += counts(i); i += 1 }
    n
  }
}

/** CMS build aggregate: keys in, serialized counter matrix out. Nulls are
  * skipped (a null key has no frequency); unsupported types fail loudly. */
case class CmsStateAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuf] with UnaryLike[Expression] {
  require(depth > 0 && width > 0, s"need positive depth/width, got ${depth}x$width")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsBuf =
    CmsBuf(depth, width, new Array[Long](depth * width))

  override def update(buf: CmsBuf, input: InternalRow): CmsBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v)
    buf
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = a.mergeIn(b)
  override def eval(buf: CmsBuf): Any = CountMin.serialize(buf)
  override def serialize(buf: CmsBuf): Array[Byte] = CountMin.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CmsBuf = CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsStateAgg =
    copy(child = c)
}

/** CMS re-merge aggregate: serialized states in, elementwise-summed state
  * out. The first state seen fixes the layout; mismatches fail loudly. */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuf] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // empty sentinel; replaced by the first real state's layout
  override def createAggregationBuffer(): CmsBuf = CmsBuf(0, 0, Array.empty)

  private def fold(buf: CmsBuf, o: CmsBuf): CmsBuf =
    if (buf.depth == 0) o
    else if (o.depth == 0) buf
    else buf.mergeIn(o)

  override def update(buf: CmsBuf, input: InternalRow): CmsBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, CountMin.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = fold(a, b)
  override def eval(buf: CmsBuf): Any = CountMin.serialize(buf)
  override def serialize(buf: CmsBuf): Array[Byte] = CountMin.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CmsBuf = CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
}

/** Point estimate: min counter across rows for the item's slots. */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(state: Any, item: Any): Any =
    CountMin.deserialize(state.asInstanceOf[Array[Byte]]).estimate(item)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Total insertions recorded by a state (sum of row 0). */
case class CmsTotalExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(state: Any): Any =
    CountMin.deserialize(state.asInstanceOf[Array[Byte]]).total
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
