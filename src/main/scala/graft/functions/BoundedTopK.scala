package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable aggregation buffer for [[BoundedTopKMultiset]]: the `limit`
  * largest values seen so far WITH multiplicity, as value → copy-count
  * entries plus the running total copy count (≤ limit at all times).
  */
final class TopKMultisetBuffer {
  val entries = new java.util.TreeMap[java.lang.Double, Long]()
  var total: Long = 0L
}

/** Top-k multiset aggregate with a STRUCTURAL state bound.
  *
  * `slice(sort_array(collect_list(v), desc), 1, k)` caps only the
  * OUTPUT: `collect_list`'s buffer first accumulates every row of the
  * key, so a hot key with 50M rows builds a ~400MB single-key buffer
  * and a straggler before the slice runs (the same failure mode
  * [[BoundedDistinctSet]] removes for distinct sets). This aggregate
  * keeps only the `limit` LARGEST copies (values with multiplicity) at
  * every moment — update, partial serialize, and merge all carry
  * ≤ `limit` copies, so peak aggregation state per key is O(limit)
  * regardless of the key's row count.
  *
  * Keep-largest-with-multiplicity is mergeable in the Agarwal et al.
  * PODS'12 sense: the k largest copies of A ⊎ B are among (k largest
  * of A) ⊎ (k largest of B), so re-capping the union of two capped
  * buffers equals capping the union — map-side partials stay exact.
  *
  * `weight` (default 1) counts each input row as that many copies —
  * the incremental-maintenance fold aggregates pre-counted
  * (value, net-copies) rows, and the weighted path caps state at
  * `limit` copies instead of materializing `array_repeat(v, net)`.
  * Null values and non-positive weights are ignored.
  *
  * Doubles order by `java.lang.Double.compare` — the same total order
  * (NaN greatest) Spark's `sort_array` uses, so under the cap
  * `bounded_topk(v, k)` == `slice(sort_array(collect_list(v), desc), 1, k)`.
  */
case class BoundedTopKMultiset(
    value: Expression,
    weight: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMultisetBuffer] {

  require(limit > 0, s"bounded_topk limit must be positive, got $limit")

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (value.dataType, weight.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_topk expects (double, bigint), got $other")
  }

  override def createAggregationBuffer(): TopKMultisetBuffer = new TopKMultisetBuffer

  /** Admit `c` copies of `v`, displacing smaller copies once full; never
    * lets the buffer exceed `limit` total copies.
    */
  private def add(buf: TopKMultisetBuffer, v: Double, c0: Long): Unit = {
    var c = c0
    val space = limit - buf.total
    if (space > 0) {
      val m = math.min(c, space)
      buf.entries.merge(v, m, (a, b) => a + b)
      buf.total += m
      c -= m
    }
    while (c > 0) {
      val smallest = buf.entries.firstKey()
      if (java.lang.Double.compare(v, smallest) <= 0) return
      val have = buf.entries.get(smallest)
      val m = math.min(c, have)
      if (m == have) buf.entries.remove(smallest)
      else buf.entries.put(smallest, have - m)
      buf.entries.merge(v, m, (a, b) => a + b)
      c -= m
    }
  }

  override def update(buf: TopKMultisetBuffer, input: InternalRow): TopKMultisetBuffer = {
    val v = value.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null && w.asInstanceOf[Long] > 0L)
        add(buf, v.asInstanceOf[Double], w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKMultisetBuffer, other: TopKMultisetBuffer): TopKMultisetBuffer = {
    val it = other.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  /** Descending array of the kept copies (length == min(limit, copies seen)). */
  override def eval(buf: TopKMultisetBuffer): Any = {
    val out = new Array[Any](buf.total.toInt)
    var i = 0
    val it = buf.entries.descendingMap().entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey.doubleValue(); i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKMultisetBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.entries.size() * 16)
    bb.putInt(buf.entries.size())
    val it = buf.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.getKey.doubleValue())
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKMultisetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val v = bb.getDouble
      val c = bb.getLong
      buf.entries.put(v, c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKMultiset =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKMultiset =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopKMultiset =
    copy(value = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "bounded_topk"
}

object BoundedTopK {
  /** The `k` largest values of `v` (double) with multiplicity, sorted
    * descending, with aggregation state capped at `k` copies at every
    * stage — the bounded replacement for
    * `slice(sort_array(collect_list(v), desc), 1, k)`.
    */
  def topKDesc(v: Column, k: Int): Column =
    exprs.toColumn(BoundedTopKMultiset(exprs.toExpr(v),
      Literal(1L), k).toAggregateExpression())

  /** Weighted variant: each row contributes `weight` copies of `v`
    * (pre-counted multiset rows, e.g. a CDC fold's per-value net
    * counts). State stays capped at `k` copies — no
    * `array_repeat(v, weight)` materialization.
    */
  def topKDescWeighted(v: Column, weight: Column, k: Int): Column =
    exprs.toColumn(BoundedTopKMultiset(exprs.toExpr(v),
      exprs.toExpr(weight), k).toAggregateExpression())
}
