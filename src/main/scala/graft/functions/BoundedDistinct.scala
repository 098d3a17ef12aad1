package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-set aggregate with a STRUCTURAL state bound.
  *
  * `collect_set` accumulates every distinct value before any downstream
  * `slice` can cap the result — a key shared by 50M rows (a boilerplate
  * n-gram in a web corpus: license headers, blank-line normalization
  * artifacts) builds a ~400MB single-key aggregation buffer and a skewed
  * straggler. This aggregate keeps only the `limit` SMALLEST distinct
  * values (by the type's Spark sort order) at every moment — update,
  * partial serialize, and merge all carry ≤ `limit` entries, so peak
  * aggregation state per key is O(limit) regardless of how many rows
  * share the key.
  *
  * Keep-smallest is a mergeable bounded summary (Agarwal et al. PODS'12
  * sense): union of two capped sets re-capped = cap of the union. With
  * `limit = maxWanted + 1`, an output of size `limit` is an exact proof
  * that the true distinct count exceeds `maxWanted` — callers that drop
  * over-cap keys (bucket builders capping membership) detect overflow
  * exactly, never probabilistically.
  *
  * Supports int / long / string keys (doc-id shapes). Values sort by
  * Spark semantics (UTF8String binary order for strings), so
  * `bounded_distinct(id, k)` == `slice(array_sort(collect_set(id)), 1, k)`
  * whenever the true distinct count ≤ k.
  */
case class BoundedDistinctSet(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Any]] {

  require(limit > 0, s"bounded_distinct limit must be positive, got $limit")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_distinct supports int/long/string keys, got $other")
  }

  @transient private lazy val ordering: Ordering[Any] = (child.dataType match {
    case IntegerType => Ordering.Int
    case LongType => Ordering.Long
    case StringType => new Ordering[UTF8String] { def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b) }
  }).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): java.util.TreeSet[Any] =
    new java.util.TreeSet[Any](ordering)

  private def add(buf: java.util.TreeSet[Any], v: Any): Unit = {
    // admit-then-trim: never grows past limit entries
    if (buf.size < limit) { buf.add(v); () }
    else if (ordering.lt(v, buf.last)) { if (buf.add(v)) buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[Any], input: InternalRow): java.util.TreeSet[Any] = {
    val v = child.eval(input)
    if (v != null) add(buf, v)
    buf
  }

  override def merge(buf: java.util.TreeSet[Any], other: java.util.TreeSet[Any]): java.util.TreeSet[Any] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Any]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Any]): Array[Byte] = child.dataType match {
    case IntegerType =>
      val bb = ByteBuffer.allocate(4 + buf.size * 4)
      bb.putInt(buf.size)
      val it = buf.iterator(); while (it.hasNext) bb.putInt(it.next().asInstanceOf[Int])
      bb.array()
    case LongType =>
      val bb = ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      val it = buf.iterator(); while (it.hasNext) bb.putLong(it.next().asInstanceOf[Long])
      bb.array()
    case StringType =>
      var total = 4
      val it0 = buf.iterator()
      while (it0.hasNext) total += 4 + it0.next().asInstanceOf[UTF8String].numBytes()
      val bb = ByteBuffer.allocate(total)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val b = it.next().asInstanceOf[UTF8String].getBytes
        bb.putInt(b.length); bb.put(b)
      }
      bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    child.dataType match {
      case IntegerType => while (i < n) { buf.add(bb.getInt); i += 1 }
      case LongType => while (i < n) { buf.add(bb.getLong); i += 1 }
      case StringType => while (i < n) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.add(UTF8String.fromBytes(b))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedDistinctSet =
    copy(child = newChildren.head)
  override def prettyName: String = "bounded_distinct"
}

object BoundedDistinct {
  /** Sorted array of the `limit` smallest distinct values of `c`, with
    * aggregation state capped at `limit` entries at every stage. Result
    * size == `limit` ⟺ the true distinct count is ≥ `limit` (exact
    * overflow witness when called with `limit = wanted + 1`).
    */
  def boundedDistinct(c: Column, limit: Int): Column =
    exprs.toColumn(BoundedDistinctSet(exprs.toExpr(c), limit).toAggregateExpression())
}
