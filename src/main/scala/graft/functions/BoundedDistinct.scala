package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
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
  * Supports byte / short / int / long / string / date / timestamp keys
  * (the id shapes equality-bucketed pipelines carry) and STRUCTS of
  * those (the (id, sketch) pair shape LSH bucket builders carry —
  * NearDup.simhashPairs). Decimal/binary keys are not supported — map
  * them to a supported type (cast, xxhash64) before bucketing. Values sort by Spark semantics: UTF8String
  * binary order for strings, lexicographic field order with nulls first
  * for structs — so `bounded_distinct(x, k)` ==
  * `slice(array_sort(collect_set(x)), 1, k)` whenever the true distinct
  * count ≤ k (and the k smallest of that sorted set otherwise).
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

  private def isAtomic(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType
         | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case dt if isAtomic(dt) => TypeCheckResult.TypeCheckSuccess
    case st: StructType if st.fields.nonEmpty && st.fields.forall(f => isAtomic(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "bounded_distinct supports byte/short/int/long/string/date/timestamp " +
        s"keys or structs of them, got $other")
  }

  private def atomicOrdering(dt: DataType): Ordering[Any] = (dt match {
    case ByteType => Ordering.Byte
    case ShortType => Ordering.Short
    case IntegerType | DateType => Ordering.Int
    case LongType | TimestampType | TimestampNTZType => Ordering.Long
    case StringType => new Ordering[UTF8String] { def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b) }
  }).asInstanceOf[Ordering[Any]]

  @transient private lazy val ordering: Ordering[Any] = child.dataType match {
    case st: StructType =>
      // per-field PRIMITIVE comparators (getLong/getInt, no boxing, no
      // per-call DataType dispatch): the comparator runs O(log limit)
      // times per input row in the TreeSet hot path — an interpreted
      // `a.get(i, dt)` formulation measured ~5× slower end-to-end on
      // the simhash bucket builder (ScaleSmoke clone ramp)
      val cmps: Array[(InternalRow, InternalRow) => Int] =
        st.fields.zipWithIndex.map { case (f, i) =>
          val cmp: (InternalRow, InternalRow) => Int = f.dataType match {
            case ByteType => (a, b) => java.lang.Byte.compare(a.getByte(i), b.getByte(i))
            case ShortType => (a, b) => java.lang.Short.compare(a.getShort(i), b.getShort(i))
            case IntegerType | DateType => (a, b) => java.lang.Integer.compare(a.getInt(i), b.getInt(i))
            case LongType | TimestampType | TimestampNTZType =>
              (a, b) => java.lang.Long.compare(a.getLong(i), b.getLong(i))
            case StringType => (a, b) => a.getUTF8String(i).compareTo(b.getUTF8String(i))
          }
          (a: InternalRow, b: InternalRow) => {
            val an = a.isNullAt(i); val bn = b.isNullAt(i)
            if (an != bn) { if (an) -1 else 1 } // nulls first (Spark asc)
            else if (an) 0
            else cmp(a, b)
          }
        }
      new Ordering[Any] {
        def compare(x: Any, y: Any): Int = {
          val a = x.asInstanceOf[InternalRow]
          val b = y.asInstanceOf[InternalRow]
          var i = 0
          while (i < cmps.length) {
            val c = cmps(i)(a, b)
            if (c != 0) return c
            i += 1
          }
          0
        }
      }
    case dt => atomicOrdering(dt)
  }

  override def createAggregationBuffer(): java.util.TreeSet[Any] =
    new java.util.TreeSet[Any](ordering)

  /** Stored values must not alias evaluation buffers: an UnsafeRow (or a
    * UTF8String pointing into one) handed to `update` is overwritten by
    * the next input row.
    */
  private def copyOf(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case s: UTF8String => s.clone()
    case other => other
  }

  private def add(buf: java.util.TreeSet[Any], v: Any): Unit = {
    // admit-then-trim: never grows past limit entries
    if (buf.size < limit) { buf.add(copyOf(v)); () }
    else if (ordering.lt(v, buf.last)) { if (buf.add(copyOf(v))) buf.pollLast(); () }
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

  private def atomicBytes(dt: DataType, v: Any): Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType | DateType => 4
    case LongType | TimestampType | TimestampNTZType => 8
    case StringType => 4 + v.asInstanceOf[UTF8String].numBytes()
  }

  private def writeAtomic(bb: ByteBuffer, dt: DataType, v: Any): Unit = dt match {
    case ByteType => bb.put(v.asInstanceOf[Byte]); ()
    case ShortType => bb.putShort(v.asInstanceOf[Short]); ()
    case IntegerType | DateType => bb.putInt(v.asInstanceOf[Int]); ()
    case LongType | TimestampType | TimestampNTZType =>
      bb.putLong(v.asInstanceOf[Long]); ()
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      bb.putInt(b.length); bb.put(b); ()
  }

  private def readAtomic(bb: ByteBuffer, dt: DataType): Any = dt match {
    case ByteType => bb.get
    case ShortType => bb.getShort
    case IntegerType | DateType => bb.getInt
    case LongType | TimestampType | TimestampNTZType => bb.getLong
    case StringType =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      UTF8String.fromBytes(b)
  }

  override def serialize(buf: java.util.TreeSet[Any]): Array[Byte] = {
    child.dataType match {
      case st: StructType =>
        var total = 4
        val it0 = buf.iterator()
        while (it0.hasNext) {
          val r = it0.next().asInstanceOf[InternalRow]
          var i = 0
          while (i < st.fields.length) {
            total += 1 // null flag
            if (!r.isNullAt(i)) total += atomicBytes(st.fields(i).dataType, r.get(i, st.fields(i).dataType))
            i += 1
          }
        }
        val bb = ByteBuffer.allocate(total)
        bb.putInt(buf.size)
        val it = buf.iterator()
        while (it.hasNext) {
          val r = it.next().asInstanceOf[InternalRow]
          var i = 0
          while (i < st.fields.length) {
            if (r.isNullAt(i)) bb.put(0.toByte)
            else {
              bb.put(1.toByte)
              writeAtomic(bb, st.fields(i).dataType, r.get(i, st.fields(i).dataType))
            }
            i += 1
          }
        }
        bb.array()
      case dt =>
        var total = 4
        val it0 = buf.iterator()
        while (it0.hasNext) total += atomicBytes(dt, it0.next())
        val bb = ByteBuffer.allocate(total)
        bb.putInt(buf.size)
        val it = buf.iterator()
        while (it.hasNext) writeAtomic(bb, dt, it.next())
        bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    child.dataType match {
      case st: StructType =>
        while (i < n) {
          val values = new Array[Any](st.fields.length)
          var j = 0
          while (j < st.fields.length) {
            values(j) = if (bb.get() == 0) null else readAtomic(bb, st.fields(j).dataType)
            j += 1
          }
          buf.add(new GenericInternalRow(values))
          i += 1
        }
      case dt =>
        while (i < n) { buf.add(readAtomic(bb, dt)); i += 1 }
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
