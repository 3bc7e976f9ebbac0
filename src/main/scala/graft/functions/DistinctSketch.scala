package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
 * DISTINCT 64-bit hash values seen, in UNSIGNED hash order — the classic
 * bottom-k estimator (Bar-Yossef et al.): with the hash space scaled to
 * [0, 1), the k-th smallest value `frac` estimates distinct count as
 * `(k-1)/frac`; fewer than k values means the sketch holds the whole
 * distinct set and the count is exact.
 *
 * This is the approximate-distinct shape for 100 TB: state is k longs per
 * group regardless of group size, partials combine map-side (merge = keep
 * the k smallest of the union), and the relative error is ~1/√(k−2),
 * independent of the data. Unlike HLL the sketch value itself is
 * reproducible anywhere the hash is — pair it with an FNV/xxhash element
 * hash and the estimate is an exact, engine-independent function of the
 * input set (which is what makes it oracle-checkable in SQL).
 *
 * State is a sorted set of SIGN-FLIPPED hashes (h ^ Long.MinValue), so
 * Java's signed ordering realizes unsigned hash order; `eval` unflips and
 * emits the values ascending-unsigned as `array<long>`.
 */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"KMV needs k > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    // reject values beyond the current k-th up front: after warm-up,
    // almost every row is a no-op membership check against `last`
    if (buf.size() < k || flipped < buf.last()) {
      buf.add(flipped)
      if (buf.size() > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next() ^ Long.MinValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 8)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
