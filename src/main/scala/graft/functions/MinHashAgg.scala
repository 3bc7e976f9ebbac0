package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * MinHash sketch as a custom aggregate (SURVEY.md §7.2 "MinHash/HLL-style
 * sketches need custom `TypedImperativeAggregate`"): aggregates a column
 * of 64-bit element hashes (e.g. `xxhash64(shingle)`) into a k-wide
 * min-signature per group — `sig[j] = min over rows of xxhash64(h, j)`,
 * identical to [[TextFunctions.minhashFromHashes]] over a collected
 * array, but computed incrementally with map-side partial aggregation:
 * each partition reduces to one k·8-byte buffer before the shuffle, so a
 * corpus-level or per-group sketch costs one pass and k longs of state
 * regardless of group size — the shape that works at 100 TB.
 *
 * Estimated Jaccard between two groups = fraction of equal signature
 * components (the d04 prefilter arithmetic, reusable on group sketches).
 */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // replicate the two-arg builtin xxhash64(h, j): seed 42, then each
      // argument folds into the running hash
      val base = XXH64.hashLong(h, 42L)
      var j = 0
      while (j < k) {
        val hj = XXH64.hashInt(j, base)
        if (hj < buf(j)) buf(j) = hj
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/**
 * Element-wise-min merge of PRE-COMPUTED k-wide MinHash signatures — the
 * second level of the two-level sketch: [[Hashing.MinHashSignature]]
 * (codegen'd, one primitive pass per row) builds each document's
 * signature, and this aggregate folds signatures into the group sketch
 * with k comparisons per ROW instead of k hash mixes per ELEMENT — on the
 * harness corpus that is 5k array-min updates instead of 2.5M×128
 * interpreted mix calls. min commutes with min, so MinHashMergeAgg over
 * per-doc signatures equals [[MinHashAgg]] over every element hash
 * (law-tested in AggregatesSpec), and partial aggregation still reduces
 * each partition to one k·8-byte buffer before the shuffle.
 */
case class MinHashMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_merge_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(k, arr.numElements())
      var j = 0
      while (j < n) {
        val hj = arr.getLong(j)
        if (hj < buf(j)) buf(j) = hj
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashMergeAgg =
    copy(child = newChildren.head)
}
