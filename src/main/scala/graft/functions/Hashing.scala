package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the hashing ops Spark lacks as
 * built-ins: SimHash and a polynomial rolling-hash fingerprint
 * (SURVEY.md §7.1 M5 / §7.2 "MinHash/HLL-style sketches need custom").
 *
 * Both are single-pass over a token array, evaluated per-row inside the
 * projection (CodegenFallback: one virtual call per row; the token
 * array itself is produced by codegen'd built-ins). FNV-1a 64 is the
 * base hash — public-domain, allocation-free, deterministic.
 */
object Fnv {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}

/**
 * SimHash-64 of an array<string> token column: per token take FNV-1a64,
 * accumulate +1/-1 per bit position, emit the sign bit vector. Documents
 * with small Hamming distance between SimHashes are near-duplicates.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Fnv.hashBytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Polynomial rolling-hash fingerprint of an array<string> token column:
 * H = Σ token_hash_i · P^(n-1-i) mod 2^64 — order-sensitive (unlike a
 * bag-of-words hash), single pass.
 */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private final val P = 1099511628211L

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var h = 0L
    var i = 0
    while (i < arr.numElements()) {
      val th = if (arr.isNullAt(i)) 0L else Fnv.hashBytes(arr.getUTF8String(i).getBytes)
      h = h * P + th
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/**
 * Distinct word-n-gram shingles from a token array — single pass, one
 * expression. Semantics identical to
 * `array_distinct(transform(sequence(0, size-n), i => concat_ws(" ",
 * slice(tks, i+1, n))))` with the short-document collapse to one
 * whole-text shingle, but evaluated as one virtual call per row instead
 * of ~size interpreted lambda invocations building intermediate arrays.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val tks = input.asInstanceOf[ArrayData]
    val m = tks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m < n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < m) {
        if (i > 0) sb.append(' ')
        if (!tks.isNullAt(i)) sb.append(tks.getUTF8String(i).toString)
        i += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i <= m - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tks.getUTF8String(i + j).toString)
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/**
 * MinHash signature of an `array<long>` element-hash column: one pass per
 * row computing all k minima in primitive loops — sig[j] = min over
 * elements of xxhash64(h, j), bit-identical to the builtin-HOF
 * formulation `transform(sequence(0,k-1), j => array_min(transform(h0,
 * h => xxhash64(h, j))))` but without k×|h0| interpreted closure calls
 * per row (the lambda path costs ~10× more on the harness corpus).
 */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val buf = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        // two-arg builtin xxhash64(h, j): seed 42, args fold in order
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(arr.getLong(i), 42L)
        var j = 0
        while (j < k) {
          val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, base)
          if (v < buf(j)) buf(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * FNV-1a-64 checksum of a binary column — the "codec checksum" stage of
 * the multimodal decode path, in-place over the payload bytes (no
 * Dataset-encoder round-trip; one virtual call per row).
 */
case class FnvChecksum(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_checksum"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Fnv.hashBytes(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): FnvChecksum =
    copy(child = newChild)
}

/**
 * Normalized byte histogram of a binary column: dim bins of
 * count(byte % dim) / max(len, 1) — the deterministic stand-in "feature
 * vector" of the multimodal decode stage (Multimodal.FakeCodec), as a
 * single-pass Catalyst expression.
 */
case class ByteHistogram(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any = {
    val data = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Double](dim)
    var i = 0
    while (i < data.length) {
      hist((data(i) & 0xff) % dim) += 1.0
      i += 1
    }
    val n = math.max(data.length, 1).toDouble
    var b = 0
    while (b < dim) { hist(b) /= n; b += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hist)
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object Hashing {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def rollingHash(tokens: Column): Column = column(RollingHash(expression(tokens)))
  def fnvChecksum(data: Column): Column = column(FnvChecksum(expression(data)))
  def byteHistogram(data: Column, dim: Int): Column =
    column(ByteHistogram(expression(data), dim))

  /** MinHash sketch aggregate over a column of element hashes — see
    * [[MinHashAgg]]. Use in groupBy(...).agg(minhashAgg(xxhash64(col), k)). */
  def minhashAgg(elementHash: Column, k: Int): Column =
    column(MinHashAgg(expression(elementHash), k).toAggregateExpression())

  /** Estimated Jaccard between two MinHash signatures: the fraction of
    * equal components (k must match). */
  def minhashEstJaccard(sigA: Column, sigB: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), m => m))
      .cast("double") / size(sigA)
  }

  /** Hamming distance between two 64-bit signatures (built-in bit_count). */
  def hammingDist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
