package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Codegen'd dot product over two `array<double>` columns — the scalar
 * kernel for cosine scoring (SURVEY.md §7.1 M5 similarity search).
 *
 * Spark's higher-order functions (`zip_with`+`aggregate`) evaluate
 * interpreted, one closure call per element; for an all-pairs or top-k
 * scoring projection that is the hot loop, so this expression compiles to
 * a tight primitive-double loop inside whole-stage codegen instead
 * (~100× less per-pair overhead, no allocations).
 *
 * Numeric contract: accumulates left-to-right from 0.0 — bit-identical to
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and DuckDB's
 * `list_reduce(list_prepend(0.0, list_transform(list_zip(a, b), ...)))`.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always array<double> at our call sites (VectorFunctions
  // casts with toDouble first); no ExpectsInputTypes — AbstractDataType
  // is private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * nBits-wide hyperplane sign signature of an `array<double>` vector,
 * packed into `nBits/64` longs — the sketch column behind the s06 ANN
 * k-NN join's coarse pass. Bit i of word w is the sign (≥ 0) of the dot
 * with deterministic plane 64·w + i ([[VectorFunctions.planeArray]] —
 * Fnv.mixed-derived, so the planes are genuinely pseudo-random).
 *
 * One expression instead of nBits DotProduct columns: the plane matrix
 * is precomputed once per plan as a flat primitive array and the whole
 * signature is one tight loop per row ((nBits·dim) fused
 * multiply-adds), not nBits separate codegen'd projections — at 1024
 * bits the latter generates megabytes of Java source.
 *
 * Numeric contract: each plane dot accumulates left-to-right from 0.0,
 * exactly like [[DotProduct]], so the oracle's `list_reduce` fold
 * reproduces every sign bit-for-bit.
 */
case class BitSignature(child: Expression, dim: Int, nBits: Int)
    extends UnaryExpression {
  require(nBits % 64 == 0, "signature width must pack whole longs")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "bit_signature"

  // flat [plane][dim] matrix, built once per expression instance (the
  // instance is shared across rows via the captured codegen reference)
  @transient private lazy val planes: Array[Double] = {
    val m = new Array[Double](nBits * dim)
    var p = 0
    while (p < nBits) {
      val row = VectorFunctions.planeArray(p, dim)
      System.arraycopy(row, 0, m, p * dim, dim)
      p += 1
    }
    m
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var j = 0
    while (j < n) { v(j) = arr.getDouble(j); j += 1 }
    val words = new Array[Long](nBits / 64)
    var w = 0
    while (w < words.length) {
      var acc = 0L
      var i = 0
      while (i < 64) {
        val base = (64 * w + i) * dim
        var d = 0.0
        var k = 0
        while (k < n) { d += v(k) * planes(base + k); k += 1 }
        if (d >= 0) acc |= (1L << i)
        i += 1
      }
      words(w) = acc
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitSigExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BitSignature =
    copy(child = newChild)
}

/**
 * Hamming distance between two packed `array<long>` signatures:
 * Σ popcount(xor) per word — the cheapest possible pair kernel (16
 * xor+popcounts for a 1024-bit signature vs 64 double multiply-adds for
 * the raw vectors), codegen'd as one primitive loop. This is the hot
 * expression of the s06 coarse pass, evaluated once per candidate pair.
 */
case class HammingSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hamming_sig"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingSig =
    copy(left = newLeft, right = newRight)
}
