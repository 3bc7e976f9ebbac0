package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
