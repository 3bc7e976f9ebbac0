package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Z-order (Morton) interleave of two long columns' low `bits` bits:
 * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting or
 * range-partitioning by the z-value clusters rows that are close in BOTH
 * dimensions into the same files/row-groups, so parquet min/max stats
 * prune scans for predicates on EITHER column — the multi-dimension
 * data-layout primitive behind Delta/Iceberg table clustering, as a plain
 * deterministic expression (inputs are masked to `bits`, so the result is
 * a pure bit-algebra function both engines replay identically).
 *
 * 2·bits ≤ 62 keeps the result a non-negative long. Codegen'd like the
 * other graft kernels: one static-shaped call per row inside whole-stage
 * codegen.
 */
case class ZOrderLong(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_long"

  def compute(a: Long, b: Long): Long = {
    val mask = (1L << bits) - 1
    val x = a & mask
    val y = b & mask
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(compute(a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zorderExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def zorder(a: Column, b: Column, bits: Int): Column =
    column(ZOrderLong(expression(a), expression(b), bits))

  /** The interleave as portable SQL over two BIGINT column names — the
    * oracle twin of [[ZOrderLong]] (same masking, same bit placement). */
  def zorderSql(a: String, b: String, bits: Int): String = {
    // same fail-fast as ZOrderLong: bits ≥ 32 would wrap the shifted
    // multipliers negative and silently emit SQL that can never match
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((($a & $mask) >> $i) & 1) * ${1L << (2 * i)} + " +
      s"((($b & $mask) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }
}
