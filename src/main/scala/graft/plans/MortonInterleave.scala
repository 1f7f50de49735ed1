package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Morton (Z-order) code: interleaves the low 16 bits of
  * two long columns (x into even bit positions, y into odd), producing
  * the space-filling-curve cluster key used for multi-dimension file
  * skipping (see q174). The composed-arithmetic form of the same
  * interleave is a 24-term expression tree re-evaluated per row; this
  * expression is one branch-free magic-number spread per operand inside
  * whole-stage codegen.
  *
  * The bit-spread is the standard parallel-prefix sequence: each step
  * doubles the gap between occupied bits, so 16 input bits spread into
  * 32 output positions in 4 shift-mask rounds instead of 16 per-bit
  * extractions.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  private def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sp = ctx.freshName("spread")
      // local helper via a generated static-style lambda is overkill —
      // inline both spreads; constants keep the JIT branch-free
      def gen(in: String, out: String): String =
        s"""
          long $out = $in & 0xffffL;
          $out = ($out | ($out << 8)) & 0x00ff00ffL;
          $out = ($out | ($out << 4)) & 0x0f0f0f0fL;
          $out = ($out | ($out << 2)) & 0x33333333L;
          $out = ($out | ($out << 1)) & 0x55555555L;
        """
      val sx = ctx.freshName(sp)
      val sy = ctx.freshName(sp)
      s"""
        ${gen(a, sx)}
        ${gen(b, sy)}
        ${ev.value} = $sx | ($sy << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
