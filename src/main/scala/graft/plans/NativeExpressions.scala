package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function form of a dot product
  * (`aggregate(zip_with(...))`) evaluates an interpreted lambda per
  * element — fine for one-off queries, but similarity search evaluates
  * it per candidate pair. This expression participates in whole-stage
  * codegen: a tight primitive loop over the two float arrays, no
  * per-element boxing. Accumulation is sequential ascending-index in
  * double — bit-identical to the HOF form, so oracle parity is
  * unaffected.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; used only through NativeExpressions
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column helpers for the native expressions. */
object NativeExpressions {

  /** Register `vec_dot` in the session's function registry (idempotent)
    * so it is usable from SQL and via [[vecDot]].
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngram_hashes",
      exprs => WordNGramHashes(exprs(0), NativeExpressions.literalInt(exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton2", exprs => MortonInterleave(exprs(0), exprs(1)), "built-in")
  }

  private def literalInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_ngram_hashes n must be an integer literal, got $other")
    }

  /** Codegen'd dot product of two float-array columns. Columns are
    * referenced by name (resolution happens via expr), so pass plain
    * attribute names.
    */
  def vecDot(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"vec_dot($a, $b)")
  }
}
