package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions packaging for the engine's native functions —
  * the deployment path for clusters:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * In-process callers can use [[NativeExpressions.register]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("word_ngram_hashes"),
      new ExpressionInfo(classOf[WordNGramHashes].getName, "word_ngram_hashes"),
      (exprs: Seq[Expression]) => WordNGramHashes(exprs(0),
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_ngram_hashes n must be an integer literal, got $other")
        })))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // analysis-time (post-hoc resolution): must run BEFORE the
    // optimizer's ReplaceDeduplicateWithAggregate consumes the
    // Deduplicate node and bakes in the arbitrary-survivor first()
    e.injectPostHocResolutionRule(_ => DeterministicDeduplicate)
  }
}
