package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.NativeExpressions
import graft.sources.Tables

/** The codegen'd vec_dot must be bit-identical to the higher-order-
  * function form (same sequential ascending-index double accumulation) —
  * that is what keeps the oracle parity intact when it replaces the HOF
  * in similarity operators.
  */
class NativeExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("vec_dot equals HOF dot bitwise on all fixture embeddings") {
    NativeExpressions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val diff = emb.select(
        expr("vec_dot(a, b)").as("native"),
        VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("vec_dot handles nulls and works from plain SQL") {
    NativeExpressions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs ORDER BY d").collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }
}
