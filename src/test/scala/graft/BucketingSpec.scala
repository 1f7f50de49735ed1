package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join strategy for repeated big⋈big joins at
  * scale — both sides pre-hashed into the same bucket layout lets the
  * sort-merge join run with NO shuffle exchange on either side.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val o = sources.Tables.load(spark, sf, "orders")
    val li = sources.Tables.load(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val n = joined.count()
    assert(n == li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join must not introduce a hash exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
