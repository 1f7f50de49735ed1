package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution evidence: with AQE on (Spark 4 default),
  * over-provisioned shuffle partitions collapse to the data's actual
  * size at runtime — the mechanism that makes one static
  * `spark.sql.shuffle.partitions` setting survive 100 TB variance
  * across stages.
  */
class AqeSpec extends SparkTestBase {

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val df = spark.read.parquet(s"$sf/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"), plan.take(1500))
      assert(plan.contains("coalesced"), plan.take(1500))
      // runtime partition count is far below the static 64
      val shuffleReads = df.rdd.getNumPartitions
      assert(shuffleReads < 64, s"still $shuffleReads partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
