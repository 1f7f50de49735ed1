package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime bloom-filter injection (InjectRuntimeFilter): on a selective
  * dim-filtered join, Spark builds a bloom filter from the filtered
  * build side and applies it to the probe side BEFORE the probe's
  * shuffle — at 100 TB this is the difference between shuffling the
  * whole fact table and shuffling only rows that can possibly join.
  * Thresholds are lowered here so the optimization fires at fixture
  * scale; on a real cluster the defaults (10 MB creation side) fire on
  * exactly this plan shape.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom filter on the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join so the probe-side filter is worth injecting
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders")
        .filter(col("o_orderstatus") === "P") // selective build side
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"), optimized.take(2000))
      // and the filtered plan returns the same rows as the plain join
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders")
          .filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(joined.collect().map(_.toString).sorted.sameElements(expected))
    }
  }
}
