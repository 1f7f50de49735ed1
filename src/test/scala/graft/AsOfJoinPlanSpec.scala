package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPlan
import graft.sources.Events

/** The custom physical as-of operator must agree exactly with the
  * union+window composition on real data, including no-match nulls and
  * same-timestamp ties.
  */
class AsOfJoinPlanSpec extends SparkTestBase {
  import spark.implicits._

  test("custom AsOfJoinExec == window composition on fixture events") {
    val e = Events.load(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
    val probes = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec"), col("event_id"))
    val srcs = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"),
        (col("sec") * lit(100000000L) + col("event_id")).as("code"))
    val viaWindow = AsOfJoin.asOfCode(probes, srcs, "user_id", "sec", "event_id")
      .orderBy("event_id").collect().map(_.toString)
    val viaExec = AsOfJoinPlan.asOf(probes, srcs)
      .withColumnRenamed("event_id", "ignored") // align names for compare
      .toDF("event_id", "user_id", "match_code")
      .orderBy("event_id").collect().map(_.toString)
    assert(viaExec.sameElements(viaWindow))
  }

  test("custom AsOfJoinExec handles ties and no-match keys") {
    val probes = Seq((1L, 10L, 100L), (1L, 10L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "pid")
    val srcs = Seq((1L, 10L, 900L), (1L, 10L, 901L), (1L, 4L, 800L))
      .toDF("k", "t", "code")
    val out = AsOfJoinPlan.asOf(probes, srcs)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(100L).contains(901L)) // max code among ties at t=10
    assert(out(101L).contains(901L))
    assert(out(102L).isEmpty) // key 2 has no sources
  }

  test("plan uses the custom operator") {
    val probes = Seq((1L, 1L, 1L)).toDF("k", "t", "pid")
    val srcs = Seq((1L, 1L, 1L)).toDF("k", "t", "code")
    val plan = AsOfJoinPlan.asOf(probes, srcs).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec node prints without the Exec suffix
  }
}
