package graft

import org.apache.spark.sql.functions._
import graft.sources.{Events, Tables}
import graft.streaming.EventStreams

/** Structured Streaming forms must agree with their batch twins on the
  * same fixture data (stream/batch unification).
  */
class StreamingSpec extends SparkTestBase {

  private def streamEvents = {
    Events.load(spark, sf) // ensure ns-read conf fallback
    spark.readStream
      .schema(Tables.load(spark, sf, "events").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val streamed = EventStreams.runToMemory(
      EventStreams.tumblingCounts(streamEvents), "t_tumbling")
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect().map(_.toString)
    val batch = Events.load(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect().map(_.toString)
    assert(streamed.sameElements(batch))
  }

  test("streaming session counts == batch session counts") {
    val streamed = EventStreams.runToMemory(
      EventStreams.sessionCounts(streamEvents), "t_session")
      .select(col("user_id"), col("sw.start").as("ss"), col("n_events"))
      .orderBy("user_id", "ss").collect().map(_.toString)
    val batch = Events.load(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("ss"), col("n_events"))
      .orderBy("user_id", "ss").collect().map(_.toString)
    assert(streamed.sameElements(batch))
  }

  test("flatMapGroupsWithState running counts: final state matches batch totals") {
    val out = EventStreams.runToMemory(
      EventStreams.runningUserCounts(streamEvents).toDF(), "t_state",
      mode = "update")
    // last emitted row per user == total batch count for that user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val finalCounts = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Events.load(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == batch)
  }

  test("dropDuplicatesWithinWatermark emits one row per (user, type)") {
    val out = EventStreams.runToMemory(
      EventStreams.dedupWithinWatermark(streamEvents), "t_dedup",
      mode = "append")
    val n = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(n == 0)
  }
}
