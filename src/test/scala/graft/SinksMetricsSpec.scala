package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{Events, Tables}
import graft.pipeline.Metrics
import graft.streaming.Sinks

/** foreachBatch idempotent sink (exactly-once effect under replay) and
  * Observation-based pipeline telemetry.
  */
class SinksMetricsSpec extends SparkTestBase {

  test("idempotent foreachBatch sink: replayed batch is skipped, data written once") {
    Events.load(spark, sf)
    val out = java.nio.file.Files
      .createTempDirectory("graft_sink_").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_").toFile.getAbsolutePath
    val stream = spark.readStream
      .schema(Tables.load(spark, sf, "events").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .select(col("event_id"), col("user_id"))
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val written = Sinks.idempotentParquetBatch(df, id, out)
        assert(written, s"first delivery of batch $id must write")
        // replay the same batch: must be skipped
        assert(!Sinks.idempotentParquetBatch(df, id, out),
          s"replay of batch $id must be skipped")
        ()
      }
      .start()
    q.awaitTermination(120000)
    val sunk = spark.read.parquet(s"$out/batch=*").count()
    val expected = Events.load(spark, sf).count()
    assert(sunk == expected, s"$sunk != $expected")
  }

  test("Observation metrics ride the job without a second pass") {
    val li = Tables.load(spark, sf, "lineitem")
    val (df, obs) = Metrics.observe(li.filter(col("l_quantity") < 10),
      "q_metrics", Map(
        "rows" -> count(lit(1)),
        "null_keys" -> sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)),
        "max_qty" -> max(col("l_quantity"))))
    val n = df.count()
    val got = obs.get
    assert(got("rows") == n)
    assert(got("null_keys") == 0L)
    assert(got("max_qty").asInstanceOf[Double] < 10.0)
  }
}
