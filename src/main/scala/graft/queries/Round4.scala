package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.QueryDef
import graft.sources.{Events, Tables}

/** Round-4 additions: the Avro ingest roundtrip (the one mainstream
  * event-pipeline format previously missing — spark-avro is bundled in
  * Spark 4's spark-sql jar) and the scored stream-stream interval join
  * (EventStreams.intervalJoin promoted from spec-only to a declared
  * CORRECTNESS entry, per the round-3 verdict).
  */
object Round4 {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** See EventTime.withShufflePartitions — state stores instantiate one
    * per shuffle partition per micro-batch.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n)
    try body finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** Streaming events source with a whole-second `tss` timestamp column
    * (the only ts projection that is oracle-safe — SURVEY.md §1.2) and
    * the same ns-vs-µs schema fallback as the batch Events loader.
    */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    Events.load(s, dir) // ensure the ns-read conf fallback has run
    val src = s.readStream.schema(Tables.load(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val sec = if (src.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      expr("ts DIV 1000000000")
    else unix_timestamp(col("ts"))
    src.withColumn("tss", timestamp_seconds(sec))
  }

  val defs: Map[String, QueryDef] = Map(
    // ---- Avro source/sink roundtrip ------------------------------------
    // Same shape as q89's ORC roundtrip: write a typed subset, read it
    // back, prove values and schema survive. Avro is the wire format of
    // Kafka-centric event pipelines, so ingest hits it early. The
    // distribution bundles the avro FileFormat classes in spark-sql but
    // not their DataSourceRegister service entry, so the format is
    // addressed by class name rather than the "avro" shortname.
    "q151_src_avro_roundtrip" -> QueryDef(
      (s, dir) => {
        val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
        val tmp = graft.util.Scratch.dir("graft_avro")
        t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("c_custkey"),
            col("c_name"), col("c_acctbal").cast("double").as("c_acctbal"))
          .write.mode("overwrite").format(avroFmt).save(tmp)
        s.read.format(avroFmt).load(tmp).orderBy("c_custkey")
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer ORDER BY c_custkey""")),

    // ---- stream-stream interval join (scored) --------------------------
    // Purchases stream joined to the same user's clicks within the next
    // 5 minutes — both sides watermarked and the join condition bounds
    // event-time distance, so join state expires instead of growing with
    // the streams (the REQUIRED shape for an unbounded two-stream join).
    // Joined at whole-second granularity (timestamp_seconds(sec)) so the
    // boundary comparisons are integral in both engines; scored against
    // the equivalent batch join.
    "q152_stream_interval_join" -> QueryDef(
      (s, dir) => {
        val purchases = eventStream(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tss").as("ts"), col("event_id"))
        val clicks = eventStream(s, dir)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("tss").as("ts"), col("event_id"))
        val joined = graft.streaming.EventStreams
          .intervalJoin(purchases, clicks, intervalSeconds = 300L)
        val qname = "q152_stream_interval_join_sink"
        withShufflePartitions(s, 8) {
          val q = joined
            .writeStream.outputMode("append").format("memory").queryName(qname)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        s.table(qname)
          .groupBy(col("l_id").as("event_id"))
          .agg(count(lit(1)).as("n_clicks"),
            min(col("r_id")).as("first_click"),
            max(col("r_id")).as("last_click"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type,
          ${graft.util.Det.epochSecSql("ts")} AS sec FROM events),
      p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
      c AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click')
      SELECT p.event_id, COUNT(*) AS n_clicks,
        MIN(c.event_id) AS first_click, MAX(c.event_id) AS last_click
      FROM p JOIN c ON p.user_id = c.user_id
        AND c.sec BETWEEN p.sec AND p.sec + 300
        AND p.event_id != c.event_id
      GROUP BY 1 ORDER BY 1"""))
  )
}
