package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Normalized loader for the `events` table.
  *
  * Hazard (FIXTURES.md): `events.ts` is parquet timestamp[ns]. Spark's
  * TimestampType is µs; depending on `spark.sql.legacy.parquet.nanosAsLong`
  * Spark either truncates to µs or surfaces a long of nanos, while DuckDB
  * keeps ns. This loader always yields:
  *   - `ts`  TimestampType (µs, truncated from ns)
  *   - `sec` LongType whole-second epoch — the only projection of ts that
  *     is bit-identical to the DuckDB oracle's floor(epoch(ts)).
  * All scored event queries must go through `sec` (or ts windows no finer
  * than 1 second).
  */
object Events {
  def load(spark: SparkSession, dir: String): DataFrame = {
    val raw =
      try Tables.load(spark, dir, "events")
      catch {
        case _: Throwable =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          Tables.load(spark, dir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong path: ts is ns since epoch
        raw.withColumn("sec", expr("ts DIV 1000000000"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("sec", unix_timestamp(col("ts")))
    }
  }
}
