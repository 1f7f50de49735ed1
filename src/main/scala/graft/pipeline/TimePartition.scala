package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder's TimestampExpander semantics, Spark-native (SURVEY.md §2.1
  * B2): the reference expands templated targets over tumbling time
  * buckets encoded in file names; here the buckets are partition columns
  * derived from event time, and Catalyst prunes partitions for any query
  * filtering on them — the same effect the reference got from only
  * instantiating targets inside the requested range.
  */
object TimePartition {

  /** Derive `dt` (yyyy-MM-dd) and `hr` (HH) bucket columns from a
    * timestamp column — builder's `%Y-%m-%d-%H` file_step.
    */
  def withBuckets(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("hr", date_format(col(tsCol), "HH"))

  /** Write time-bucketed parquet (one directory per dt/hr — the target
    * layout a downstream incremental consumer prunes on).
    */
  def writePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    withBuckets(df, tsCol).write.partitionBy("dt", "hr")
      .mode("overwrite").parquet(path)
}
