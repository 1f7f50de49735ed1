package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split a per-key event sequence into sessions
  * wherever the gap to the previous event exceeds `gapSeconds`. The
  * lag + running-sum form is the oracle-expressible equivalent of
  * `session_window`: Spark merges an event landing exactly on the
  * session end, so a new session starts iff gap > gapSeconds (strict).
  * One shuffle on the key.
  */
object Sessionize {

  /** Adds `session_id` (0-based per key) given an integral `secCol`. */
  def bySeconds(
      df: DataFrame,
      key: String,
      secCol: String,
      tieBreak: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(secCol), col(tieBreak))
    df.withColumn("__gap",
        col(secCol) - lag(col(secCol), 1).over(w))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__gap", "__new")
  }
}
