package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Exactly-once-style streaming sinks built on foreachBatch.
  *
  * Structured Streaming's foreachBatch gives at-least-once delivery:
  * after a crash the same (batchId, data) pair can be replayed. The
  * standard recipe for an exactly-once *effect* is an idempotent,
  * transactional write keyed by batchId — replays detect the committed
  * marker and skip. At cluster scale this is how file/warehouse sinks
  * avoid double-counting without any sink-side coordination: the
  * batchId is stable across retries because it is derived from the
  * checkpointed offset log.
  */
object Sinks {

  /** Write `df` to `outDir/batch=<batchId>` unless that batch already
    * committed (marker file). Returns true if the batch was written,
    * false if it was a replay that got skipped. Write-then-mark makes
    * the commit atomic-enough for a filesystem sink: a crash between
    * write and mark re-runs the batch, which overwrites the same
    * directory deterministically.
    */
  def idempotentParquetBatch(df: DataFrame, batchId: Long,
      outDir: String): Boolean = {
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val marker = new java.io.File(dir, s"_committed_$batchId")
    if (marker.exists()) false
    else {
      df.write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/batch=$batchId")
      marker.createNewFile()
      true
    }
  }
}
