package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the standing maintenance job of any
  * large-scale ingest: streaming/incremental writers (pipeline.Incremental,
  * TimePartition) produce many small files, and at 100 TB the resulting
  * footer/listing overhead dominates scan setup. Compaction rewrites a
  * dataset into ~target-size files.
  *
  * Sizing reads the real on-disk byte count through the Hadoop
  * FileSystem API (works for HDFS/S3A/local alike), not a row-count
  * guess. Shrinking the file count uses `coalesce` — a narrow,
  * shuffle-free merge of co-located partitions; only growing the count
  * (splitting oversized files) pays a `repartition` shuffle.
  */
object Compact {

  /** Rewrite `inDir` (parquet) into `outDir` as ~`targetFileBytes`
    * files. Returns the chosen file count.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt

    val df = spark.read.parquet(inDir)
    val current = df.rdd.getNumPartitions
    val sized =
      if (nFiles < current) df.coalesce(nFiles)
      else if (nFiles > current) df.repartition(nFiles)
      else df
    sized.write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
