package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Data-layout control for scan pruning at scale: write files whose
  * key ranges are DISJOINT, so parquet min/max footer stats (and any
  * engine's file-level zone maps) prune whole files for range/point
  * predicates. `repartitionByRange` range-partitions by sampled split
  * points (one shuffle), and the within-partition sort tightens
  * row-group stats inside each file.
  *
  * This is the single-dimension layout tool; combine with
  * [[TimePartition]] (directory-level dt/hr pruning) for the usual
  * time-plus-key layout of a 100 TB fact table.
  */
object Layout {

  /** Write `df` as `n` range-partitioned, internally sorted parquet
    * files keyed by `keys`.
    */
  def rangeSortedWrite(df: DataFrame, outDir: String, n: Int, keys: Column*): Unit =
    df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(outDir)
}
