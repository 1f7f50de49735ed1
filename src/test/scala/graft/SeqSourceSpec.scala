package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The custom DSv2 connector: correctness, partition pruning via filter
  * pushdown, and column pruning.
  */
class SeqSourceSpec extends SparkTestBase {

  private def seq(rows: Long, slices: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("generates the full deterministic sequence") {
    val df = seq(100, 4)
    assert(df.count() == 100)
    val r = df.filter(col("id") === 42).head()
    assert(r.getLong(0) == 42 && r.getLong(1) == 2 && r.getString(2) == "doc_42")
  }

  test("id-range filters prune input partitions at planning time") {
    val all = scanOf(seq(1000, 10)).inputRDD.getNumPartitions
    assert(all == 10)
    val pruned = seq(1000, 10).filter(col("id") >= 900)
    assert(scanOf(pruned).inputRDD.getNumPartitions == 1)
    assert(pruned.count() == 100)
    val empty = seq(1000, 10).filter(col("id") < 0)
    assert(scanOf(empty).inputRDD.getNumPartitions == 0)
    assert(empty.count() == 0)
  }

  test("column pruning reaches the reader") {
    val df = seq(50, 2).select("bucket")
    assert(scanOf(df).scan.readSchema().fieldNames.sameElements(Array("bucket")))
    assert(df.distinct().count() == 10)
  }

  test("pushdown is pruning-only: residual filter still applies") {
    // a filter the source cannot handle composes with one it can
    val df = seq(200, 4)
      .filter(col("id") >= 100 && col("payload").endsWith("5"))
    assert(df.count() == 10)
  }
}
