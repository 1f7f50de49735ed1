package graft

import org.apache.spark.sql.functions._

/** Scan-level efficiency assertions (SURVEY.md §6 / the 100 TB story):
  * filters and projections must reach the parquet reader, and
  * partitioned layouts must prune at planning time — on a large
  * cluster these are the difference between reading gigabytes and
  * reading everything.
  */
class PushdownSpec extends SparkTestBase {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("parquet scan receives pushed filters") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") < 5 && col("l_returnflag") === "A")
      .select("l_orderkey", "l_quantity")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("LessThan(l_quantity,5"), plan)
    assert(plan.contains("EqualTo(l_returnflag,A)"), plan)
  }

  test("projection prunes the read schema to selected columns") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val plan = formatted(df)
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
  }

  test("partitioned layout prunes partitions at planning time") {
    val tmp = new java.io.File(graft.util.Scratch.dir("graft_prune_"))
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr")
      .parquet(tmp.getAbsolutePath)
    val pruned = spark.read.parquet(tmp.getAbsolutePath)
      .filter(col("yr") === 1996)
    val plan = formatted(pruned)
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("(yr = 1996)") || plan.contains("yr#"), plan)
    // only the one partition's files are actually read (inputFiles
    // lists the unpruned FileIndex, so check the executed scan metric)
    pruned.collect() // collect() runs this df's own QueryExecution,
    // so the scan node below carries the populated metrics
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val total = spark.read.parquet(tmp.getAbsolutePath).inputFiles.length
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < total, s"read $read of $total files")
  }

  test("small dimension joins broadcast (no shuffle of the fact side)") {
    val fact = spark.read.parquet(s"$sf/orders.parquet")
    val dim = spark.read.parquet(s"$sf/nation.parquet")
    val joined = fact.join(broadcast(dim),
      fact("o_custkey") % 25 === dim("n_nationkey"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
  }
}
