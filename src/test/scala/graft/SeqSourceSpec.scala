package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The custom DSv2 connector: correctness, partition pruning via filter
  * pushdown, and column pruning.
  */
class SeqSourceSpec extends SparkTestBase {

  private def seq(rows: Long, slices: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  // aggregate/sort/join plans are AQE-wrapped and executed stages are
  // leaf QueryStageExec nodes; recurse through both to find the scan
  private def allScans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
    case b: BatchScanExec => Seq(b)
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: QueryStageExec => allScans(q.plan)
  }.flatten

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    allScans(df.queryExecution.executedPlan).head

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

  test("global aggregates push down to closed-form per-slice partials") {
    val df = seq(100000, 8)
      .filter(col("id") >= 250 && col("id") < 99750)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("s"),
        min(col("bucket")).as("bmn"), max(col("bucket")).as("bmx"),
        sum(col("bucket")).as("bs"))
    val scan = scanOf(df)
    // the scan itself produced the partial-aggregate schema (one Long
    // per aggregate), not data rows — rows read = slices, not 100k
    assert(scan.scan.description().contains("aggs="), scan.scan.description())
    assert(scan.scan.readSchema().fieldNames.forall(_.startsWith("agg_")))
    val r = df.head()
    val lo = 250L; val hi = 99749L; val n = hi - lo + 1
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == lo && r.getLong(2) == hi)
    assert(r.getLong(3) == (lo + hi) * n / 2)
    assert(r.getLong(4) == 0L && r.getLong(5) == 9L)
    // brute-force the bucket sum on a small congruent case to trust the
    // closed form: same phases, 1000x smaller
    val small = seq(1000, 8).filter(col("id") >= 250 && col("id") < 750)
    val expectBs = small.select(sum(col("bucket"))).head().getLong(0)
    val smallDf = seq(1000, 8).filter(col("id") >= 250 && col("id") < 750)
      .agg(sum(col("bucket")))
    assert(scanOf(smallDf).scan.description().contains("aggs="))
    assert(smallDf.head().getLong(0) == expectBs)
  }

  test("aggregate pushdown over an empty range yields count 0, null extrema") {
    val df = seq(1000, 4).filter(col("id") < 0)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1), r)
  }

  test("group-by and unsupported functions decline pushdown, stay correct") {
    val df = seq(1000, 4).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(!scanOf(df).scan.description().contains("aggs="))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      (0L to 9L).map(_ -> 100L).toMap)
    val avg1 = seq(1000, 4).agg(avg(col("id")))
    assert(!scanOf(avg1).scan.description().contains("aggs="))
    assert(avg1.head().getDouble(0) == 499.5)
  }

  test("top-k on id pushes down; each slice emits only its k extreme rows") {
    val df = seq(100000, 8).orderBy(col("id").desc).limit(5)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("limit=5"), scan.scan.description())
    assert(scan.scan.description().contains("topNDesc=true"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(99999L, 99998L, 99997L, 99996L, 99995L))
    // the pushed bound caps what readers emit: 8 slices x 5 rows max
    assert(scan.execute().count() <= 40)
    val asc = seq(100000, 8).orderBy(col("id")).limit(3)
    assert(df.sparkSession != null && asc.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L))
  }

  test("join-driven runtime filter prunes slices at execution time") {
    // selective dim side: a parquet-backed scan with a pushed EqualTo
    // (a driver-side Seq would constant-fold to a bare LocalRelation,
    // which DPP ignores — no selective Filter node). The dim broadcast
    // hands the surviving ids to SeqScan.filter at execution time.
    val dim = sources.Tables.load(spark, sf, "nation")
      .filter(col("n_name") === "NATION_7")
      .select(col("n_nationkey").cast("long").as("id"))
    val dimIds = dim.collect().map(_.getLong(0)).toSeq
    assert(dimIds.size == 1)
    val df = seq(1000, 10).join(dim, "id").select(col("id"), col("bucket"))
    val rows = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == dimIds.sorted)
    val scan = allScans(df.queryExecution.executedPlan)
      .find(_.scan.description().startsWith("graft_seq")).get
    // 10 slices of 100 ids; only the slice containing the surviving id
    // may run — runtime-pruned partitions never reach an executor
    val parts = scan.inputRDD.getNumPartitions
    assert(parts <= 1, s"expected runtime pruning to <=1 partition, got $parts")
  }

  test("plain limit pushes down and is re-applied exactly by Spark") {
    val df = seq(100000, 8).limit(7)
    assert(df.count() == 7)
    val scan = scanOf(df.select(col("id")))
    // pushed limit visible on a fresh plan of the same shape
    val lim = seq(100000, 8).select(col("id")).limit(7)
    assert(scanOf(lim).scan.description().contains("limit=7"))
  }
}
