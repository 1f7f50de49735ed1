package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the driver-generated parquet fixtures
  * (TESTDATA.md, FIXTURES.md). All scored queries read through here so
  * source handling (e.g. the events timestamp[ns] hazard) is fixed in
  * one place. Scans stay plain `spark.read.parquet` — Catalyst pushes
  * filters/column pruning into the vectorized parquet reader.
  *
  * DataFrames are memoized per (session, dir, table): the fixtures are
  * immutable, so re-running 65 queries reuses one analyzed relation per
  * table instead of re-listing files and re-reading footers 65 times —
  * a pure fixed-overhead cut in Verify/Bench.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val cache = new ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
}
