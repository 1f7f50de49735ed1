package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the driver-generated parquet fixtures
  * (TESTDATA.md, FIXTURES.md). All scored queries read through here so
  * source handling (e.g. the events timestamp[ns] hazard) is fixed in
  * one place. Scans stay plain `spark.read.parquet` — Catalyst pushes
  * filters/column pruning into the vectorized parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
