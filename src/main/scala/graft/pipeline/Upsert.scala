package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-by-key over plain parquet: updates override target rows with
  * the same key, new keys append — the incremental-corpus maintenance
  * step (re-crawled documents, re-scored quality) without a table
  * format. Write is to a fresh directory then swapped in by the
  * caller's orchestration (or pass `inPlace = true` to rewrite the
  * target, accepting non-atomicity on failure — a table format like
  * Iceberg/Delta is the production answer for atomic swap).
  *
  * Scale shape: one full-outer join on the key (both sides shuffle
  * once); with a range-partitioned target ([[Layout]]) and partition
  * pruning, only affected partitions need rewriting — that refinement
  * is the caller's partitioning strategy, not this operator.
  */
object Upsert {

  /** Returns the merged frame; optionally writes it. Update rows win on
    * key collision; both inputs must share the schema.
    */
  def mergeByKey(
      spark: SparkSession,
      targetDir: String,
      updates: DataFrame,
      key: String,
      outDir: Option[String] = None): DataFrame = {
    val merged =
      if (!Files.exists(Paths.get(targetDir))) updates
      else {
        val target = spark.read.parquet(targetDir)
        // anti-join keeps target rows whose key is NOT updated; union
        // with updates = deterministic "updates win" semantics
        target.join(updates.select(key), Seq(key), "left_anti")
          .unionByName(updates)
      }
    outDir.foreach(o => merged.write.mode("overwrite").parquet(o))
    merged
  }

  /** Full CDC apply (MERGE with deletes): `changes` carries an `opCol`
    * with 'U' (upsert) or 'D' (delete). Targets keyed by any changed
    * key drop out via one anti-join; upserts union back in. Same
    * single-shuffle shape as [[mergeByKey]] — deletes are free because
    * the anti-join already removes every changed key.
    */
  def applyCdc(
      target: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String): DataFrame = {
    val upserts = changes.filter(col(opCol) === "U").drop(opCol)
    target.join(changes.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
