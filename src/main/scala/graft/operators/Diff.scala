package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset snapshot diff — the audit op between two versions of a
  * keyed table (ingest validation, regression hunting between pipeline
  * runs, "what changed since the last release" reports next to the
  * MemDeltaCatalog time-travel reads).
  *
  * Shape at 100 TB: ONE full-outer hash join on the key (both sides
  * shuffle once; with both snapshots bucketed/storage-partitioned by
  * the key it is zero-shuffle — the q-series SPJ machinery), and the
  * value comparison is per-row codegen. Nothing is collected; the
  * changed-keys frame is the (small) output, not the inputs.
  */
object Diff {

  /** Per-key status between snapshots: `added` (only in v2), `removed`
    * (only in v1), `changed` (key in both, any compare column
    * IS DISTINCT FROM its twin — null-safe), `same`. Output: key
    * columns + `status`. With an EMPTY `compare` list this is a
    * key-presence-only diff: `changed` is never emitted (keys present
    * in both snapshots report `same`).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val a = v1.select((keys ++ compare).map(col): _*)
      .withColumn("__in_a", lit(1))
    val b = v2.select(keys.map(col) ++
        compare.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__in_b", lit(1))
    val joined = a.join(b, keys, "full_outer")
    val anyChanged = compare.map(c =>
      !(col(c) <=> col(s"__b_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__in_a").isNull, lit("added"))
        .when(col("__in_b").isNull, lit("removed"))
        .when(anyChanged, lit("changed"))
        .otherwise(lit("same")).as("status"): _*)
  }
}
