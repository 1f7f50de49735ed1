package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global cumulative sums in key order — the building
  * block for exact ranking statistics (Mann-Whitney AUC, KS tests,
  * tie-averaged ranks) WITHOUT funneling the relation through a
  * single-partition global window (the q103 shape PlanGuardSpec
  * forbids).
  *
  * Two-pass range-shard scheme:
  *   1. bin each row by its key's position in [min, max] (1-row scalar
  *      broadcast; the bin expression only orders rows, so engine float
  *      details never surface in results);
  *   2. per-bin totals → prefix offsets over the BOUNDED bin spine
  *      (≤ `bins` rows, post-aggregation — the sanctioned
  *      single-partition shape) → broadcast back;
  *   3. per-bin local running sums + offset = exact global running sum.
  *
  * Each data-sized relation is touched by one hash exchange (the bin
  * totals) and one per-bin sort — no global sort anywhere, so the plan
  * survives a 1000-executor scale-up with bins ≈ executor parallelism.
  */
object Ranks {

  /** Append `cum_<c>` (inclusive running total in ascending `key`
    * order) for each column in `vals`. Keys must be unique rows (e.g.
    * a per-key aggregate); values must be integral.
    */
  def cumSums(d: DataFrame, key: String, vals: Seq[String],
      bins: Int = 64): DataFrame = {
    val mm = d.agg(min(key).as("lo"), max(key).as("hi"))
    val binned = d.crossJoin(broadcast(mm)).withColumn("bin",
      expr(s"""CASE WHEN hi = lo THEN 0 ELSE LEAST(CAST(FLOOR(
        (CAST(`$key` AS DOUBLE) - CAST(lo AS DOUBLE)) /
        (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * $bins) AS INT),
        ${bins - 1}) END"""))
      .drop("lo", "hi")
    val tot = binned.groupBy("bin")
      .agg(sum(vals.head).as(s"t_${vals.head}"),
        vals.tail.map(c => sum(c).as(s"t_$c")): _*)
    val wb = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tot.select(col("bin") +: vals.map(c =>
      coalesce(sum(col(s"t_$c")).over(wb), lit(0L)).as(s"o_$c")): _*)
    val wl = Window.partitionBy("bin").orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = binned.join(broadcast(offs), Seq("bin"))
    val cums = vals.map(c =>
      (sum(col(c)).over(wl) + col(s"o_$c")).as(s"cum_$c"))
    withCums.select(
      d.columns.map(col).toSeq ++ cums: _*)
  }

  /** Per-GROUP variant of [[cumSums]]: exact running totals in `key`
    * order WITHIN each group, with each group's rows spread across
    * `bins` range buckets instead of sorting the whole group in one
    * task. This is the scale answer when the group domain is bounded
    * but per-group data is huge (per-type medians over billions of
    * rows): shuffles hash on (group, bin) — parallelism is
    * groups × bins — and the offset spine is a ≤`bins`-row
    * partitioned window per group, never a global exchange.
    */
  def cumSumsBy(d: DataFrame, parts: Seq[String], key: String,
      vals: Seq[String], bins: Int = 64): DataFrame = {
    val mm = d.groupBy(parts.map(col): _*)
      .agg(min(key).as("lo"), max(key).as("hi"))
    val binned = d.join(mm, parts).withColumn("bin",
      expr(s"""CASE WHEN hi = lo THEN 0 ELSE LEAST(CAST(FLOOR(
        (CAST(`$key` AS DOUBLE) - CAST(lo AS DOUBLE)) /
        (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * $bins) AS INT),
        ${bins - 1}) END"""))
      .drop("lo", "hi")
    val tot = binned.groupBy((parts :+ "bin").map(col): _*)
      .agg(sum(vals.head).as(s"t_${vals.head}"),
        vals.tail.map(c => sum(c).as(s"t_$c")): _*)
    val wb = Window.partitionBy(parts.map(col): _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tot.select((parts :+ "bin").map(col) ++ vals.map(c =>
      coalesce(sum(col(s"t_$c")).over(wb), lit(0L)).as(s"o_$c")): _*)
    val wl = Window.partitionBy((parts :+ "bin").map(col): _*).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = binned.join(offs, parts :+ "bin")
    val cums = vals.map(c =>
      (sum(col(c)).over(wl) + col(s"o_$c")).as(s"cum_$c"))
    withCums.select(d.columns.map(col).toSeq ++ cums: _*)
  }
}
