package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair over a regular spine.
  *
  * Given per-key observations at integer time buckets, densify each
  * key to its full min..max bucket range and linearly interpolate the
  * missing buckets between the nearest observed anchors.
  *
  * Determinism: the interpolation expression is +,-,*,/ on exact
  * integers cast to double — IEEE-deterministic on any engine and any
  * partitioning, no rounding step required.
  *
  * Scale notes:
  *  - the spine length is bounded by the key's time RANGE (domain),
  *    not by its observation count, and explodes map-side;
  *  - anchors come from RUNNING frames only. The "next anchor" uses a
  *    descending-ordered running frame, NOT `[CURRENT ROW, UNBOUNDED
  *    FOLLOWING]`: Spark's UnboundedFollowingWindowFunctionFrame
  *    recomputes the aggregate from scratch for every row — O(span²)
  *    per partition, measured 5× slower on the 10× probe (13 s vs
  *    3 s) before this rewrite. Both frames are incremental O(span);
  *  - all windows partition by key: no global sort anywhere.
  */
object TimeSeries {

  /** Densify + linearly interpolate.
    *
    * @param obs  observations: one row per (key, bucket) with a value
    * @param key  partition column name
    * @param t    integer bucket column name (regular step)
    * @param v    value column name (integral or double)
    * @param step bucket width (same unit as `t`)
    * @return (key, t, val: double, filled: 0/1) — one row per spine
    *         bucket; observed rows pass through exactly, gaps carry the
    *         linear interpolation between their two nearest anchors
    */
  def interpolateLinear(obs: DataFrame, key: String, t: String, v: String,
      step: Long): DataFrame = {
    val o = obs.select(col(key), col(t), col(v)).persist()
    val spine = o.groupBy(key)
      .agg(min(t).as("lo"), max(t).as("hi"))
      .select(col(key),
        explode(sequence(col("lo"), col("hi"), lit(step))).as(t))
    val j = spine.join(o, Seq(key, t), "left")
    val wp = Window.partitionBy(key).orderBy(t)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(key).orderBy(col(t).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val anchored = j
      .withColumn("tp", last(when(col(v).isNotNull, col(t)),
        ignoreNulls = true).over(wp))
      .withColumn("vp", last(col(v), ignoreNulls = true).over(wp))
      .withColumn("tn", last(when(col(v).isNotNull, col(t)),
        ignoreNulls = true).over(wn))
      .withColumn("vn", last(col(v), ignoreNulls = true).over(wn))
    anchored.select(col(key), col(t),
      when(col(v).isNotNull, col(v).cast("double"))
        .otherwise(expr(s"""CAST(vp AS DOUBLE) +
          (CAST(vn AS DOUBLE) - CAST(vp AS DOUBLE)) *
          (CAST($t - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE))"""))
        .as("val"),
      when(col(v).isNull, lit(1L)).otherwise(lit(0L)).as("filled"))
  }
}
