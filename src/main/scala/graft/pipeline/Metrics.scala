package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline telemetry via the Observation API: named metrics ride the
  * existing job (computed by the same tasks that process the data —
  * accumulator-backed, zero extra passes), unlike a separate
  * `df.count()` which re-runs the plan. The production pattern for
  * row-count reconciliation and data-quality gates in a 100 TB job,
  * where "just count it again" doubles the cost.
  */
object Metrics {

  /** Attach named metric expressions to `df`. The metrics materialize
    * when any action runs on the returned frame; read them from the
    * returned Observation (blocks until the action finishes).
    */
  def observe(df: DataFrame, name: String,
      metrics: Map[String, Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val exprs = metrics.map { case (n, c) => c.as(n) }.toSeq
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }
}
