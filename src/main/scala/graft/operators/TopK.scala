package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k via ranked windows. Spark plans this as
  * WindowGroupLimit: each partition is pruned to k candidates before
  * the shuffle (see PLANS.md q46), so the operator scales with
  * k × groups, not input rows. The `order` must be total (include a
  * unique tie-break) for deterministic results.
  */
object TopK {

  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
