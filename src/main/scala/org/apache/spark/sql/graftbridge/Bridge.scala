package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` constructors — the standard way a
  * third-party library materializes a DataFrame from a custom
  * LogicalPlan node (Dataset.ofRows is package-private to
  * org.apache.spark.sql).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A sibling session over the SAME SparkContext with `extensions`
    * applied — how tests exercise SparkSessionExtensions-installed
    * rules without tearing down the shared context (production installs
    * them via `spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def sessionWithExtensions(
      spark: SparkSession,
      extensions: org.apache.spark.sql.SparkSessionExtensions => Unit): SparkSession = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    extensions(ext)
    val ctor = classOf[classic.SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "classic.SparkSession 6-arg constructor not found"))
    ctor.setAccessible(true)
    ctor.newInstance(
      classicSpark.sparkContext,
      Some(classicSpark.sharedState),
      None,
      ext,
      Map.empty[String, String],
      Map.empty[String, String]).asInstanceOf[SparkSession]
  }
}
