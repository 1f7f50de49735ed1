package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe ntile: a global `Window.orderBy` ntile funnels the whole
  * relation through ONE partition — fine for a bounded dim (q25), fatal
  * at 100 TB. This operator computes the n-1 quantile cutpoints with
  * the Greenwald-Khanna sketch (one distributed pass, driver holds only
  * n-1 doubles) and assigns buckets with a stateless per-row
  * expression — no global sort, no single-partition stage, and the
  * bucketing scales with a plain scan.
  *
  * Trade-off vs exact ntile: bucket boundaries are value-based, so rows
  * tied on a cutpoint land in the same bucket and bucket sizes are
  * approximately (not exactly) equal; `relativeError = 0` makes the
  * cutpoints themselves exact.
  */
object ApproxNtile {

  /** Add `bucketCol` in [1, n] bucketing `valueCol` by quantile. */
  def apply(
      df: DataFrame,
      valueCol: String,
      n: Int,
      bucketCol: String = "tile",
      relativeError: Double = 0.0): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val probs = (1 until n).map(_.toDouble / n).toArray
    val cuts = df.stat.approxQuantile(valueCol, probs, relativeError)
    val v = col(valueCol)
    val bucket = cuts.zipWithIndex.foldRight(lit(n): org.apache.spark.sql.Column) {
      case ((cut, i), rest) => when(v <= cut, i + 1).otherwise(rest)
    }
    df.withColumn(bucketCol, bucket.cast("long"))
  }
}
