package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (no UDFs). Evaluation is
  * sequential left-to-right over the array, so results are deterministic
  * for a given input — required for oracle parity, and partitioning-
  * independent at cluster scale.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sum of elements, accumulated in double. */
  def elemSum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-element mean in double. */
  def elemMean(a: Column): Column = elemSum(a) / size(a)

  /** Count of elements strictly greater than `threshold`. */
  def countAbove(a: Column, threshold: Double): Column =
    size(filter(a, _ > lit(threshold).cast("float")))

  /** Sign bits against random hyperplanes — cheap LSH bucket key for
    * approximate nearest-neighbor blocking at scale. `planes` must be
    * fixed (seeded) so bucketing is deterministic.
    */
  def hyperplaneBucket(a: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val pl = array(p.map(lit): _*)
      when(aggregate(zip_with(a, pl, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v) >= 0, lit(1)).otherwise(lit(0))
    }
    bits.zipWithIndex.map { case (b, i) => b * (1 << i) }
      .reduce(_ + _).cast("long")
  }
}
