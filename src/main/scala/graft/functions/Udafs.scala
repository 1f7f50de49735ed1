package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregators (the UDAF surface — SURVEY.md §2.2).
  *
  * WeightedAvg accumulates in exact BigDecimal (scale 6, HALF_UP — the
  * same rounding DuckDB applies casting double→DECIMAL(18,6)), so the
  * result is order-independent: partial/final merges on any partitioning
  * give bit-identical doubles, and the oracle twin
  * `CAST(SUM(CAST(x*w AS DECIMAL(18,6))) AS DOUBLE) /
  *  CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE)` matches exactly.
  */
object Udafs {

  type Buf = (JBigDecimal, JBigDecimal)

  object WeightedAvg extends Aggregator[(Double, Double), Buf, Double] {
    private def d6(x: Double): JBigDecimal =
      new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)

    override def zero: Buf = (JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(b: Buf, in: (Double, Double)): Buf = {
      val (x, w) = in
      (b._1.add(d6(x * w)), b._2.add(d6(w)))
    }
    override def merge(a: Buf, b: Buf): Buf =
      (a._1.add(b._1), a._2.add(b._2))
    override def finish(b: Buf): Double =
      if (b._2.signum() == 0) Double.NaN
      else b._1.doubleValue() / b._2.doubleValue()
    override def bufferEncoder: Encoder[Buf] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
